// Sampled astral str-Debug ground truth for the spec: every 17th codepoint
// plus all escape-state TRANSITIONS (cp where escaped(cp) != escaped(cp-1)),
// so every boundary of every raw/escaped run is pinned exactly.
use std::io::Write;
fn main() {
    let f = std::fs::File::create("/tmp/escastral.tsv").unwrap();
    let mut w = std::io::BufWriter::new(f);
    let mut prev_esc = None::<bool>;
    for cp in 0x10000u32..0x110000 {
        let c = char::from_u32(cp).unwrap();
        let s = format!("x{}", c);
        let dbg = format!("{:?}", s);
        let esc = dbg != format!("\"x{}\"", c);
        let boundary = prev_esc.map_or(true, |p| p != esc);
        if boundary || cp % 17 == 0 {
            writeln!(w, "{}\t{}", cp, dbg).unwrap();
        }
        prev_esc = Some(esc);
    }
}
