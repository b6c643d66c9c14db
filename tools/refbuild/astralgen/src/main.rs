// Ground-truth generator: Rust str-Debug escape bitmap for the ASTRAL planes
// (U+10000..=U+10FFFF). Bit set = format!("{:?}") escapes the char (emits
// \u{...}); clear = the char appears raw. Same bit layout as the BMP tables:
// idx = (cp - 0x10000) >> 3, bit = cp & 7.
use std::io::Write;
fn main() {
    let mut bm = vec![0u8; (0x110000 - 0x10000) / 8];
    let mut n_esc = 0u32;
    for cp in 0x10000u32..0x110000 {
        let c = char::from_u32(cp).unwrap();
        let s: String = c.to_string();
        let dbg = format!("{:?}", s);
        let raw = format!("\"{}\"", c);
        if dbg != raw {
            // sanity: the escaped form must be the \u{...} spelling
            assert_eq!(dbg, format!("\"\\u{{{:x}}}\"", cp), "cp {:x}", cp);
            let off = (cp - 0x10000) as usize;
            bm[off >> 3] |= 1 << (off & 7);
            n_esc += 1;
        }
        // char-Debug must agree with str-Debug on astral (no quote chars here)
        let cdbg = format!("{:?}", c);
        let craw = format!("'{}'", c);
        let cesc = cdbg != craw;
        assert_eq!(cesc, dbg != raw, "char/str debug disagree at {:x}", cp);
    }
    eprintln!("astral escaped: {} of {}", n_esc, 0x110000 - 0x10000);
    let mut f = std::fs::File::create("/tmp/rust_escape_debug_astral.bin").unwrap();
    f.write_all(&bm).unwrap();
}
