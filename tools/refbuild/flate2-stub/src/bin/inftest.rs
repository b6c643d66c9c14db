use std::io::Read;
fn main() {
    let mut data = Vec::new();
    std::io::stdin().read_to_end(&mut data).unwrap();
    let out = flate2::inflate::zlib_inflate(&data).unwrap();
    use std::io::Write;
    std::io::stdout().write_all(&out).unwrap();
}
