fn main() {
    for cp in [0x1F600u32, 0x10000, 0xE0001, 0x10FFFF, 0x1D11E, 0x20BB7] {
        let c = char::from_u32(cp).unwrap();
        println!("{:x} => {:?}", cp, c.to_string());
    }
}
