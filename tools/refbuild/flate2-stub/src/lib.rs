// Minimal offline stand-in for the flate2 crate: just enough API surface for
// pdfrust's filters.rs (read::ZlibDecoder::new + one Read::read call), backed
// by a from-scratch RFC 1950/1951 inflate (stored + fixed + dynamic Huffman).
// Written from the public DEFLATE spec; validated against Python zlib on
// random payloads before use.

pub mod read {
    use std::io::{Read, Result};

    pub struct ZlibDecoder<R: Read> {
        inner: R,
        out: Vec<u8>,
        pos: usize,
        done: bool,
    }

    impl<R: Read> ZlibDecoder<R> {
        pub fn new(inner: R) -> Self {
            ZlibDecoder { inner, out: Vec::new(), pos: 0, done: false }
        }
    }

    impl<R: Read> Read for ZlibDecoder<R> {
        fn read(&mut self, buf: &mut [u8]) -> Result<usize> {
            if !self.done {
                let mut data = Vec::new();
                self.inner.read_to_end(&mut data)?;
                self.out = crate::inflate::zlib_inflate(&data).map_err(|e| {
                    std::io::Error::new(std::io::ErrorKind::InvalidData, e)
                })?;
                self.done = true;
            }
            let n = std::cmp::min(buf.len(), self.out.len() - self.pos);
            buf[..n].copy_from_slice(&self.out[self.pos..self.pos + n]);
            self.pos += n;
            Ok(n)
        }
    }
}

pub mod inflate {
    struct Bits<'a> {
        d: &'a [u8],
        byte: usize,
        bit: u32,
    }

    impl<'a> Bits<'a> {
        fn new(d: &'a [u8]) -> Self {
            Bits { d, byte: 0, bit: 0 }
        }
        fn bit(&mut self) -> Result<u32, String> {
            if self.byte >= self.d.len() {
                return Err("out of input".into());
            }
            let v = (self.d[self.byte] >> self.bit) as u32 & 1;
            self.bit += 1;
            if self.bit == 8 {
                self.bit = 0;
                self.byte += 1;
            }
            Ok(v)
        }
        fn bits(&mut self, n: u32) -> Result<u32, String> {
            let mut v = 0u32;
            for i in 0..n {
                v |= self.bit()? << i;
            }
            Ok(v)
        }
        fn align(&mut self) {
            if self.bit != 0 {
                self.bit = 0;
                self.byte += 1;
            }
        }
    }

    struct Huff {
        counts: [u16; 16],
        symbols: Vec<u16>,
    }

    impl Huff {
        fn build(lengths: &[u16]) -> Result<Huff, String> {
            let mut counts = [0u16; 16];
            for &l in lengths {
                counts[l as usize] += 1;
            }
            counts[0] = 0;
            // zlib-style completeness check: an oversubscribed code-length
            // histogram (more codes at some length than the tree can hold)
            // must be a clean error, not a later out-of-bounds panic in
            // decode() — real flate2 rejects such streams too (ADVICE r6)
            let mut left: i32 = 1;
            for l in 1..16 {
                left = (left << 1) - counts[l] as i32;
                if left < 0 {
                    return Err("oversubscribed huffman code lengths".into());
                }
            }
            // offsets per length for canonical ordering
            let mut offs = [0u16; 16];
            for l in 1..16 {
                offs[l] = offs[l - 1] + counts[l - 1];
            }
            let mut symbols = vec![0u16; lengths.len()];
            for (sym, &l) in lengths.iter().enumerate() {
                if l != 0 {
                    symbols[offs[l as usize] as usize] = sym as u16;
                    offs[l as usize] += 1;
                }
            }
            Ok(Huff { counts, symbols })
        }

        fn decode(&self, b: &mut Bits) -> Result<u16, String> {
            let mut code = 0i32;
            let mut first = 0i32;
            let mut index = 0i32;
            for len in 1..16 {
                code |= b.bit()? as i32;
                let count = self.counts[len] as i32;
                if code - first < count {
                    let at = (index + (code - first)) as usize;
                    // defense in depth alongside the build() completeness
                    // check: never index past the symbol table on a stream
                    // whose histogram slipped through (incomplete codes are
                    // legal; a code pointing past the populated symbols is not)
                    return match self.symbols.get(at) {
                        Some(&s) => Ok(s),
                        None => Err("huffman code outside symbol table".into()),
                    };
                }
                index += count;
                first = (first + count) << 1;
                code <<= 1;
            }
            Err("bad huffman code".into())
        }
    }

    const LBASE: [u16; 29] = [
        3, 4, 5, 6, 7, 8, 9, 10, 11, 13, 15, 17, 19, 23, 27, 31, 35, 43, 51, 59, 67, 83, 99, 115,
        131, 163, 195, 227, 258,
    ];
    const LEXT: [u32; 29] = [
        0, 0, 0, 0, 0, 0, 0, 0, 1, 1, 1, 1, 2, 2, 2, 2, 3, 3, 3, 3, 4, 4, 4, 4, 5, 5, 5, 5, 0,
    ];
    const DBASE: [u16; 30] = [
        1, 2, 3, 4, 5, 7, 9, 13, 17, 25, 33, 49, 65, 97, 129, 193, 257, 385, 513, 769, 1025, 1537,
        2049, 3073, 4097, 6145, 8193, 12289, 16385, 24577,
    ];
    const DEXT: [u32; 30] = [
        0, 0, 0, 0, 1, 1, 2, 2, 3, 3, 4, 4, 5, 5, 6, 6, 7, 7, 8, 8, 9, 9, 10, 10, 11, 11, 12, 12,
        13, 13,
    ];

    fn block(b: &mut Bits, out: &mut Vec<u8>, lit: &Huff, dist: &Huff) -> Result<(), String> {
        loop {
            let sym = lit.decode(b)?;
            if sym < 256 {
                out.push(sym as u8);
            } else if sym == 256 {
                return Ok(());
            } else {
                let li = (sym - 257) as usize;
                if li >= 29 {
                    return Err("bad length code".into());
                }
                let len = LBASE[li] as usize + b.bits(LEXT[li])? as usize;
                let ds = dist.decode(b)? as usize;
                if ds >= 30 {
                    return Err("bad dist code".into());
                }
                let d = DBASE[ds] as usize + b.bits(DEXT[ds])? as usize;
                if d > out.len() {
                    return Err("dist too far".into());
                }
                for _ in 0..len {
                    let v = out[out.len() - d];
                    out.push(v);
                }
            }
        }
    }

    pub fn inflate_raw(data: &[u8]) -> Result<(Vec<u8>, usize), String> {
        let mut b = Bits::new(data);
        let mut out = Vec::new();
        loop {
            let bfinal = b.bit()?;
            let btype = b.bits(2)?;
            match btype {
                0 => {
                    b.align();
                    if b.byte + 4 > data.len() {
                        return Err("stored header past end".into());
                    }
                    let len = data[b.byte] as usize | ((data[b.byte + 1] as usize) << 8);
                    let nlen = data[b.byte + 2] as usize | ((data[b.byte + 3] as usize) << 8);
                    if len != (!nlen & 0xffff) {
                        return Err("stored LEN/NLEN mismatch".into());
                    }
                    b.byte += 4;
                    if b.byte + len > data.len() {
                        return Err("stored data past end".into());
                    }
                    out.extend_from_slice(&data[b.byte..b.byte + len]);
                    b.byte += len;
                }
                1 => {
                    let mut ll = [0u16; 288];
                    for (i, l) in ll.iter_mut().enumerate() {
                        *l = match i {
                            0..=143 => 8,
                            144..=255 => 9,
                            256..=279 => 7,
                            _ => 8,
                        };
                    }
                    let lit = Huff::build(&ll)?;
                    let dist = Huff::build(&[5u16; 30])?;
                    block(&mut b, &mut out, &lit, &dist)?;
                }
                2 => {
                    let hlit = b.bits(5)? as usize + 257;
                    let hdist = b.bits(5)? as usize + 1;
                    let hclen = b.bits(4)? as usize + 4;
                    const ORDER: [usize; 19] = [
                        16, 17, 18, 0, 8, 7, 9, 6, 10, 5, 11, 4, 12, 3, 13, 2, 14, 1, 15,
                    ];
                    let mut cl = [0u16; 19];
                    for i in 0..hclen {
                        cl[ORDER[i]] = b.bits(3)? as u16;
                    }
                    let clh = Huff::build(&cl)?;
                    let mut lengths = vec![0u16; hlit + hdist];
                    let mut i = 0;
                    while i < hlit + hdist {
                        let sym = clh.decode(&mut b)?;
                        match sym {
                            0..=15 => {
                                lengths[i] = sym;
                                i += 1;
                            }
                            16 => {
                                if i == 0 {
                                    return Err("repeat with no prior length".into());
                                }
                                let prev = lengths[i - 1];
                                let rep = 3 + b.bits(2)? as usize;
                                for _ in 0..rep {
                                    if i >= hlit + hdist {
                                        return Err("repeat overflow".into());
                                    }
                                    lengths[i] = prev;
                                    i += 1;
                                }
                            }
                            17 => {
                                let rep = 3 + b.bits(3)? as usize;
                                i += rep;
                            }
                            18 => {
                                let rep = 11 + b.bits(7)? as usize;
                                i += rep;
                            }
                            _ => return Err("bad code-length symbol".into()),
                        }
                    }
                    if i > hlit + hdist {
                        return Err("code lengths overflow".into());
                    }
                    let lit = Huff::build(&lengths[..hlit])?;
                    let dist = Huff::build(&lengths[hlit..])?;
                    block(&mut b, &mut out, &lit, &dist)?;
                }
                _ => return Err("bad block type".into()),
            }
            if bfinal == 1 {
                // consumed byte count: the deflate stream ends mid-byte for
                // Huffman blocks — round up to the next byte boundary
                let consumed = if b.bit != 0 { b.byte + 1 } else { b.byte };
                return Ok((out, consumed));
            }
        }
    }

    fn adler32(data: &[u8]) -> u32 {
        let mut a: u32 = 1;
        let mut b: u32 = 0;
        for chunk in data.chunks(5552) {
            for &x in chunk {
                a += x as u32;
                b += a;
            }
            a %= 65521;
            b %= 65521;
        }
        (b << 16) | a
    }

    pub fn zlib_inflate(data: &[u8]) -> Result<Vec<u8>, String> {
        // full RFC 1950 envelope validation, matching real flate2/zlib-ng
        // strictness (round-6 review: without these checks the stub-built
        // reference would ACCEPT corrupt streams the true reference rejects,
        // poisoning differential verdicts on compressed documents)
        if data.len() < 6 {
            return Err("zlib stream too short".into());
        }
        if data[0] & 0x0f != 8 {
            return Err("zlib CM is not deflate".into());
        }
        if (data[0] as u16 * 256 + data[1] as u16) % 31 != 0 {
            return Err("zlib FCHECK failed".into());
        }
        if data[1] & 0x20 != 0 {
            return Err("FDICT not supported".into());
        }
        let (out, consumed) = inflate_raw(&data[2..])?;
        // the 4 bytes FOLLOWING the deflate stream are the big-endian
        // Adler-32 of the decompressed data; like real zlib, anything after
        // the checksum is ignored (round-6 review: a tail read would falsely
        // reject streams whose declared length includes trailing bytes)
        let a = 2 + consumed;
        if a + 4 > data.len() {
            return Err("zlib stream truncated before adler32".into());
        }
        let stored = ((data[a] as u32) << 24)
            | ((data[a + 1] as u32) << 16)
            | ((data[a + 2] as u32) << 8)
            | (data[a + 3] as u32);
        if stored != adler32(&out) {
            return Err("zlib adler32 mismatch".into());
        }
        Ok(out)
    }
}
