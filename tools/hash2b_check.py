#!/usr/bin/env python3
"""Independent Algorithm 2.B twin (dev-only oracle pre-check).

Recomputes ISO 32000-2 Algorithm 2.B — the iterated SHA-256/384/512 password
hash of the PDF 2.0 standard security handler — from the spec text alone,
using hashlib + the OpenSSL-backed `cryptography` AES-CBC: a fully
independent implementation from the engine's JCA-based Crypt.hash2B. Feed it
the graft.tools.Hash2BVectors dump on stdin; it recomputes every line and
reports agreement. A transposed step, wrong hash pick, or wrong termination
rule in either side breaks the match.

Usage: sbt -batch "runMain graft.tools.Hash2BVectors" 2>/dev/null | \
       sed 's/^\\[info\\] //' | grep -P '^\\S+\\t' | python3 tools/hash2b_check.py

Recorded agreement (2026-08-17, round 5): 9/9 OK over the full matrix —
empty/ascii/long(127B)/overlong(200B, truncates to 127)/binary/utf8ish
passwords, zero and patterned salts, empty and 48-byte /U udata.
"""
import sys
import hashlib
from cryptography.hazmat.primitives.ciphers import Cipher, algorithms, modes


def aes_cbc_encrypt(key16, iv16, data):
    enc = Cipher(algorithms.AES(key16), modes.CBC(iv16)).encryptor()
    return enc.update(data) + enc.finalize()


def hash_2b(password: bytes, salt: bytes, udata: bytes) -> bytes:
    # ISO 32000-2 7.6.4.3.3: the UTF-8 password truncates to 127 bytes first
    password = password[:127]
    # ISO 32000-2 7.6.4.3.4: K0 = SHA-256(password || salt || udata); then
    # rounds of K1 = (password || K || udata) * 64, E = AES-128-CBC(K[:16],
    # iv=K[16:32], K1), K = SHA-{256,384,512}(E) picked by (sum of E[:16]) % 3;
    # stop after round >= 64 when E[-1] <= round - 32.
    k = hashlib.sha256(password + salt + udata).digest()
    i = 0
    while True:
        k1 = (password + k + udata) * 64
        e = aes_cbc_encrypt(k[:16], k[16:32], k1)
        mod = sum(e[:16]) % 3
        k = (hashlib.sha256, hashlib.sha384, hashlib.sha512)[mod](e).digest()
        i += 1
        if i >= 64 and e[-1] <= i - 32:
            return k[:32]


def main():
    n_ok = n_bad = 0
    for line in sys.stdin:
        parts = line.rstrip("\n").split("\t")
        if len(parts) != 5:
            continue
        label, pwd_h, salt_h, udata_h, want_h = parts
        got = hash_2b(bytes.fromhex(pwd_h), bytes.fromhex(salt_h),
                      bytes.fromhex(udata_h)).hex()
        ok = got == want_h
        n_ok += ok
        n_bad += not ok
        print(f"{label}: {'OK' if ok else f'MISMATCH got {got} want {want_h}'}")
    print(f"agreement: {n_ok} OK, {n_bad} mismatched")
    sys.exit(1 if n_bad or not n_ok else 0)


if __name__ == "__main__":
    main()
