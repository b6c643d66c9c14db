#!/bin/bash
# Build the Rust reference OFFLINE for differential testing (dev-only).
#
# The sandbox has cargo/rustc but no crates.io; the reference's sole external
# dependency (flate2) is replaced by the from-scratch inflate stub crate in
# this directory (same API surface: read::ZlibDecoder::new + Read::read).
# Validate the stub FIRST (see validate.py), then build:
#
#   tools/refbuild/build.sh          -> /tmp/refbuild/target/release/pdfrust
#
# RefDifferentialSpec picks the binary up automatically when it exists
# (and cancels, not fails, when it does not).
set -euo pipefail
STUB="$(cd "$(dirname "$0")/flate2-stub" && pwd)"
rm -rf /tmp/refbuild
cp -r /root/reference /tmp/refbuild
python3 - "$STUB" <<'PY'
import sys
stub = sys.argv[1]
p = '/tmp/refbuild/Cargo.toml'
t = open(p).read()
import re
t2 = re.sub(r'flate2 = \{[^}]*\}', f'flate2 = {{ path = "{stub}" }}', t)
assert t2 != t, "flate2 dependency line not found"
open(p, 'w').write(t2)
PY
cd /tmp/refbuild && cargo build --release --offline
echo "built: /tmp/refbuild/target/release/pdfrust"
