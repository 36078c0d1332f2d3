#!/bin/bash
# Build the reference LinearSFM binary as a golden-test oracle.
# Compiles the UNMODIFIED reference sources from /root/reference against the
# shim headers (mini-Eigen + dense-Cholesky mini-CHOLMOD). Nothing from the
# reference tree is copied into this repo.
set -euo pipefail
cd "$(dirname "$0")"
REF=${REF:-/root/reference/linux/src}
OUT=${OUT:-./linearsfm_oracle}
g++ -O2 -w -fpermissive -include cassert \
  -I shim -I "$REF/LinearSFMImp" \
  "$REF/LinearSFM/LinearSFM.cpp" \
  "$REF/LinearSFMImp/LinearSFMImp.cpp" \
  cholmod_shim.cpp \
  -o "$OUT"
echo "built $OUT"
