#!/bin/sh
# Build + run the reference known-answer-vector generator.
#
# The vendored secp256k1 at /root/reference is read-only and its mirror
# lacks include/ (the reference's auto_setup.sh clones it at setup,
# auto_setup.sh:44-57). We symlink the source tree into a scratch dir so
# `#include "../include/secp256k1.h"` resolves to the reconstructed
# headers in tools/refvec/include/.
set -e
HERE=$(cd "$(dirname "$0")" && pwd)
REF=${REF:-/root/reference/porla/Utils/secp256k1_lib}
BUILD=${BUILD:-/tmp/porla_refvec}
OUT=${OUT:-$HERE/../../tests/vectors/secp256k1_kat.json}

rm -rf "$BUILD"
mkdir -p "$BUILD/src"
# per-file symlinks: a whole-directory symlink would make `src/..`
# resolve to the reference tree's parent, missing our include/
ln -s "$REF"/* "$BUILD/src/"
ln -s "$HERE/include" "$BUILD/include"

# the table TUs expect the config macros on the command line (upstream
# passes them via DEFS; libsecp256k1-config.h is only included by the
# main TU)
gcc -O2 -I "$BUILD/src" -DECMULT_WINDOW_SIZE=15 -DECMULT_GEN_PREC_BITS=4 \
    -o "$BUILD/gen_vectors" "$HERE/gen_vectors.c" \
    "$BUILD/src/precomputed_ecmult.c" \
    "$BUILD/src/precomputed_ecmult_gen.c" -lm
mkdir -p "$(dirname "$OUT")"
"$BUILD/gen_vectors" > "$OUT"
echo "wrote $OUT"
