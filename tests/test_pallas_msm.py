"""Known-answer tests for the Pippenger bucket-MSM kernel (interpret
mode): random points/scalars vs the exact golden model, covering zero
scalars, duplicate bucket hits, and padding lanes.

Interpret-mode point adds are expensive on the CPU backend, so the
default test uses 8-bit scalars (2 windows); the 32-bit variant runs
under PORLA_SLOW_TESTS=1 (like the other slow Pallas tests). The real
TPU path is exercised by examples/bench_msm.py and the audit e2e."""

import os
import random

import numpy as np
import pytest

from porla_tpu.curves import pallas_msm
from porla_tpu.curves.instances import secp256k1
from porla_tpu.fields import limbs as L
from porla_tpu.golden import ecc

slow = pytest.mark.skipif(os.environ.get("PORLA_SLOW_TESTS") != "1",
                          reason="slow interpret-mode kernel")

rng = random.Random(99)


def _run(nbits: int, n: int):
    ops = secp256k1()
    cur = ops.curve
    pts = []
    for _ in range(n):
        k = rng.randrange(1, cur.n)
        pts.append(ecc.mul(cur, cur.g, k))
    top = (1 << nbits) - 1
    # duplicate digits + zero scalar + max-nibble coverage
    sc = [rng.getrandbits(nbits) for _ in range(n - 3)] + [
        0, top // 15, top]
    out = pallas_msm.pippenger_msm(
        ops, ops.from_affine(np, pts), L.ints_to_limbs(sc), nbits=nbits,
        interpret=True)
    got = ops.to_affine(out)[0]
    want = ecc.INF
    for p, s in zip(pts, sc):
        want = ecc.add(cur, want, ecc.mul(cur, p, s))
    assert got == want


def test_pippenger_msm_tiny():
    _run(8, 21)


@slow
def test_pippenger_msm_small():
    _run(32, 21)
