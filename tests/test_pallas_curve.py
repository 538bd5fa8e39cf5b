"""Fused Pallas EC kernels vs the exact golden model (interpret mode on CPU).

porla_tpu/curves/pallas_curve.py runs whole windowed scalar-muls (and the
MAC-mirror butterfly M0 +/- s*M1, reference porla/Server/Server.hpp:1592-1609)
inside VMEM on byte-digit tiles; results must be bit-exact against the
big-int golden model for every edge case the branchless formulas cover
(infinity operands, zero scalars, doubling collisions).
"""

import os
import random

import numpy as np
import pytest

from porla_tpu.curves import pallas_curve

# Interpret-mode compiles of the full-width kernels take ~10 min each on
# XLA:CPU; the default suite keeps the one test that covers every select
# path (both curves share one executable) and gates the rest.
slow = pytest.mark.skipif(os.environ.get("PORLA_SLOW_TESTS") != "1",
                          reason="set PORLA_SLOW_TESTS=1 (≈10 min/compile)")
from porla_tpu.curves.instances import bn254, secp256k1
from porla_tpu.fields import limbs as L
from porla_tpu.golden import ecc

# compile-heavy: nightly tier (see pyproject markers)
pytestmark = pytest.mark.slow

rng = random.Random(2024)


def _rand_points(ops, k):
    cur = ops.curve
    return [ecc.mul(cur, cur.g, rng.randrange(1, cur.n)) for _ in range(k)]


def test_scalar_mul_small_window_all_curves():
    # nbits=32 keeps the interpret-mode window loop short while still
    # exercising table build, digit peel, and every add/dbl select path.
    for ops in (secp256k1(), bn254()):
        cur = ops.curve
        pts = _rand_points(ops, 5) + [ecc.INF, cur.g, cur.g]
        sc = [rng.getrandbits(32) for _ in range(5)] + [7, 0, 1]
        p = ops.from_affine(np, pts)
        out = pallas_curve.scalar_mul(
            ops, p, L.ints_to_limbs(sc), nbits=32, interpret=True)
        got = ops.to_affine(out)
        for pt, s, g in zip(pts, sc, got):
            assert g == ecc.mul(cur, pt, s)


def test_fixed_base_scalar_mul():
    # the commitment fast path: per-window tables, no doublings. ng=4
    # bases cycling across lanes; scalars cover zero / one / wrap edge
    # cases. nbits=32 keeps the interpret compile small (8 window adds).
    ops = secp256k1()
    cur = ops.curve
    gens = _rand_points(ops, 3) + [cur.g]
    tbl = pallas_curve.build_fb_table(ops, gens, nbits=32, bt=128)
    k = 9
    sc = [rng.getrandbits(32) for _ in range(k - 3)] + [0, 1, 0xFFFFFFFF]
    out = pallas_curve.fb_scalar_mul(tbl, L.ints_to_limbs(sc),
                                     interpret=True)
    got = ops.to_affine(out)
    for i, (s, g) in enumerate(zip(sc, got)):
        assert g == ecc.mul(cur, gens[i % 4], s), f"lane {i}"


def test_fb_msm_groups():
    """Fused fixed-base MSM + in-dispatch group reduction (the IPA
    round primitive, ipa._msm_gens2) vs per-lane golden sums."""
    ops = secp256k1()
    cur = ops.curve
    gens = _rand_points(ops, 3) + [cur.g]
    tbl = pallas_curve.build_fb_table(ops, gens, nbits=32, bt=128)
    sc = [rng.getrandbits(32) for _ in range(128)]
    out = pallas_curve.fb_msm_groups(tbl, L.ints_to_limbs(sc), nout=2,
                                     interpret=True)
    got = ops.to_affine(out)
    for h in range(2):
        want = ecc.INF
        for i in range(64):
            want = ecc.add(cur, want,
                           ecc.mul(cur, gens[(h * 64 + i) % 4],
                                   sc[h * 64 + i]))
        assert got[h] == want, f"group {h}"


@slow
def test_scalar_mul_full_256bit():
    # nbits=256 routes through the GLV kernel by default
    ops = secp256k1()
    cur = ops.curve
    pts = _rand_points(ops, 3)
    # raw 256-bit scalars (may exceed the group order -> wraps in group)
    sc = [rng.getrandbits(256) for _ in range(2)] + [cur.n + 5]
    p = ops.from_affine(np, pts)
    out = pallas_curve.scalar_mul(
        ops, p, L.ints_to_limbs(sc), nbits=256, interpret=True)
    got = ops.to_affine(out)
    for pt, s, g in zip(pts, sc, got):
        assert g == ecc.mul(cur, pt, s)


@slow
def test_scalar_mul_full_256bit_no_glv(monkeypatch):
    monkeypatch.setenv("PORLA_NO_GLV", "1")
    test_scalar_mul_full_256bit()


def test_glv_decomposition_both_curves():
    # fast host-level check of the derived endomorphism parameters
    import random

    from porla_tpu.curves import glv
    from porla_tpu.curves.instances import bn254
    for ops in (secp256k1(), bn254()):
        cur = ops.curve
        gp = glv.params_for(cur)
        assert pow(gp.lam, 3, cur.n) == 1 and gp.lam != 1
        assert pow(gp.beta, 3, cur.p) == 1 and gp.beta != 1
        r = random.Random(4)
        for k in [0, 1, cur.n - 1] + [r.getrandbits(256)
                                      for _ in range(20)]:
            k1, s1, k2, s2 = glv.decompose(k, gp)
            v = ((-k1 if s1 else k1)
                 + gp.lam * (-k2 if s2 else k2)) % cur.n
            assert v == k % cur.n
            assert k1 < 1 << 128 and k2 < 1 << 128
        # the endomorphism really is (x, y) -> (beta*x, y)
        pt = ecc.mul(cur, cur.g, 12345)
        lp = ecc.mul(cur, pt, gp.lam)
        assert lp == ((gp.beta * pt[0]) % cur.p, pt[1])


@slow
def test_point_butterfly_glv_256bit():
    # the protocol's fold path: butterfly with full-width twiddles goes
    # through the GLV kernel
    ops = secp256k1()
    cur = ops.curve
    k = 4
    m0 = _rand_points(ops, k - 1) + [ecc.INF]
    m1 = _rand_points(ops, k)
    sc = [rng.getrandbits(256) for _ in range(k - 1)] + [0]
    hi, lo = pallas_curve.point_butterfly(
        ops, ops.from_affine(np, m0), ops.from_affine(np, m1),
        L.ints_to_limbs(sc), nbits=256, interpret=True)
    got_hi = ops.to_affine(hi)
    got_lo = ops.to_affine(lo)
    for a, b, s, gh, gl in zip(m0, m1, sc, got_hi, got_lo):
        t = ecc.mul(cur, b, s)
        assert gh == ecc.add(cur, a, t)
        assert gl == ecc.add(cur, a, ecc.neg(cur, t))


@slow
def test_point_butterfly_matches_golden():
    ops = secp256k1()
    cur = ops.curve
    k = 6
    m0 = _rand_points(ops, k - 1) + [ecc.INF]
    m1 = _rand_points(ops, k - 1) + [cur.g]
    sc = [rng.getrandbits(32) for _ in range(k - 2)] + [0, 3]
    hi, lo = pallas_curve.point_butterfly(
        ops, ops.from_affine(np, m0), ops.from_affine(np, m1),
        L.ints_to_limbs(sc), nbits=32, interpret=True)
    got_hi = ops.to_affine(hi)
    got_lo = ops.to_affine(lo)
    for a, b, s, gh, gl in zip(m0, m1, sc, got_hi, got_lo):
        t = ecc.mul(cur, b, s)
        assert gh == ecc.add(cur, a, t)
        assert gl == ecc.add(cur, a, ecc.neg(cur, t))
