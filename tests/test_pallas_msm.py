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

# nightly tier (pytest -m slow); the 32-bit variant additionally needs
# PORLA_SLOW_TESTS=1 (tens of minutes of interpret-mode point adds)
slow = pytest.mark.slow
xslow = pytest.mark.skipif(os.environ.get("PORLA_SLOW_TESTS") != "1",
                           reason="slow interpret-mode kernel")

rng = random.Random(99)


def _inputs(nbits: int, n: int):
    ops = secp256k1()
    cur = ops.curve
    pts = []
    for _ in range(n):
        k = rng.randrange(1, cur.n)
        pts.append(ecc.mul(cur, cur.g, k))
    top = (1 << nbits) - 1
    # duplicate digits + zero scalar + max-digit coverage (exercises the
    # signed-window carry chain: top means every signed digit borrows)
    sc = [rng.getrandbits(nbits) for _ in range(n - 3)] + [
        0, top // 15, top]
    want = ecc.INF
    for p, s in zip(pts, sc):
        want = ecc.add(cur, want, ecc.mul(cur, p, s))
    return ops, pts, sc, want


def _run(nbits: int, n: int, **kw):
    ops, pts, sc, want = _inputs(nbits, n)
    out = pallas_msm.pippenger_msm(
        ops, ops.from_affine(np, pts), L.ints_to_limbs(sc), nbits=nbits,
        interpret=True, **kw)
    got = ops.to_affine(out)[0]
    assert got == want


def test_pippenger_msm_tiny():
    _run(8, 21)


@slow
def test_pippenger_msm_tiny_c6():
    _run(8, 21, c=6)


@slow
def test_pippenger_msm_jacobian():
    """Non-affine inputs route through the 16-mul raw-add kernel."""
    from porla_tpu.curves.weierstrass import JacPoint
    ops, pts, sc, want = _inputs(8, 21)
    lam = 7
    to_m = ops.fp.to_mont_int
    p = ops.curve.p
    xs = [to_m(x * lam * lam % p) for x, _ in pts]
    ys = [to_m(y * pow(lam, 3, p) % p) for _, y in pts]
    zs = [to_m(lam)] * len(pts)
    jj = JacPoint(np.stack([L.int_to_limbs(v) for v in xs]),
                  np.stack([L.int_to_limbs(v) for v in ys]),
                  np.stack([L.int_to_limbs(v) for v in zs]))
    out = pallas_msm.pippenger_msm(ops, jj, L.ints_to_limbs(sc),
                                   nbits=8, interpret=True)
    assert ops.to_affine(out)[0] == want


def test_pippenger_msm_bn254():
    """The kernels are generic over the field modulus tables."""
    from porla_tpu.curves.instances import bn254
    ops = bn254()
    cur = ops.curve
    pts = [ecc.mul(cur, cur.g, rng.randrange(1, cur.n)) for _ in range(9)]
    sc = [rng.getrandbits(8) for _ in range(8)] + [255]
    want = ecc.INF
    for p, s in zip(pts, sc):
        want = ecc.add(cur, want, ecc.mul(cur, p, s))
    out = pallas_msm.pippenger_msm(
        ops, ops.from_affine(np, pts), L.ints_to_limbs(sc), nbits=8,
        interpret=True)
    assert ops.to_affine(out)[0] == want


def _run_digits(c: int, sc: list[int], nbits: int = 8):
    """Fixed-scalar KAT pinning the signed-digit extraction corners for
    window width c (production policy picks c=7/8; the c=8 bit-8
    sign-flag collision at |d| = 128 was only caught by the bench golden
    check in round 4 — pallas_msm.py:68-71)."""
    ops = secp256k1()
    cur = ops.curve
    pts = [ecc.mul(cur, cur.g, rng.randrange(1, cur.n))
           for _ in range(len(sc))]
    want = ecc.INF
    for p, s in zip(pts, sc):
        want = ecc.add(cur, want, ecc.mul(cur, p, s))
    out = pallas_msm.pippenger_msm(
        ops, ops.from_affine(np, pts), L.ints_to_limbs(sc), nbits=nbits,
        interpret=True, c=c)
    assert ops.to_affine(out)[0] == want


@slow
def test_pippenger_msm_c7_digit_corners():
    """c=7: |d| = 64 = 2^(c-1) (no-borrow max digit), 65 (borrow),
    127 (all-ones window), 0, and a carry chain into the top window."""
    _run_digits(7, [64, 65, 127, 128, 255, 0, 100])


@slow
def test_pippenger_msm_c8_digit_corners():
    """c=8: |d| = 128 packs as 0x80 — value bit 7 set with the sign flag
    on bit 8 (a bit-7 flag collides exactly here); 129/255 borrow with
    carry; 0 must write nowhere."""
    _run_digits(8, [128, 129, 255, 127, 0, 1])


@pytest.mark.parametrize("c", [4, 7, 8])
def test_signed_digit_extraction(c):
    """FAST-tier pin of the signed-window extraction + sign-flag packing
    for the widths the production policy uses (c=7/8): _prep_fn's packed
    digits, unpacked with the KERNEL'S formulas (slot = v & (_SIGN-1),
    sgn = v >> 8), must reconstruct every scalar with |d| <= 2^(c-1).
    Covers the |d| = 2^(c-1) corner where a bit-7 sign flag collides at
    c=8 (round 4's bench-only catch, pallas_msm.py:68-71)."""
    import jax.numpy as jnp
    nb = 1 << (c - 1)
    nbits = 256
    ops = secp256k1()
    n = ops.curve.n
    # adversarial scalars: all-ones runs, digit-boundary values, randoms
    sc = [0, 1, nb, nb + 1, (1 << 256) - 1, n - 1,
          int("80" * 32, 16), int("7f" * 32, 16)]
    sc += [rng.getrandbits(256) for _ in range(8)]
    npad, bt = 16, 16
    nwin_t, tight = pallas_msm._nwin_for(nbits, c)
    variants = [(-(-nbits // c) + 1, False)]
    if tight:
        # the carry-absorbing top window (production path when c
        # does not divide nbits) must reconstruct too
        variants.append((nwin_t, True))
    for nwin, tight_f in variants:
        prep = pallas_msm._prep_fn(npad, 1, bt, c, nwin, True, tight_f)
        z = np.ones((npad, 16), np.uint32)  # nonzero -> valid lanes
        _, _, pack = prep(z, z, z, L.ints_to_limbs(sc))
        pack = np.asarray(pack)             # (nwin, steps8, bt)
        for i, s in enumerate(sc):
            total = 0
            for w in range(nwin):
                v = int(pack[w, 0, i])
                slot = v & (pallas_msm._SIGN - 1)
                sgn = v >> 8
                assert slot <= nb, (c, i, w, v, tight_f)
                d = -slot if sgn else slot
                total += d << (c * w)
            assert total == s, (c, i, tight_f)


@slow
def test_pippenger_msm_non_pow2_batch():
    """N=300 forces a padded lane tile; a non-power-of-two tile width
    once dropped lane partials in the halving reduce (KAT_r03 catch)."""
    _run(8, 300)


@slow
def test_pippenger_msm_pipelined(monkeypatch):
    """Chunked host->device streaming with bucket carry-over must match
    the single-shot result."""
    monkeypatch.setenv("PORLA_MSM_CHUNK", "1")
    _run(8, 300, c=4, bt=128)


@xslow
def test_pippenger_msm_small():
    _run(32, 21, c=5)
