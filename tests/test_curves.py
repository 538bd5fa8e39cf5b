"""Batched limb-tensor curve ops vs the exact golden model."""

import random

import numpy as np
import pytest

from porla_tpu.curves.instances import bn254, secp256k1
from porla_tpu.fields import limbs
from porla_tpu.golden import ecc

rng = random.Random(99)


def _rand_points(cv, k):
    return [ecc.mul(cv, cv.g, rng.randrange(1, cv.n)) for _ in range(k)]


@pytest.mark.parametrize("ops_f,cv", [(secp256k1, ecc.SECP256K1), (bn254, ecc.BN254)],
                         ids=["secp", "bn254"])
def test_affine_roundtrip(ops_f, cv):
    ops = ops_f()
    pts = _rand_points(cv, 4) + [ecc.INF]
    assert ops.to_affine(ops.from_affine(np, pts)) == pts


def test_add_matches_golden():
    ops = secp256k1()
    cv = ecc.SECP256K1
    a = _rand_points(cv, 6)
    b = _rand_points(cv, 6)
    # include edge cases: P+P, P+(-P), INF+P, P+INF, INF+INF
    a += [a[0], a[1], ecc.INF, a[2], ecc.INF]
    b += [a[0], ecc.neg(cv, a[1]), b[0], ecc.INF, ecc.INF]
    out = ops.add(np, ops.from_affine(np, a), ops.from_affine(np, b))
    expect = [ecc.add(cv, x, y) for x, y in zip(a, b)]
    assert ops.to_affine(out) == expect


def test_double_matches_golden():
    ops = secp256k1()
    cv = ecc.SECP256K1
    a = _rand_points(cv, 5) + [ecc.INF]
    out = ops.double(np, ops.from_affine(np, a))
    assert ops.to_affine(out) == [ecc.add(cv, x, x) for x in a]


def test_neg_matches_golden():
    ops = secp256k1()
    cv = ecc.SECP256K1
    a = _rand_points(cv, 3) + [ecc.INF]
    out = ops.neg(np, ops.from_affine(np, a))
    assert ops.to_affine(out) == [ecc.neg(cv, x) for x in a]


def test_scalar_mul_matches_golden():
    import jax.numpy as jnp

    from porla_tpu.curves import kernels

    ops = secp256k1()
    cv = ecc.SECP256K1
    pts = _rand_points(cv, 4)
    ks = [0, 1, rng.getrandbits(256), cv.n + 5]  # incl. overflowed scalar
    out = kernels.scalar_mul(ops, ops.from_affine(jnp, pts),
                             jnp.asarray(limbs.ints_to_limbs(ks)))
    assert ops.to_affine(kernels.to_host(out)) == [
        ecc.mul(cv, p, k) for p, k in zip(pts, ks)]


def test_scalar_mul_short_bits():
    import jax.numpy as jnp

    from porla_tpu.curves import kernels

    ops = secp256k1()
    cv = ecc.SECP256K1
    pts = _rand_points(cv, 3)
    ks = [rng.getrandbits(128) for _ in range(3)]
    out = kernels.scalar_mul(ops, ops.from_affine(jnp, pts),
                             jnp.asarray(limbs.ints_to_limbs(ks)), nbits=128)
    assert ops.to_affine(kernels.to_host(out)) == [
        ecc.mul(cv, p, k) for p, k in zip(pts, ks)]


def test_msm_matches_golden():
    import jax.numpy as jnp

    from porla_tpu.curves import kernels

    ops = secp256k1()
    cv = ecc.SECP256K1
    for n in (1, 2, 5):
        pts = _rand_points(cv, n)
        ks = [rng.getrandbits(64) for _ in range(n)]
        out = kernels.msm(ops, ops.from_affine(jnp, pts),
                          jnp.asarray(limbs.ints_to_limbs(ks)), nbits=64)
        assert ops.to_affine(kernels.to_host(out))[0] == ecc.msm(cv, pts, ks)
