"""Limb-tensor modular arithmetic vs exact Python integers."""

import random

import numpy as np
import pytest

from porla_tpu.fields import constants as C
from porla_tpu.fields import limbs, mont

MODS = [
    mont.Modulus(C.FFT_PRIME, "fft_p"),
    mont.Modulus(C.SECP_N, "secp_n"),
    mont.Modulus(C.SECP_P, "secp_p"),
    mont.Modulus(C.BN254_P, "bn254_p"),
    mont.Modulus(C.BN254_R, "bn254_r"),
]

rng = random.Random(1234)


def _rand_elems(mod, k):
    return [rng.randrange(mod.n) for _ in range(k)]


def test_limb_roundtrip():
    vals = [0, 1, (1 << 256) - 1, C.FFT_PRIME, rng.getrandbits(255)]
    arr = limbs.ints_to_limbs(vals)
    assert limbs.limbs_to_ints(arr) == vals
    assert limbs.bytes_to_limbs(limbs.limbs_to_bytes(arr)).tolist() == arr.tolist()


@pytest.mark.parametrize("mod", MODS, ids=lambda m: m.name)
def test_mont_mul_numpy(mod):
    k = 64
    a = _rand_elems(mod, k)
    b = _rand_elems(mod, k)
    al, bl = limbs.ints_to_limbs(a), limbs.ints_to_limbs(b)
    # mont_mul(a, b) = a*b*R^-1 mod n
    out = mont.mont_mul(np, al, bl, mod)
    rinv = pow(1 << 256, -1, mod.n)
    expect = [(x * y * rinv) % mod.n for x, y in zip(a, b)]
    assert limbs.limbs_to_ints(out) == expect


@pytest.mark.parametrize("mod", MODS[:2], ids=lambda m: m.name)
def test_mont_form_product(mod):
    k = 16
    a = _rand_elems(mod, k)
    b = _rand_elems(mod, k)
    b_mont = limbs.ints_to_limbs([mod.to_mont_int(x) for x in b])
    out = mont.mont_mul(np, limbs.ints_to_limbs(a), b_mont, mod)
    assert limbs.limbs_to_ints(out) == [(x * y) % mod.n for x, y in zip(a, b)]


@pytest.mark.parametrize("mod", MODS[:3], ids=lambda m: m.name)
def test_add_sub_neg(mod):
    k = 64
    a = _rand_elems(mod, k) + [0, 0, mod.n - 1]
    b = _rand_elems(mod, k) + [0, mod.n - 1, mod.n - 1]
    al, bl = limbs.ints_to_limbs(a), limbs.ints_to_limbs(b)
    assert limbs.limbs_to_ints(mont.add_mod(np, al, bl, mod)) == [
        (x + y) % mod.n for x, y in zip(a, b)]
    assert limbs.limbs_to_ints(mont.sub_mod(np, al, bl, mod)) == [
        (x - y) % mod.n for x, y in zip(a, b)]
    assert limbs.limbs_to_ints(mont.neg_mod(np, al, mod)) == [
        (-x) % mod.n for x in a]


def test_to_from_mont_roundtrip():
    mod = MODS[0]
    a = _rand_elems(mod, 32)
    al = limbs.ints_to_limbs(a)
    m = mont.to_mont(np, al, mod)
    assert limbs.limbs_to_ints(m) == [mod.to_mont_int(x) for x in a]
    back = mont.from_mont(np, m, mod)
    assert limbs.limbs_to_ints(back) == a


def test_mod_reduce_overflowed_values():
    mod = mont.Modulus(C.SECP_N, "secp_n")
    vals = [rng.getrandbits(256) for _ in range(32)] + [0, (1 << 256) - 1]
    out = mont.mod_reduce(np, limbs.ints_to_limbs(vals), mod)
    assert limbs.limbs_to_ints(out) == [v % mod.n for v in vals]


def test_predicates():
    mod = MODS[0]
    a = limbs.ints_to_limbs([5, 7, 0])
    b = limbs.ints_to_limbs([5, 9, 1])
    assert mont.eq(np, a, b).tolist() == [True, False, False]
    assert mont.is_zero(np, a).tolist() == [False, False, True]
    assert mont.geq(np, a, b).tolist() == [True, False, False]
    assert mont.get_bit(np, limbs.ints_to_limbs([6]), 1).tolist() == [1]
    assert mont.get_bit(np, limbs.ints_to_limbs([6]), 0).tolist() == [0]
    assert mont.get_bit(np, limbs.ints_to_limbs([1 << 255]), 255).tolist() == [1]


def test_jax_matches_numpy():
    import jax.numpy as jnp

    mod = MODS[0]
    a = _rand_elems(mod, 16)
    b = _rand_elems(mod, 16)
    al, bl = limbs.ints_to_limbs(a), limbs.ints_to_limbs(b)
    out_np = mont.mont_mul(np, al, bl, mod)
    out_jax = np.asarray(mont.mont_mul(jnp, jnp.asarray(al), jnp.asarray(bl), mod))
    assert out_np.tolist() == out_jax.tolist()
    s_np = mont.add_mod(np, al, bl, mod)
    s_jax = np.asarray(mont.add_mod(jnp, jnp.asarray(al), jnp.asarray(bl), mod))
    assert s_np.tolist() == s_jax.tolist()
