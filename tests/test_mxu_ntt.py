"""MXU butterfly path vs the general engine: bit-exact parity."""

import random

import numpy as np

from porla_tpu.fields import limbs, mont
from porla_tpu.ntt import engine, mxu

rng = random.Random(21)


def test_digit_conversions_roundtrip():
    vals = [rng.getrandbits(256) for _ in range(10)]
    a = limbs.ints_to_limbs(vals)
    d = mxu.digits_from_limbs(np, a)
    assert (mxu.limbs_from_digits(np, d) == a).all()


def test_toeplitz_mul_matches_int():
    v = rng.getrandbits(256)
    x = rng.getrandbits(256)
    mats = mxu.toeplitz_mats([v], 2 * mxu.ND4)
    x4 = np.asarray([(x >> (4 * k)) & 0xF for k in range(mxu.ND4)],
                    dtype=np.int32)
    cols = mats[0].astype(np.int64) @ x4
    got = sum(int(c) << (4 * k) for k, c in enumerate(cols))
    assert got == v * x


def test_mul_const_mont_matches_mont_mul():
    mod = engine._MOD_P
    G, B = 4, 6
    tw = [rng.randrange(mod.n) for _ in range(G)]
    tw_mont = [mod.to_mont_int(t) for t in tw]
    mats = mxu.toeplitz_mats(tw_mont, 2 * mxu.ND4)
    xs = [[rng.randrange(mod.n) for _ in range(B)] for _ in range(G)]
    x_digits = np.stack([
        mxu.digits_from_limbs(np, limbs.ints_to_limbs(row)).T
        for row in xs])  # (G, 32, B)
    out = mxu.mul_const_mont(np, x_digits, mats, mod)
    for g in range(G):
        got = [sum(int(out[g, k, b]) << (8 * k) for k in range(32))
               for b in range(B)]
        assert got == [(x * tw[g]) % mod.n for x in xs[g]]


def test_add_sub_mod256():
    mod = engine._MOD_P
    a = [rng.randrange(mod.n) for _ in range(8)] + [0, mod.n - 1]
    b = [rng.randrange(mod.n) for _ in range(8)] + [0, mod.n - 1]
    ad = mxu.digits_from_limbs(np, limbs.ints_to_limbs(a)).T  # (32, N)
    bd = mxu.digits_from_limbs(np, limbs.ints_to_limbs(b)).T
    s = mxu.add_mod256(np, ad, bd, mod)
    d = mxu.sub_mod256(np, ad, bd, mod)

    def vals(x):
        return [sum(int(x[k, i]) << (8 * k) for k in range(32))
                for i in range(x.shape[1])]
    assert vals(s) == [(x + y) % mod.n for x, y in zip(a, b)]
    assert vals(d) == [(x - y) % mod.n for x, y in zip(a, b)]


def test_encode_stages_mxu_matches_engine():
    n, Cc = 8, 3
    ctx = engine.NttContext(n, "ipa")
    vals = [rng.getrandbits(256) for _ in range(n * Cc)]
    arr = engine.crt_from_ints(vals, ctx.mod_q)
    arr = engine.CrtArray(arr.p.reshape(n, Cc, 16), arr.q.reshape(n, Cc, 16))
    ref = engine.encode_stages(np, ctx, arr)

    dp = mxu.digits_from_limbs(np, arr.p)
    dq = mxu.digits_from_limbs(np, arr.q)
    out_p = mxu.encode_stages_mxu(np, ctx, ctx.mod_p, dp)
    out_q = mxu.encode_stages_mxu(np, ctx, ctx.mod_q, dq)
    assert (mxu.limbs_from_digits(np, out_p) == np.asarray(ref.p)).all()
    assert (mxu.limbs_from_digits(np, out_q) == np.asarray(ref.q)).all()


def test_mul_const_mont8_matches_int_path():
    mod = engine._MOD_P
    G, B = 3, 5
    tw = [rng.randrange(mod.n) for _ in range(G)]
    tw_mont = [mod.to_mont_int(t) for t in tw]
    mats8 = mxu.toeplitz8_mats(tw_mont, 2 * mxu.ND)
    xs = [[rng.randrange(mod.n) for _ in range(B)] for _ in range(G)]
    x_digits = np.stack([
        mxu.digits_from_limbs(np, limbs.ints_to_limbs(row)).T
        for row in xs])
    out = mxu.mul_const_mont8(np, x_digits, mats8, mod)
    for g in range(G):
        got = [sum(int(out[g, k, b]) << (8 * k) for k in range(32))
               for b in range(B)]
        assert got == [(x * tw[g]) % mod.n for x in xs[g]]


def test_encode_stage8_matches_engine():
    n, Cc = 8, 2
    ctx = engine.NttContext(n, "ipa")
    vals = [rng.getrandbits(256) for _ in range(n * Cc)]
    arr = engine.crt_from_ints(vals, ctx.mod_q)
    arr = engine.CrtArray(arr.p.reshape(n, Cc, 16), arr.q.reshape(n, Cc, 16))
    ref = engine.encode_stages(np, ctx, arr)
    d = mxu.digits_from_limbs(np, arr.p)
    for s in range(1, ctx.height):
        mats8 = mxu.stage_twiddle_mats8(ctx, ctx.mod_p, 1 << (s - 1))
        d = mxu.encode_stage8(np, ctx.mod_p, d, s, mats8)
    assert (mxu.limbs_from_digits(np, d) == np.asarray(ref.p)).all()


def test_constant_geometry_encode_matches_engine():
    """mxu_cg (relayout-free stage pipeline) is bit-exact vs the engine."""
    from porla_tpu.ntt import mxu_cg

    for n, C in [(2, 3), (16, 4)]:
        ctx = engine.NttContext(n, "ipa")
        vals = [rng.randrange(ctx.mod_p.n) for _ in range(n * C)]
        arr = limbs.ints_to_limbs(vals).reshape(n, C, limbs.NLIMBS)
        ref = engine.encode_stages(np, ctx, engine.CrtArray(arr, arr))
        digs = mxu.digits_from_limbs(np, arr)
        for lane_mod, want in ((ctx.mod_p, ref.p), (ctx.mod_q, ref.q)):
            got = mxu.limbs_from_digits(
                np, mxu_cg.encode_cg(np, ctx, lane_mod, digs))
            assert np.array_equal(got, want)
