"""NTT/ICC encoding vs an exact Python-int emulation of the reference's
stage loops (porla/Server/Server.hpp:1548-1687, 1209-1328)."""

import random

import numpy as np

from porla_tpu.fields import constants as C
from porla_tpu.ntt import engine

P = C.FFT_PRIME
rng = random.Random(42)


def golden_encode(vals, n, w, lcm):
    """Direct emulation of CRebuild_Cached's X-part stage loop."""
    X = list(vals)
    height = n.bit_length()
    for s in range(1, height):
        m = 1 << s
        m2 = m >> 1
        v = pow(w, n // m2, P)
        for j in range(m2):
            vi = pow(v, j, P)
            for k in range(j, n, m):
                t = vi * X[k + m2]
                u = X[k]
                X[k] = (u + t) % lcm
                X[k + m2] = (u - t) % lcm
    return X


def golden_mix(a0, a1, n, length, w, lcm):
    """Direct emulation of the in-RAM mix (Server.hpp:1209-1328)."""
    v = pow(w, n // length, P)
    out = [0] * (2 * length)
    for i in range(length):
        val = pow(v, i, P) * a1[i]
        out[i] = (a0[i] + val) % lcm
        out[i + length] = (a0[i] - val) % lcm
    return out


def test_reverse_bits():
    assert engine.reverse_bits(0b0011, 4) == 0b1100
    assert engine.reverse_bits(1, 5) == 16
    assert engine.reverse_bits(0, 7) == 0


def test_twiddles_match_host_powers():
    ctx = engine.NttContext(16, "ipa")
    tw = ctx.twiddles(8)
    from porla_tpu.fields import limbs
    v = pow(ctx.w, 16 // 8, P)
    assert limbs.limbs_to_ints(tw.std) == [pow(v, j, P) for j in range(8)]


def test_encode_matches_golden_single_chunk():
    n = 16
    ctx = engine.NttContext(n, "ipa")
    lcm = C.LCM_IPA
    vals = [rng.getrandbits(256) for _ in range(n)]
    arr = engine.crt_from_ints(vals, ctx.mod_q)
    # add a chunk axis of size 1: (n, 1, 16)
    arr = engine.CrtArray(arr.p[:, None, :], arr.q[:, None, :])
    out = engine.encode_stages(np, ctx, arr)
    got = engine.crt_to_ints(out, ctx.mod_q)
    assert got == golden_encode(vals, n, ctx.w, lcm)


def test_encode_matches_golden_multichunk():
    n = 8
    nchunks = 3
    ctx = engine.NttContext(n, "ipa")
    lcm = C.LCM_IPA
    vals = [[rng.getrandbits(256) for _ in range(nchunks)] for _ in range(n)]
    flat = [v for row in vals for v in row]
    arr0 = engine.crt_from_ints(flat, ctx.mod_q)
    arr = engine.CrtArray(arr0.p.reshape(n, nchunks, 16),
                          arr0.q.reshape(n, nchunks, 16))
    out = engine.encode_stages(np, ctx, arr)
    got = engine.crt_to_ints(out, ctx.mod_q)
    expect_cols = [golden_encode([vals[i][c] for i in range(n)], n, ctx.w, lcm)
                   for c in range(nchunks)]
    expect = [expect_cols[c][i] for i in range(n) for c in range(nchunks)]
    assert got == expect


def test_mix_butterfly_matches_golden():
    n = 32
    length = 4
    ctx = engine.NttContext(n, "ipa")
    lcm = C.LCM_IPA
    a0 = [rng.getrandbits(300) % lcm for _ in range(length)]
    a1 = [rng.getrandbits(300) % lcm for _ in range(length)]
    tw = ctx.twiddles(length)
    c0 = engine.crt_from_ints(a0, ctx.mod_q)
    c1 = engine.crt_from_ints(a1, ctx.mod_q)
    hi, lo = engine.butterfly(np, c0, c1, tw, ctx.mod_q)
    got = (engine.crt_to_ints(hi, ctx.mod_q)
           + engine.crt_to_ints(lo, ctx.mod_q))
    assert got == golden_mix(a0, a1, n, length, ctx.w, lcm)


def test_align_scalars_and_reduce():
    ctx = engine.NttContext(8, "ipa")
    q = ctx.mod_q.n
    lcm = C.LCM_IPA
    vals = [rng.getrandbits(500) % lcm for _ in range(6)]
    arr = engine.crt_from_ints(vals, ctx.mod_q)
    from porla_tpu.fields import limbs
    c = engine.align_scalars(np, arr, ctx.mod_q)
    assert limbs.limbs_to_ints(c) == [((v % P) - v) % q for v in vals]
    red = engine.crt_reduce_mod_p(np, arr, ctx.mod_q)
    assert engine.crt_to_ints(red, ctx.mod_q) == [v % P for v in vals]


def test_align_scalars_and_reduce_kzg():
    """KZG lane: BN254_R < p, so mod-p-canonical values are NOT canonical
    mod q; crt_reduce_mod_p / align_scalars must fully reduce (advisor r1
    high finding — a single-borrow sub_mod is off by 2^256 mod q when
    (p-lane - q-lane) exceeds q)."""
    ctx = engine.NttContext(8, "kzg")
    q = ctx.mod_q.n
    lcm = C.FFT_PRIME * q
    vals = [rng.getrandbits(500) % lcm for _ in range(6)]
    # include adversarial values: q-lane small, p-lane near p (max gap)
    vals += [C.FFT_PRIME - 1 - k + C.FFT_PRIME * ((-(C.FFT_PRIME - 1 - k)
             * pow(C.FFT_PRIME, -1, q) + k) % q) for k in range(3)]
    from porla_tpu.fields import limbs
    arr = engine.crt_from_ints(vals, ctx.mod_q)
    c = engine.align_scalars(np, arr, ctx.mod_q)
    assert limbs.limbs_to_ints(c) == [((v % P) - v) % q for v in vals]
    red = engine.crt_reduce_mod_p(np, arr, ctx.mod_q)
    assert engine.crt_to_ints(red, ctx.mod_q) == [v % P for v in vals]
    # q_lane_from_p canonicalizes a stored mod-p file value
    ql = engine.q_lane_from_p(np, arr.p, ctx.mod_q)
    assert limbs.limbs_to_ints(ql) == [(v % P) % q for v in vals]


def test_wt_scalar():
    ctx = engine.NttContext(16, "ipa")
    from porla_tpu.fields import limbs
    tw = ctx.wt_scalar(write_step=5)
    e = engine.reverse_bits(5 % 16, 4)
    assert limbs.limbs_to_ints(tw.std) == [pow(ctx.w, e, P)]


def test_encode_jax_matches_numpy():
    import jax.numpy as jnp

    n = 8
    ctx = engine.NttContext(n, "ipa")
    vals = [rng.getrandbits(256) for _ in range(n)]
    arr = engine.crt_from_ints(vals, ctx.mod_q)
    arr1 = engine.CrtArray(arr.p[:, None, :], arr.q[:, None, :])
    out_np = engine.encode_stages(np, ctx, arr1)
    arrj = engine.CrtArray(jnp.asarray(arr1.p), jnp.asarray(arr1.q))
    out_j = engine.encode_stages(jnp, ctx, arrj)
    assert np.asarray(out_j.p).tolist() == out_np.p.tolist()
    assert np.asarray(out_j.q).tolist() == out_np.q.tolist()
