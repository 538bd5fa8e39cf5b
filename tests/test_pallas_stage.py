"""Fused Pallas butterfly stage vs exact models (interpret mode on CPU).

The kernel (porla_tpu/ntt/pallas_stage.py) fuses the Toeplitz modmul,
Montgomery reduction, carry normalization and the butterfly add/sub; it
must be bit-exact against both the engine stage loop and plain Python
ints (the reference butterfly, porla/Server/Server.hpp:1584-1588).
"""

import random

import numpy as np

from porla_tpu.fields import limbs
from porla_tpu.ntt import engine, mxu, pallas_stage

rng = random.Random(77)


def _digits_from_ints(vals, shape):
    a = mxu.digits_from_limbs(np, limbs.ints_to_limbs(vals))
    return np.ascontiguousarray(
        np.moveaxis(a.reshape(shape + (32,)), -1, 1))


def test_butterfly_stage_matches_ints():
    ctx = engine.NttContext(16, "ipa")
    for mod in (ctx.mod_p, ctx.mod_q):
        m2, B = 2, 256
        u_vals = [rng.getrandbits(248) for _ in range(m2 * B)]
        t_vals = [rng.getrandbits(248) for _ in range(m2 * B)]
        tw = [rng.randrange(mod.n) for _ in range(m2)]
        u = _digits_from_ints(u_vals, (m2, B))
        t = _digits_from_ints(t_vals, (m2, B))
        mats = mxu.toeplitz8_mats([mod.to_mont_int(v) for v in tw], 64)
        hi, lo = map(np.asarray,
                     pallas_stage.butterfly_stage(u, t, mats, mod, bt=128))
        for g in range(m2):
            for b in range(0, B, 41):
                uu, tt = u_vals[g * B + b], t_vals[g * B + b]
                prod = (tt * tw[g]) % mod.n
                got_hi = sum(int(hi[g, k, b]) << (8 * k) for k in range(32))
                got_lo = sum(int(lo[g, k, b]) << (8 * k) for k in range(32))
                assert got_hi == (uu + prod) % mod.n
                assert got_lo == (uu - prod) % mod.n


def test_encode_stages_pallas_matches_engine():
    for n, C in [(2, 4), (32, 4)]:
        ctx = engine.NttContext(n, "ipa")
        vals = [rng.randrange(ctx.mod_p.n) for _ in range(n * C)]
        arr = limbs.ints_to_limbs(vals).reshape(n, C, limbs.NLIMBS)
        ref = engine.encode_stages(np, ctx, engine.CrtArray(arr, arr))
        digs = mxu.digits_from_limbs(np, arr)
        for mod, want in ((ctx.mod_p, ref.p), (ctx.mod_q, ref.q)):
            out = np.asarray(
                pallas_stage.encode_stages_pallas(ctx, mod, digs))
            assert np.array_equal(mxu.limbs_from_digits(np, out), want)
