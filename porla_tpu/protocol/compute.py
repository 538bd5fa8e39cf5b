"""Jitted protocol kernels: data/MAC butterflies, linear combinations.

These are the hot operations of the hierarchical log: every `mix`/
`CRebuild` stage is one data butterfly (per CRT lane) plus one point
butterfly over the MAC planes (reference Server.hpp:1209-1328, 1548-1830).
All kernels pad the butterfly axis to a power of two (>= 8) so a handful
of executables serve every level/stage size.
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np

from porla_tpu.curves import kernels as ck
from porla_tpu.curves.instances import secp256k1
from porla_tpu.curves.weierstrass import CurveOps, JacPoint
from porla_tpu.fields import limbs, mont
from porla_tpu.ntt.engine import CrtArray, Twiddles, _MOD_P


def _pad_pow2(n: int, lo: int = 8) -> int:
    p = lo
    while p < n:
        p <<= 1
    return p


# --- data-plane butterfly --------------------------------------------------

@lru_cache(maxsize=None)
def _data_butterfly_fn(mod_q: mont.Modulus):
    @jax.jit
    def f(a0p, a0q, a1p, a1q, twp, twq):
        t_p = mont.mont_mul(jnp, a1p, twp, _MOD_P)
        t_q = mont.mont_mul(jnp, a1q, twq, mod_q)
        return (mont.add_mod(jnp, a0p, t_p, _MOD_P),
                mont.add_mod(jnp, a0q, t_q, mod_q),
                mont.sub_mod(jnp, a0p, t_p, _MOD_P),
                mont.sub_mod(jnp, a0q, t_q, mod_q))
    return f


def data_butterfly(mod_q, a0: CrtArray, a1: CrtArray,
                   tw: Twiddles) -> tuple[CrtArray, CrtArray]:
    """(L, C, 16) CRT pairs -> (a0 + v*a1, a0 - v*a1) with per-row twiddle.
    No padding needed: the limb graphs are small and shapes are power-of-two
    already."""
    L = a0.p.shape[0]
    twp = jnp.asarray(tw.mont_p)[:, None, :]
    twq = jnp.asarray(tw.mont_q)[:, None, :]
    hp, hq, lp, lq = _data_butterfly_fn(mod_q)(
        jnp.asarray(a0.p), jnp.asarray(a0.q), jnp.asarray(a1.p),
        jnp.asarray(a1.q), twp, twq)
    return CrtArray(hp, hq), CrtArray(lp, lq)


@lru_cache(maxsize=None)
def _scale_crt_fn(mod_q: mont.Modulus):
    @jax.jit
    def f(ap, aq, twp, twq):
        return (mont.mont_mul(jnp, ap, twp, _MOD_P),
                mont.mont_mul(jnp, aq, twq, mod_q))
    return f


def scale_crt(mod_q, a: CrtArray, tw: Twiddles) -> CrtArray:
    """a * v for a single scalar v (the Y-part time twist)."""
    twp = jnp.asarray(tw.mont_p)[0]
    twq = jnp.asarray(tw.mont_q)[0]
    p, q = _scale_crt_fn(mod_q)(jnp.asarray(a.p), jnp.asarray(a.q), twp, twq)
    return CrtArray(p, q)


# --- full-codeword data encode (CRebuild data plane) -----------------------

@lru_cache(maxsize=None)
def _stage_mats(n: int, scheme: str, hardened: bool, lane: str):
    """Device-resident Toeplitz twiddle stacks for all stages of one CRT
    lane (built once per context shape; ~n*64*32 bf16 total)."""
    from porla_tpu.ntt import mxu_cg
    from porla_tpu.ntt.engine import NttContext
    ctx = NttContext(n, scheme, hardened=hardened)
    mod = _MOD_P if lane == "p" else ctx.mod_q
    return [jnp.asarray(m) for m in mxu_cg.stage_mats_list(ctx, mod)]


def encode_crt(mod_q, ctx, arr: CrtArray) -> CrtArray:
    """All CRebuild butterfly stages s = 1..height-1 over an (n, C, 16)
    CRT array (reference stage loop, Server.hpp:1548-1687).

    On the TPU backend this runs the fused constant-geometry Pallas
    pipeline in the byte-digit domain (bit-exact twin of
    engine.encode_stages — tests/test_pallas_stage.py); elsewhere the
    XLA limb path."""
    from porla_tpu.curves.pallas_curve import use_pallas
    if use_pallas():
        from porla_tpu.ntt import mxu, pallas_stage
        outs = []
        for lane, mod in (("p", _MOD_P), ("q", mod_q)):
            mats = _stage_mats(ctx.n, ctx.scheme, ctx.hardened, lane)
            d = mxu.digits_from_limbs(jnp, jnp.asarray(getattr(arr, lane)))
            enc = pallas_stage.encode_stages_pallas(ctx, mod, d, mats)
            outs.append(mxu.limbs_from_digits(jnp, enc))
        return CrtArray(*outs)
    from porla_tpu.ntt import engine
    return engine.encode_stages(jnp, ctx,
                                CrtArray(jnp.asarray(arr.p),
                                         jnp.asarray(arr.q)))


# --- MAC-plane (point) butterfly -------------------------------------------

@lru_cache(maxsize=None)
def _point_butterfly_fn(ops: CurveOps, nplanes: int):
    @jax.jit
    def f(m0x, m0y, m0z, m1x, m1y, m1z, tw):
        # planes axis first: (P, L, 16); twiddles broadcast over planes
        m1 = JacPoint(m1x, m1y, m1z)
        t = ops.scalar_mul(jnp, m1, tw[None], 256)
        m0 = JacPoint(m0x, m0y, m0z)
        hi = ops.add(jnp, m0, t)
        lo = ops.add(jnp, m0, ops.neg(jnp, t))
        return tuple(hi) + tuple(lo)
    return f


def point_butterfly(M0s: list[JacPoint], M1s: list[JacPoint],
                    tw: Twiddles, ops=None) -> tuple[list[JacPoint], list[JacPoint]]:
    """Butterfly several point planes with shared twiddles:
    returns ([M0 + v*M1], [M0 - v*M1]) per plane. Planes are stacked into
    one kernel call; the L axis is padded to a power of two."""
    from porla_tpu.utils import trace
    with trace.span("point_butterfly", L=M0s[0].x.shape[0],
                    planes=len(M0s)):
        return _point_butterfly(M0s, M1s, tw, ops)


def _point_butterfly(M0s, M1s, tw, ops=None):
    from porla_tpu.curves import pallas_curve
    ops = ops or secp256k1()
    nplanes = len(M0s)
    L = M0s[0].x.shape[0]
    if pallas_curve.use_pallas():
        def cat(ms):
            # stays on device: plane chaining across fold levels must not
            # round-trip through the host (~0.15 s per tunnel fetch)
            return JacPoint(
                jnp.concatenate([jnp.asarray(m.x) for m in ms], 0),
                jnp.concatenate([jnp.asarray(m.y) for m in ms], 0),
                jnp.concatenate([jnp.asarray(m.z) for m in ms], 0))
        tws = np.tile(np.asarray(tw.std)[:L], (nplanes, 1))
        hi, lo = pallas_curve.point_butterfly(ops, cat(M0s), cat(M1s), tws)
        his = [JacPoint(hi.x[i * L:(i + 1) * L], hi.y[i * L:(i + 1) * L],
                        hi.z[i * L:(i + 1) * L]) for i in range(nplanes)]
        los = [JacPoint(lo.x[i * L:(i + 1) * L], lo.y[i * L:(i + 1) * L],
                        lo.z[i * L:(i + 1) * L]) for i in range(nplanes)]
        return his, los
    Lp = _pad_pow2(L)
    stack0 = ck.concat([ck.to_device(_pad_inf(m, Lp)) for m in M0s])
    stack1 = ck.concat([ck.to_device(_pad_inf(m, Lp)) for m in M1s])
    sx = stack0.x.reshape((nplanes, Lp, limbs.NLIMBS))
    sy = stack0.y.reshape((nplanes, Lp, limbs.NLIMBS))
    sz = stack0.z.reshape((nplanes, Lp, limbs.NLIMBS))
    tx = stack1.x.reshape((nplanes, Lp, limbs.NLIMBS))
    ty = stack1.y.reshape((nplanes, Lp, limbs.NLIMBS))
    tz = stack1.z.reshape((nplanes, Lp, limbs.NLIMBS))
    tws = np.asarray(tw.std)
    if tws.shape[0] < Lp:
        tws = np.concatenate(
            [tws, np.zeros((Lp - tws.shape[0], limbs.NLIMBS), np.uint32)], 0)
    out = _point_butterfly_fn(ops, nplanes)(sx, sy, sz, tx, ty, tz,
                                            jnp.asarray(tws))
    hi = JacPoint(out[0], out[1], out[2])
    lo = JacPoint(out[3], out[4], out[5])
    his = [JacPoint(hi.x[i, :L], hi.y[i, :L], hi.z[i, :L])
           for i in range(nplanes)]
    los = [JacPoint(lo.x[i, :L], lo.y[i, :L], lo.z[i, :L])
           for i in range(nplanes)]
    return his, los


def _pad_inf(p: JacPoint, n: int) -> JacPoint:
    """Pad with points at infinity, device-side (no host round trip)."""
    cur = p.x.shape[0]
    if cur == n:
        return p
    tail = (n - cur,) + p.x.shape[1:]
    return JacPoint(
        jnp.concatenate([jnp.asarray(p.x), jnp.ones(tail, jnp.uint32)], 0),
        jnp.concatenate([jnp.asarray(p.y), jnp.ones(tail, jnp.uint32)], 0),
        jnp.concatenate([jnp.asarray(p.z), jnp.zeros(tail, jnp.uint32)], 0))


def point_stage(ctx, s: int, macs: JacPoint, ops=None) -> JacPoint:
    """One radix-2 CRebuild stage over an (n, …) point plane (the MAC
    mirror of the data stage loop, Server.hpp:1548-1687). Split/join run
    on device (jnp) so consecutive stages chain without host fetches."""
    n = macs.x.shape[0]
    m = 1 << s
    m2 = m >> 1
    tw = ctx.twiddles(m2)

    def split(a):
        a2 = jnp.asarray(a).reshape((n // m, m) + a.shape[1:])
        return (a2[:, :m2].reshape((n // 2,) + a.shape[1:]),
                a2[:, m2:].reshape((n // 2,) + a.shape[1:]))

    def join(hi, lo, like):
        h = jnp.asarray(hi).reshape((n // m, m2) + like.shape[1:])
        lo2 = jnp.asarray(lo).reshape((n // m, m2) + like.shape[1:])
        return jnp.concatenate([h, lo2], axis=1).reshape(like.shape)

    tw_tiled = type(tw)(np.tile(tw.std, (n // m, 1)),
                        np.tile(tw.mont_p, (n // m, 1)),
                        np.tile(tw.mont_q, (n // m, 1)))
    u_pts = JacPoint(*[split(c)[0] for c in macs])
    t_pts = JacPoint(*[split(c)[1] for c in macs])
    his, los = point_butterfly([u_pts], [t_pts], tw_tiled, ops=ops)
    hi, lo = his[0], los[0]
    return JacPoint(join(hi.x, lo.x, macs.x),
                    join(hi.y, lo.y, macs.y),
                    join(hi.z, lo.z, macs.z))


@lru_cache(maxsize=None)
def _point_scale_fn(ops: CurveOps, nbits: int):
    @jax.jit
    def f(mx, my, mz, tw):
        return tuple(ops.scalar_mul(jnp, JacPoint(mx, my, mz), tw, nbits))
    return f


def point_scale(M: JacPoint, scalars, nbits: int = 256, ops=None) -> JacPoint:
    """Batched v_i * M_i with power-of-two padding (one executable)."""
    from porla_tpu.utils import trace
    with trace.span("point_scale", L=M.x.shape[0], nbits=nbits):
        return _point_scale(M, scalars, nbits, ops)


def _point_scale(M, scalars, nbits=256, ops=None):
    from porla_tpu.curves import pallas_curve
    L = M.x.shape[0]
    if pallas_curve.use_pallas():
        sc = np.asarray(scalars, dtype=np.uint32)
        sc = np.broadcast_to(sc, (L, limbs.NLIMBS))
        return pallas_curve.scalar_mul(ops or secp256k1(), M, sc, nbits)
    Lp = _pad_pow2(L)
    Mp = _pad_inf(M, Lp)
    sc = np.asarray(scalars, dtype=np.uint32)
    if sc.shape[0] < Lp:
        sc = np.concatenate(
            [sc, np.zeros((Lp - sc.shape[0], limbs.NLIMBS), np.uint32)], 0)
    out = JacPoint(*_point_scale_fn(ops or secp256k1(), nbits)(
        Mp.x, Mp.y, Mp.z, jnp.asarray(sc)))
    return JacPoint(out.x[:L], out.y[:L], out.z[:L])


# --- audit linear combination ----------------------------------------------

@lru_cache(maxsize=None)
def _lincomb_fn(mod_q: mont.Modulus):
    @jax.jit
    def f(bp, bq, cp, cq):
        # b*: (N, C, 16); c*: (N, 1, 16) Montgomery-form coefficients
        tp = mont.mont_mul(jnp, bp, cp, _MOD_P)
        tq = mont.mont_mul(jnp, bq, cq, mod_q)

        # shape-constant log-depth modular sum over N (lane 0 result)
        n = tp.shape[0]
        shift = 1
        while shift < n:
            def sh(a):
                pad = jnp.zeros((shift,) + a.shape[1:], jnp.uint32)
                return jnp.concatenate([a[shift:], pad], axis=0)
            tp = mont.add_mod(jnp, tp, sh(tp), _MOD_P)
            tq = mont.add_mod(jnp, tq, sh(tq), mod_q)
            shift <<= 1
        return tp[0], tq[0]
    return f


def linear_combine_crt(mod_q, blocks: CrtArray, coeffs: list[int]) -> CrtArray:
    """B = sum_i coeff_i * block_i over Z (exact in both CRT lanes) — the
    audit combination (Server.hpp:790-828). blocks: (N, C, 16)."""
    n = blocks.p.shape[0]
    npad = _pad_pow2(n)
    cp = limbs.ints_to_limbs([_MOD_P.to_mont_int(c) for c in coeffs]
                             + [0] * (npad - n))
    cq = limbs.ints_to_limbs([mod_q.to_mont_int(c % mod_q.n) for c in coeffs]
                             + [0] * (npad - n))
    bp = np.asarray(blocks.p)
    bq = np.asarray(blocks.q)
    if n < npad:
        pad = np.zeros((npad - n,) + bp.shape[1:], np.uint32)
        bp = np.concatenate([bp, pad], 0)
        bq = np.concatenate([bq, pad], 0)
    rp, rq = _lincomb_fn(mod_q)(jnp.asarray(bp), jnp.asarray(bq),
                                jnp.asarray(cp)[:, None, :],
                                jnp.asarray(cq)[:, None, :])
    return CrtArray(rp, rq)
