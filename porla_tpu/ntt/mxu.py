"""MXU fast path for the NTT butterfly: modmul-by-constant as exact int8
matmuls on the systolic array.

The butterfly multiplies data by per-column twiddle CONSTANTS. A modular
multiplication by a constant is a linear map over limbs, so it becomes a
matmul: with operands split into 4-bit limbs (int8-safe) the 512-bit
product's base-16 columns are M(tw) @ x4, where M(tw) is the Toeplitz
matrix of tw's 4-bit digits — int8 x int8 -> int32 on the MXU, exact by
construction (column sums <= 64 * 225 << 2^31). Montgomery reduction by
the constant modulus is two more Toeplitz matmuls (N' and N), with
base-256 carry normalization between them on the VPU (packed-carry
trick: 32 carry flags fit one uint32 word).

Data stays in base-256 digit tensors across stages; the +/- halves of
the butterfly run in the same domain. This is the speed-of-light path
for CRebuild's encode (reference Server.hpp:1548-1830);
porla_tpu.ntt.engine is the bit-exact general twin it is tested against.
"""

from __future__ import annotations

from functools import lru_cache

import numpy as np

from porla_tpu.fields import limbs as L
from porla_tpu.fields import mont

ND = 32           # base-256 digits per 256-bit value
ND4 = 64          # 4-bit limbs per 256-bit value
_M8 = np.uint32(0xFF)
_ONE = np.uint32(1)


# --- representation conversions --------------------------------------------

def digits_from_limbs(xp, a):
    """(…, 16) u32 16-bit limbs -> (…, 32) u32 base-256 digits."""
    lo = a & _M8
    hi = (a >> np.uint32(8)) & _M8
    return xp.stack([lo, hi], axis=-1).reshape(a.shape[:-1] + (ND,))


def limbs_from_digits(xp, d):
    """(…, 32) base-256 digits -> (…, 16) 16-bit limbs."""
    d2 = d.reshape(d.shape[:-1] + (L.NLIMBS, 2))
    return d2[..., 0] + (d2[..., 1] << np.uint32(8))


def _split4_digits_first(xp, d):
    """(32, …) base-256 digits -> (64, …) 4-bit limbs (still uint32)."""
    lo = d & np.uint32(0xF)
    hi = (d >> np.uint32(4)) & np.uint32(0xF)
    out = xp.stack([lo, hi], axis=1)          # (32, 2, …)
    return out.reshape((ND4,) + d.shape[1:])


def _pack16_to_256_first(xp, cols16):
    """(128, …) int32 base-16 columns -> (64, …) u32 base-256 columns."""
    c = cols16.astype(xp.uint32)
    c2 = c.reshape((ND4, 2) + cols16.shape[1:])
    return c2[:, 0] + (c2[:, 1] << np.uint32(4))


# --- Toeplitz matrices ------------------------------------------------------

def toeplitz_mats(values: list[int], rows: int) -> np.ndarray:
    """(G, rows, 64) int8 with M[g, o, i] = 4-bit digit o-i of values[g]."""
    g = len(values)
    digs = np.zeros((g, ND4), dtype=np.int8)
    for j, v in enumerate(values):
        vv = int(v)
        for k in range(ND4):
            digs[j, k] = (vv >> (4 * k)) & 0xF
    o = np.arange(rows)[:, None]
    i = np.arange(ND4)[None, :]
    idx = o - i
    valid = (idx >= 0) & (idx < ND4)
    m = np.where(valid[None], digs[:, np.clip(idx, 0, ND4 - 1)], 0)
    return m.astype(np.int8)


@lru_cache(maxsize=None)
def _mod_mats(mod: mont.Modulus):
    """(M_nprime (64, 64), M_n (128, 64)) int8 Toeplitz matrices."""
    nprime = (-pow(mod.n, -1, 1 << 256)) % (1 << 256)
    return (toeplitz_mats([nprime], ND4)[0], toeplitz_mats([mod.n], 2 * ND4)[0])


@lru_cache(maxsize=None)
def _mod_digits(mod: mont.Modulus) -> np.ndarray:
    return np.asarray([(mod.n >> (8 * k)) & 0xFF for k in range(ND)],
                      dtype=np.uint32)


# --- carry machinery (base 256, digit axis 0) ------------------------------

def _resolve_digits(xp, v):
    """v (W, …) with entries <= 511 and disjoint (g, p) flags -> exact
    digits via the packed adder-emulation carry trick."""
    g = v >> np.uint32(8)
    p = ((v & _M8) == _M8).astype(xp.uint32)
    W = v.shape[0]
    nb = v.ndim - 1
    cins = []
    carry = None
    for w0 in range(0, W, 32):
        wlen = min(32, W - w0)
        pw2 = np.asarray([1 << k for k in range(wlen)],
                         dtype=np.uint32).reshape((wlen,) + (1,) * nb)
        gw = xp.sum(g[w0:w0 + wlen] * pw2, axis=0, dtype=xp.uint32)
        pw = xp.sum(p[w0:w0 + wlen] * pw2, axis=0, dtype=xp.uint32)
        s = (gw | pw) + gw
        if carry is not None:
            s = s + carry
        cin_w = s ^ pw
        if wlen == 32:
            top_cin = (cin_w >> np.uint32(31)) & _ONE
            top_g = (gw >> np.uint32(31)) & _ONE
            top_p = (pw >> np.uint32(31)) & _ONE
            carry = top_g | (top_p & top_cin)
        else:
            carry = (cin_w >> np.uint32(wlen)) & _ONE
        shifts = np.asarray(range(wlen),
                            dtype=np.uint32).reshape((wlen,) + (1,) * nb)
        cins.append((cin_w[None] >> shifts) & _ONE)
    cin = xp.concatenate(cins, axis=0) if len(cins) > 1 else cins[0]
    return (v + cin) & _M8, carry


def _fold(xp, cols, width: int):
    """Shift-fold columns (< 2^26) to entries <= 511 with disjoint carry
    flags: three folds shrink the per-digit excess geometrically
    (2^18 -> 2^10 -> ~4)."""
    def pad(a, left, total):
        widths = [(left, total - left - a.shape[0])] + \
            [(0, 0)] * (a.ndim - 1)
        return xp.pad(a, widths)

    v = pad(cols[:width] & _M8, 0, width) + \
        pad((cols >> np.uint32(8))[:width - 1], 1, width)
    for _ in range(2):
        v = (v & _M8) + pad((v >> np.uint32(8))[:width - 1], 1, width)
    return v


def _normalize256(xp, cols, width: int):
    """cols (W, …) u32 < 2^26 -> exact base-256 digits (width, …) plus
    discarding nothing (width must cover the value)."""
    v = _fold(xp, cols, width)
    digits, _ = _resolve_digits(xp, v)
    return digits


def _cond_sub(xp, res, top, mod: mont.Modulus):
    nd = _mod_digits(mod).reshape((ND,) + (1,) * (res.ndim - 1))
    t = res + np.uint32(256) - nd
    g = (t >> np.uint32(8)) ^ _ONE
    p = (t == np.uint32(256)).astype(xp.uint32)
    nb = res.ndim - 1
    pw2 = np.asarray([1 << k for k in range(ND)],
                     dtype=np.uint32).reshape((ND,) + (1,) * nb)
    gw = xp.sum(g * pw2, axis=0, dtype=xp.uint32)
    pw = xp.sum(p * pw2, axis=0, dtype=xp.uint32)
    cin_w = ((gw | pw) + gw) ^ pw
    shifts = np.asarray(range(ND),
                        dtype=np.uint32).reshape((ND,) + (1,) * nb)
    cin = (cin_w[None] >> shifts) & _ONE
    diff = (t - cin) & _M8
    top_cin = (cin_w >> np.uint32(31)) & _ONE
    top_g = (gw >> np.uint32(31)) & _ONE
    top_p = (pw >> np.uint32(31)) & _ONE
    borrowed = top_g | (top_p & top_cin)
    ge_n = (top > 0) | (borrowed == 0)
    return xp.where(ge_n[None], diff, res)


# --- the MXU modmul-by-constant --------------------------------------------

def _default_dot(xp):
    if xp is np:
        def dot(mats, x4):
            return np.einsum("gok,gk...->go...", mats.astype(np.int32),
                             x4.astype(np.int32))
        return dot
    import jax
    import jax.numpy as jnp

    def dot(mats, x4):
        return jax.lax.dot_general(
            jnp.asarray(mats), x4.astype(jnp.int8),
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.int32)
    return dot


def mul_const_mont(xp, x, tw_mats, mod: mont.Modulus):
    """x: (G, 32, B) u32 canonical base-256 digits; tw_mats: (G, 128, 64)
    int8 Toeplitz stacks of Montgomery-form constants. Returns the plain
    modular products x * tw as (G, 32, B) canonical digits."""
    dot = _default_dot(xp)
    mN_, mN = _mod_mats(mod)
    G = x.shape[0]

    def split4(d_gfirst):
        # (G, 32, B) -> (G, 64, B) int8 4-bit limbs
        lo = d_gfirst & np.uint32(0xF)
        hi = (d_gfirst >> np.uint32(4)) & np.uint32(0xF)
        st = xp.stack([lo, hi], axis=2)          # (G, 32, 2, B)
        return st.reshape((G, ND4) + d_gfirst.shape[2:]).astype(xp.int8)

    def pack(cols16):
        # (G, 128, B) i32 -> (G, 64, B) u32
        c = cols16.astype(xp.uint32)
        c2 = c.reshape((G, ND4, 2) + cols16.shape[2:])
        return c2[:, :, 0] + (c2[:, :, 1] << np.uint32(4))

    x4 = split4(x)
    t256 = pack(dot(tw_mats, x4))                         # (G, 64, B) < 2^19
    tn = _normalize256(xp, xp.moveaxis(t256, 1, 0), ND4 + 2)  # (66, G, B)
    t_low = xp.moveaxis(tn[:ND], 0, 1)                    # (G, 32, B)

    mats_np = np.broadcast_to(mN_[None], (G,) + mN_.shape)
    m16 = dot(mats_np, split4(t_low))                     # (G, 64, B)
    c = m16.astype(xp.uint32)
    c2 = c.reshape((G, ND, 2) + m16.shape[2:])
    m256 = c2[:, :, 0] + (c2[:, :, 1] << np.uint32(4))    # (G, 32, B) < 2^18
    mnorm = _normalize256(xp, xp.moveaxis(m256, 1, 0), ND)[:ND]
    m = xp.moveaxis(mnorm, 0, 1)                          # canonical mod R

    mats_n = np.broadcast_to(mN[None], (G,) + mN.shape)
    u256 = pack(dot(mats_n, split4(m)))                   # (G, 64, B)

    s_cols = u256 + t256                                  # < 2^20
    sn = _normalize256(xp, xp.moveaxis(s_cols, 1, 0), ND4 + 2)
    out = _cond_sub(xp, sn[ND:2 * ND], sn[2 * ND], mod)
    return xp.moveaxis(out, 0, 1)


# --- base-256 butterfly add/sub (digit axis 0) -----------------------------

def add_mod256(xp, a, b, mod: mont.Modulus):
    """(a + b) mod n on (32, …) canonical digit tensors."""
    s = a + b
    nb = a.ndim - 1
    v = xp.pad(s & _M8, [(0, 1)] + [(0, 0)] * nb) + \
        xp.pad(s >> np.uint32(8), [(1, 0)] + [(0, 0)] * nb)
    v, _ = _resolve_digits(xp, v)
    return _cond_sub(xp, v[:ND], v[ND], mod)


def stage_twiddle_mats(ctx, lane_mod: mont.Modulus, m2: int) -> np.ndarray:
    """(m2, 128, 64) int8 Toeplitz stack for a stage's Montgomery-form
    twiddles (cached on the context)."""
    cache = getattr(ctx, "_mxu_mats", None)
    if cache is None:
        cache = {}
        ctx._mxu_mats = cache
    key = (id(lane_mod), m2)
    mats = cache.get(key)
    if mats is None:
        tw = ctx.twiddles(m2)
        src = tw.mont_p if lane_mod.n == ctx.mod_p.n else tw.mont_q
        vals = L.limbs_to_ints(np.asarray(src))
        mats = toeplitz_mats(vals, 2 * ND4)
        cache[key] = mats
    return mats


def encode_stage(xp, lane_mod: mont.Modulus, arr, s: int, mats):
    """One radix-2 stage over (n, C, 32) base-256 digit arrays via the
    MXU path (mats: this stage's (m2, 128, 64) int8 Toeplitz stack,
    passed as data so large twiddle tables are not baked into the
    program). Bit-exact twin of engine.encode_stages' stage s."""
    n, Cc = arr.shape[0], arr.shape[1]
    m = 1 << s
    m2 = m >> 1

    a = arr.reshape(n // m, m, Cc, ND)
    u = a[:, :m2]
    t = a[:, m2:]
    # group by twiddle column j: (m2, 32, B) with B = (n/m)*C
    tT = xp.moveaxis(t, 1, 0).reshape(m2, n // m * Cc, ND)
    tT = xp.moveaxis(tT, 2, 1)
    uT = xp.moveaxis(u, 1, 0).reshape(m2, n // m * Cc, ND)
    uT = xp.moveaxis(uT, 2, 1)

    prod = mul_const_mont(xp, tT, mats, lane_mod)   # (m2, 32, B)
    ud = xp.moveaxis(uT, 1, 0)                      # (32, m2, B)
    pd = xp.moveaxis(prod, 1, 0)
    hi = add_mod256(xp, ud, pd, lane_mod)           # (32, m2, B)
    lo = sub_mod256(xp, ud, pd, lane_mod)

    def back(dd):
        # (32, m2, B) -> (n/m, m2, C, 32)
        x = xp.moveaxis(dd, 0, 2)                   # (m2, B, 32)
        x = x.reshape(m2, n // m, Cc, ND)
        return xp.moveaxis(x, 0, 1)                 # (n/m, m2, C, 32)

    out = xp.concatenate([back(hi), back(lo)], axis=1)
    return out.reshape(n, Cc, ND)


def encode_stages_mxu(xp, ctx, lane_mod: mont.Modulus, arr, mats_list=None):
    """All CRebuild stages over an (n, C, 32) digit array (one CRT lane).
    mats_list: per-stage Toeplitz stacks (device arrays); defaults to the
    host-cached ones (fine for small n / eager numpy)."""
    for s in range(1, ctx.height):
        mats = (mats_list[s - 1] if mats_list is not None
                else stage_twiddle_mats(ctx, lane_mod, 1 << (s - 1)))
        arr = encode_stage(xp, lane_mod, arr, s, mats)
    return arr


def sub_mod256(xp, a, b, mod: mont.Modulus):
    """(a - b) mod n on (32, …) canonical digit tensors."""
    nd = _mod_digits(mod).reshape((ND,) + (1,) * (a.ndim - 1))
    t = a + np.uint32(256) - b
    g = (t >> np.uint32(8)) ^ _ONE
    p = (t == np.uint32(256)).astype(xp.uint32)
    nb = a.ndim - 1
    pw2 = np.asarray([1 << k for k in range(ND)],
                     dtype=np.uint32).reshape((ND,) + (1,) * nb)
    gw = xp.sum(g * pw2, axis=0, dtype=xp.uint32)
    pw = xp.sum(p * pw2, axis=0, dtype=xp.uint32)
    cin_w = ((gw | pw) + gw) ^ pw
    shifts = np.asarray(range(ND),
                        dtype=np.uint32).reshape((ND,) + (1,) * nb)
    cin = (cin_w[None] >> shifts) & _ONE
    diff = (t - cin) & _M8
    top_cin = (cin_w >> np.uint32(31)) & _ONE
    top_g = (gw >> np.uint32(31)) & _ONE
    top_p = (pw >> np.uint32(31)) & _ONE
    borrowed = top_g | (top_p & top_cin)
    fixed = diff + nd                                     # <= 510
    v = xp.pad(fixed & _M8, [(0, 1)] + [(0, 0)] * nb) + \
        xp.pad(fixed >> np.uint32(8), [(1, 0)] + [(0, 0)] * nb)
    fixed, _ = _resolve_digits(xp, v)
    return xp.where((borrowed != 0)[None], fixed[:ND], diff)


# --- bf16 base-256 variant --------------------------------------------------
# Operands stay in base-256 digits (values <= 255 are exact in bf16; column
# sums <= 32*255^2 < 2^24 are exact in the MXU's f32 accumulation), halving
# the contraction depth and the output traffic of the int8/4-bit path.

def toeplitz8_mats(values: list[int], rows: int) -> np.ndarray:
    """(G, rows, 32) uint8-valued arrays: M[g, o, i] = byte o-i of value."""
    g = len(values)
    digs = np.zeros((g, ND), dtype=np.int64)
    for j, v in enumerate(values):
        vv = int(v)
        for k in range(ND):
            digs[j, k] = (vv >> (8 * k)) & 0xFF
    o = np.arange(rows)[:, None]
    i = np.arange(ND)[None, :]
    idx = o - i
    valid = (idx >= 0) & (idx < ND)
    return np.where(valid[None], digs[:, np.clip(idx, 0, ND - 1)],
                    0).astype(np.float32)


@lru_cache(maxsize=None)
def _mod_mats8(mod: mont.Modulus):
    nprime = (-pow(mod.n, -1, 1 << 256)) % (1 << 256)
    return (toeplitz8_mats([nprime], ND)[0], toeplitz8_mats([mod.n], 2 * ND)[0])


def _dot8(xp):
    if xp is np:
        def dot(mats, x):
            return np.einsum("gok,gk...->go...",
                             np.asarray(mats, dtype=np.int64),
                             np.asarray(x, dtype=np.int64)).astype(np.uint32)
        return dot
    import jax
    import jax.numpy as jnp

    def dot(mats, x):
        out = jax.lax.dot_general(
            jnp.asarray(mats, dtype=jnp.bfloat16),
            x.astype(jnp.bfloat16),
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        return out.astype(jnp.uint32)
    return dot


def mul_const_mont8(xp, x, tw_mats8, mod: mont.Modulus):
    """bf16/base-256 twin of mul_const_mont. x: (G, 32, B) u32 canonical
    digits; tw_mats8: (G, 64, 32) f32 Toeplitz stacks (byte digits of
    Montgomery-form constants)."""
    dot = _dot8(xp)
    mN_, mN = _mod_mats8(mod)
    G = x.shape[0]

    t256 = dot(tw_mats8, x)                               # (G, 64, B) < 2^21
    tn = _normalize256(xp, xp.moveaxis(t256, 1, 0), ND4 + 2)  # (66, G, B)
    t_low = xp.moveaxis(tn[:ND], 0, 1)                    # (G, 32, B)

    m256 = dot(np.broadcast_to(mN_[None], (G,) + mN_.shape), t_low)
    mnorm = _normalize256(xp, xp.moveaxis(m256, 1, 0), ND)[:ND]
    m = xp.moveaxis(mnorm, 0, 1)                          # canonical mod R

    u256 = dot(np.broadcast_to(mN[None], (G,) + mN.shape), m)
    s_cols = u256 + t256                                  # < 2^22
    sn = _normalize256(xp, xp.moveaxis(s_cols, 1, 0), ND4 + 2)
    out = _cond_sub(xp, sn[ND:2 * ND], sn[2 * ND], mod)
    return xp.moveaxis(out, 0, 1)


def stage_twiddle_mats8(ctx, lane_mod: mont.Modulus, m2: int) -> np.ndarray:
    """(m2, 64, 32) f32 byte-Toeplitz stack for a stage (cached on ctx)."""
    cache = getattr(ctx, "_mxu_mats8", None)
    if cache is None:
        cache = {}
        ctx._mxu_mats8 = cache
    key = (id(lane_mod), m2)
    mats = cache.get(key)
    if mats is None:
        tw = ctx.twiddles(m2)
        src = tw.mont_p if lane_mod.n == ctx.mod_p.n else tw.mont_q
        vals = L.limbs_to_ints(np.asarray(src))
        mats = toeplitz8_mats(vals, 2 * ND)
        cache[key] = mats
    return mats


def encode_stage8(xp, lane_mod: mont.Modulus, arr, s: int, mats8):
    """bf16-path radix-2 stage over (n, C, 32) digit arrays."""
    n, Cc = arr.shape[0], arr.shape[1]
    m = 1 << s
    m2 = m >> 1

    a = arr.reshape(n // m, m, Cc, ND)
    u = a[:, :m2]
    t = a[:, m2:]
    tT = xp.moveaxis(xp.moveaxis(t, 1, 0).reshape(m2, n // m * Cc, ND), 2, 1)
    uT = xp.moveaxis(xp.moveaxis(u, 1, 0).reshape(m2, n // m * Cc, ND), 2, 1)

    prod = mul_const_mont8(xp, tT, mats8, lane_mod)
    ud = xp.moveaxis(uT, 1, 0)
    pd = xp.moveaxis(prod, 1, 0)
    hi = add_mod256(xp, ud, pd, lane_mod)
    lo = sub_mod256(xp, ud, pd, lane_mod)

    def back(dd):
        x2 = xp.moveaxis(dd, 0, 2)
        x2 = x2.reshape(m2, n // m, Cc, ND)
        return xp.moveaxis(x2, 0, 1)

    out = xp.concatenate([back(hi), back(lo)], axis=1)
    return out.reshape(n, Cc, ND)
