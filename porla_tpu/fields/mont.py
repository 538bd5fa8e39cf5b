"""Vectorized 256-bit modular arithmetic on 16x16-bit limb tensors.

All functions are `xp`-agnostic: pass `numpy` for eager host execution or
`jax.numpy` inside jitted TPU kernels — the exact same arithmetic runs in
both places, so every device kernel has a bit-identical host twin.

TPU-first design:
- limbs are 16-bit values held in uint32 lanes; every partial product is
  exact in uint32 — no 64-bit arithmetic anywhere;
- **layout**: the public API carries limbs in the LAST axis (…, 16), but
  every implementation immediately moves limbs to axis 0 and batch to the
  trailing axes. On TPU the minor-most axis maps to the 128-wide vector
  lanes: with limbs minor, every op wastes 7/8 of the lanes and pays
  relayouts (measured 150x slower); with batch minor the lanes are full.
  The boundary moveaxis ops cancel between chained calls inside a jit;
- the schoolbook product is ONE (16, 16, …) vector multiply whose
  anti-diagonal column sums are computed with a pad/reshape "skew" trick;
- modular reduction is full-width Montgomery REDC: m = T·N' mod R is
  computed directly from the product's REDUNDANT columns (hi/lo split),
  so only one exact carry normalization per multiply remains;
- carry/borrow chains are resolved with the adder-emulation trick: with
  disjoint (generate, propagate) flags bit-packed into u32 words,
  carries = ((g|p) + g) ^ p — three integer ops, no sequential chain.

This replaces the roles of NTL's ZZ_p arithmetic and libsecp256k1's
field_5x52/scalar_4x64 code in the reference (porla/Utils/utils.h,
porla/Utils/secp256k1_lib/field_5x52_impl.h) with a single batched core.
"""

from __future__ import annotations

import numpy as np

from porla_tpu.fields.limbs import LIMB_BITS, LIMB_MASK, NLIMBS, int_to_limbs

_B = LIMB_BITS
_M = np.uint32(LIMB_MASK)
_ONE = np.uint32(1)
_SH = np.uint32(_B)


class Modulus:
    """Host-precomputed per-modulus constants."""

    def __init__(self, n: int, name: str = ""):
        assert n % 2 == 1 and n < (1 << 256)
        self.n = n
        self.name = name or hex(n)[:18]
        self.limbs = int_to_limbs(n)                      # (16,) u32
        self.nprime = int_to_limbs((-pow(n, -1, 1 << 256)) % (1 << 256))
        self.r = (1 << 256) % n                           # R mod n
        self.r2 = (self.r * self.r) % n                   # R^2 mod n
        self.r2_limbs = int_to_limbs(self.r2)
        self.one_limbs = int_to_limbs(1)
        self.r_limbs = int_to_limbs(self.r)               # mont form of 1

    def to_mont_int(self, v: int) -> int:
        return (v * self.r) % self.n

    def __repr__(self):
        return f"Modulus({self.name})"


# --- limb-first internal helpers (limb axis 0, batch trailing) -------------

def _lf(xp, a):
    """API layout (…, 16) -> internal (16, …)."""
    return xp.moveaxis(a, -1, 0)


def _lb(xp, a):
    """internal (16, …) -> API layout (…, 16)."""
    return xp.moveaxis(a, 0, -1)


def _const(xp, limbs_1d, ndim_batch: int):
    c = np.asarray(limbs_1d, dtype=np.uint32).reshape(
        (-1,) + (1,) * ndim_batch)
    return xp.asarray(c)


def _pad0(xp, a, left: int, total: int):
    widths = [(left, total - left - a.shape[0])] + [(0, 0)] * (a.ndim - 1)
    return xp.pad(a, widths)


def _shift_up(xp, a, s: int):
    widths = [(s, 0)] + [(0, 0)] * (a.ndim - 1)
    return xp.pad(a, widths)[: a.shape[0]]


def _skew_colsum(xp, rows):
    """(R, W, …) partial-product rows -> (R+W, …) anti-diagonal sums
    cols[k] = sum_{i+j=k} rows[i, j], in O(1) tensor ops (pad + reshape).
    Entries must satisfy R * max(rows) < 2^32."""
    R, W = rows.shape[0], rows.shape[1]
    widths = [(0, 0), (0, R + 1)] + [(0, 0)] * (rows.ndim - 2)
    padded = xp.pad(rows, widths)
    flat = padded.reshape((R * (W + R + 1),) + rows.shape[2:])
    flat = flat[: R * (W + R)]
    return xp.sum(flat.reshape((R, W + R) + rows.shape[2:]), axis=0,
                  dtype=xp.uint32)


def _mul_cols(xp, a, b, width: int):
    """Column representation of a*b; a, b (16, …) canonical limbs ->
    (width, …) columns with entries < 2^21."""
    p = a[:, None] * b[None, :]
    lo = _skew_colsum(xp, p & _M)
    hi = _skew_colsum(xp, p >> _SH)
    return _pad0(xp, lo, 0, width) + _pad0(xp, hi, 1, width)


def _resolve_carries(xp, g, p):
    """Exact carry resolution for disjoint (generate, propagate) flags via
    the adder-emulation identity cin = ((g|p) + g) ^ p on bit-packed
    words (see module docstring). g, p: (W, …) uint32 0/1. Returns
    (cin (W, …), carry_out (…,))."""
    W = g.shape[0]
    nb = g.ndim - 1
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
    return cin, carry


def _normalize(xp, cols):
    """Exact base-2^16 digits: cols (W, …) entries < 2^31 -> (W+2, …)."""
    W = cols.shape[0]
    c1 = cols >> _SH
    v = _pad0(xp, cols & _M, 0, W + 1) + _pad0(xp, c1, 1, W + 1)
    c2 = v >> _SH
    v2 = _pad0(xp, v & _M, 0, W + 2) + _pad0(xp, c2, 1, W + 2)
    g = v2 >> _SH
    p = ((v2 & _M) == _M).astype(xp.uint32)
    cin, _ = _resolve_carries(xp, g, p)
    return (v2 + cin) & _M


def _borrow(xp, t):
    """t = a + 2^16 - b per limb (entries in [1, 2^17)) ->
    (diff limbs (W, …), borrowed_out (…,) uint32 0/1)."""
    g = (t >> _SH) ^ _ONE
    p = (t == np.uint32(1 << _B)).astype(xp.uint32)
    bin_, bout = _resolve_carries(xp, g, p)
    return (t - bin_) & _M, bout


def _cond_sub_n(xp, res, top, mod: Modulus):
    """value = top*2^256 + res (< 2n): subtract n when >= n."""
    nl = _const(xp, mod.limbs, res.ndim - 1)
    diff, borrowed = _borrow(xp, res + np.uint32(1 << _B) - nl)
    ge_n = (top > 0) | (borrowed == 0)
    return xp.where(ge_n[None], diff, res)


def _low_mul_cols(xp, a, b_const):
    """Low 16 columns of a*b for canonical limbs a (mod 2^256)."""
    pm = a[:, None] * b_const[None, :]
    return (_skew_colsum(xp, pm & _M)[:NLIMBS]
            + _shift_up(xp, _skew_colsum(xp, pm >> _SH)[:NLIMBS], 1))


def _mont_mul_impl(xp, a, b, mod: Modulus):
    a = _lf(xp, a)
    b = _lf(xp, b)
    W = 2 * NLIMBS + 1
    t_cols = _mul_cols(xp, a, b, W)              # T = a*b, entries < 2^21

    # m = (T mod R) * N' mod R from T's REDUNDANT low columns:
    # T_low = A + 2^16*B (A 16-bit, B < 2^5) — B's partial products fit
    # uint32 unsplit, skipping T's normalization entirely.
    nprime = _const(xp, mod.nprime, a.ndim - 1)
    tl = t_cols[:NLIMBS]
    m_cols = _low_mul_cols(xp, tl & _M, nprime)
    pm_hi = (tl >> _SH)[:, None] * nprime[None, :]
    m_cols = m_cols + _shift_up(xp, _skew_colsum(xp, pm_hi)[:NLIMBS], 1)
    m = _normalize(xp, m_cols)[:NLIMBS]          # canonical (< R)

    # S = T + m*N  (≡ 0 mod R); result = S / R < 2n
    u_cols = _mul_cols(xp, m, _const(xp, mod.limbs, a.ndim - 1), W)
    s = _normalize(xp, u_cols + t_cols)          # (W+2, …)
    return _lb(xp, _cond_sub_n(xp, s[NLIMBS:2 * NLIMBS], s[2 * NLIMBS], mod))


def _add_mod_impl(xp, a, b, mod: Modulus):
    a, b = xp.broadcast_arrays(a, b)
    d = _normalize(xp, _lf(xp, a) + _lf(xp, b))  # (18, …)
    return _lb(xp, _cond_sub_n(xp, d[:NLIMBS], d[NLIMBS], mod))


def _sub_mod_impl(xp, a, b, mod: Modulus):
    a, b = xp.broadcast_arrays(a, b)
    al = _lf(xp, a)
    bl = _lf(xp, b)
    diff, borrowed = _borrow(xp, al + np.uint32(1 << _B) - bl)
    fixed = _normalize(xp, diff + _const(xp, mod.limbs, al.ndim - 1))[:NLIMBS]
    return _lb(xp, xp.where((borrowed != 0)[None], fixed, diff))


# --- public API (limb-last layout), nested-jit dispatch --------------------

# On the jax path each op is traced ONCE per (modulus, shapes) and becomes
# a shared call in outer jaxprs — composite kernels (point ops,
# butterflies) would otherwise retrace the limb arithmetic at every call
# site, making trace time the bottleneck.
_JIT_CACHE: dict = {}


def _dispatch(xp, name: str, mod: Modulus, impl, *args):
    if xp is np:
        return impl(np, *args, mod)
    key = (name, id(mod))
    f = _JIT_CACHE.get(key)
    if f is None:
        import jax
        import jax.numpy as jnp

        def wrapped(*ops_args):
            return impl(jnp, *ops_args, mod)

        f = jax.jit(wrapped)
        _JIT_CACHE[key] = f
    return f(*args)


def mont_mul(xp, a, b, mod: Modulus):
    """Montgomery product a*b*R^-1 mod n -> canonical (< n).

    One operand may be any 256-bit value (< 2^256); at least one must be
    canonical (< n) to keep the result < 2n before the final subtract.
    If one operand is in Montgomery form (v*R mod n), the result is the
    plain modular product of the other operand with v — the convention
    used throughout the data plane (twiddles live in Montgomery form).
    """
    a, b = xp.broadcast_arrays(a, b)
    return _dispatch(xp, "mul", mod, _mont_mul_impl, a, b)


def add_mod(xp, a, b, mod: Modulus):
    return _dispatch(xp, "add", mod, _add_mod_impl, a, b)


def sub_mod(xp, a, b, mod: Modulus):
    return _dispatch(xp, "sub", mod, _sub_mod_impl, a, b)


def neg_mod(xp, a, mod: Modulus):
    """(-a) mod n; maps 0 -> 0 (sub_mod(0, a) = n - a for a != 0)."""
    return sub_mod(xp, xp.zeros_like(a), a, mod)


def const_limbs(xp, like, limbs_1d):
    """Broadcast a (16,) host constant to match `like`'s batch shape."""
    limbs_1d = np.asarray(limbs_1d, dtype=np.uint32)
    return xp.broadcast_to(xp.asarray(limbs_1d), like.shape[:-1] + (NLIMBS,))


def is_zero(xp, a):
    return xp.all(a == 0, axis=-1)


def eq(xp, a, b):
    return xp.all(a == b, axis=-1)


def geq(xp, a, b):
    """a >= b as (…,) bool."""
    _, borrowed = _borrow(xp, _lf(xp, a) + np.uint32(1 << _B) - _lf(xp, b))
    return borrowed == 0


def to_mont(xp, a, mod: Modulus):
    return mont_mul(xp, a, const_limbs(xp, a, mod.r2_limbs), mod)


def from_mont(xp, a, mod: Modulus):
    return mont_mul(xp, a, const_limbs(xp, a, mod.one_limbs), mod)


def mod_reduce(xp, a, mod: Modulus):
    """Reduce an arbitrary (< 2^256) limb value into [0, n)."""
    am = mont_mul(xp, a, const_limbs(xp, a, mod.r2_limbs), mod)
    return mont_mul(xp, am, const_limbs(xp, a, mod.one_limbs), mod)


def get_bit(xp, a, bit: int):
    """Bit `bit` of each element, as uint32 0/1."""
    return (a[..., bit // _B] >> np.uint32(bit % _B)) & _ONE
