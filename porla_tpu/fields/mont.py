"""Vectorized 256-bit modular arithmetic on 16x16-bit limb tensors.

All functions are `xp`-agnostic: pass `numpy` for eager host execution or
`jax.numpy` inside jitted TPU kernels — the exact same arithmetic runs in
both places, so every device kernel has a bit-identical host twin.

TPU-first design:
- limbs are 16-bit values held in uint32 lanes; every partial product is
  exact in uint32 — no 64-bit arithmetic anywhere;
- the schoolbook product is ONE (…, 16, 16) vector multiply whose
  anti-diagonal column sums are computed with a pad/reshape "skew" trick
  (constant number of tensor ops, no per-limb loops);
- modular reduction is full-width Montgomery REDC: m = T·N' mod R and
  T + m·N as two more skew products — fully parallel, unlike the serial
  16-round digit-by-digit variant;
- carry/borrow propagation is a Kogge-Stone (generate, propagate) scan:
  log2(#limbs) tensor steps instead of a 16-step sequential chain.

Everything is built from whole-limb-axis tensor primitives, which keeps
traced/compiled program size small and gives XLA wide vectors with
log-depth dependency chains.

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


def _pad_last(xp, a, left: int, total: int):
    widths = [(0, 0)] * (a.ndim - 1) + [(left, total - left - a.shape[-1])]
    return xp.pad(a, widths)


def _shift_up(xp, a, s: int):
    """Shift limbs toward higher indices by s (same width, zeros in)."""
    widths = [(0, 0)] * (a.ndim - 1) + [(s, 0)]
    return xp.pad(a, widths)[..., : a.shape[-1]]


def _skew_colsum(xp, rows):
    """(…, R, W) partial-product rows -> (…, R+W) anti-diagonal column sums
    cols[k] = sum_{i+j=k} rows[i, j], in O(1) tensor ops.

    Works by padding each row to width W+R+1 and re-viewing the flat buffer
    with row stride W+R, which left-aligns row i at offset i — the classic
    "skew" reshape. Entries must satisfy R * max(rows) < 2^32.
    """
    R, W = rows.shape[-2], rows.shape[-1]
    padded = _pad_last(xp, rows, 0, W + R + 1)
    flat = padded.reshape(rows.shape[:-2] + (R * (W + R + 1),))
    flat = flat[..., : R * (W + R)]
    return xp.sum(flat.reshape(rows.shape[:-2] + (R, W + R)), axis=-2,
                  dtype=xp.uint32)


def _mul_cols(xp, a, b, width: int):
    """Column representation of the integer product a*b.

    a: (…, 16) limbs (< 2^16 each), b: (…, 16) -> (…, width) columns with
    entries < 2^21; value = sum_k cols[k] * 2^(16k).
    """
    p = a[..., :, None] * b[..., None, :]
    lo = _skew_colsum(xp, p & _M)
    hi = _skew_colsum(xp, p >> _SH)
    return _pad_last(xp, lo, 0, width) + _pad_last(xp, hi, 1, width)


def _resolve_carries(xp, g, p):
    """Exact carry resolution for disjoint (generate, propagate) limb flags
    (g & p == 0 elementwise) via the adder-emulation trick:

    with A = g|p, B = g (so A&B = g, A^B = p), the carry bits of the
    integer addition A+B are exactly the chain carries — so
    cin_mask = (A + B) ^ (A ^ B) = ((g|p) + g) ^ p, THREE integer ops on
    bit-packed masks instead of a log-depth scan. Limb flags are packed
    into 32-bit words; multi-word widths chain the word carry through the
    same identity (an incoming word carry adds into bit 0 and falls out of
    the XOR automatically).

    g, p: (…, W) uint32 0/1 flags. Returns (cin (…, W) uint32 0/1,
    carry_out (…,) uint32 0/1 of the top limb).
    """
    W = g.shape[-1]
    cins = []
    carry = None
    for w0 in range(0, W, 32):
        wlen = min(32, W - w0)
        pw2 = np.asarray([1 << k for k in range(wlen)], dtype=np.uint32)
        gw = xp.sum(g[..., w0:w0 + wlen] * pw2, axis=-1, dtype=xp.uint32)
        pw = xp.sum(p[..., w0:w0 + wlen] * pw2, axis=-1, dtype=xp.uint32)
        s = (gw | pw) + gw
        if carry is not None:
            s = s + carry
        cin_w = s ^ pw
        if wlen == 32:
            # carry out of the word: recompute top bit exactly — bit 32 of
            # (A+B+carry) wrapped; derive from generate/propagate at bit 31
            top_cin = (cin_w >> np.uint32(31)) & _ONE
            top_g = (gw >> np.uint32(31)) & _ONE
            top_p = (pw >> np.uint32(31)) & _ONE
            carry = top_g | (top_p & top_cin)
        else:
            carry = (cin_w >> np.uint32(wlen)) & _ONE
        shifts = np.asarray(range(wlen), dtype=np.uint32)
        cins.append((cin_w[..., None] >> shifts) & _ONE)
    cin = xp.concatenate(cins, axis=-1) if len(cins) > 1 else cins[0]
    return cin, carry


def _normalize(xp, cols):
    """Exact base-2^16 digits of a column representation.

    cols: (…, W) with entries < 2^31 -> digits (…, W+2) each < 2^16.
    """
    W = cols.shape[-1]
    c1 = cols >> _SH                                   # < 2^15
    v = _pad_last(xp, cols & _M, 0, W + 1) + _pad_last(xp, c1, 1, W + 1)
    c2 = v >> _SH                                      # {0, 1}
    v2 = _pad_last(xp, v & _M, 0, W + 2) + _pad_last(xp, c2, 1, W + 2)
    # v2 entries <= 2^16: carries are now 0/1 and g/p are disjoint
    g = v2 >> _SH                                      # generates carry
    p = ((v2 & _M) == _M).astype(xp.uint32)            # propagates carry
    cin, _ = _resolve_carries(xp, g, p)
    return (v2 + cin) & _M


def _borrow(xp, t):
    """For t = a + 2^16 - b per limb (entries in [1, 2^17)): returns
    (diff limbs of a - b mod 2^(16W), borrowed_out bool)."""
    g = (t >> _SH) ^ _ONE                       # borrows on its own
    p = (t == np.uint32(1 << _B)).astype(xp.uint32)  # borrow propagates
    bin_, bout = _resolve_carries(xp, g, p)
    diff = (t - bin_) & _M
    return diff, bout != 0


def _cond_sub_n(xp, res, top, mod: Modulus):
    """value = top*2^256 + res (< 2n): subtract n when >= n."""
    nl = xp.asarray(mod.limbs)
    t = res + np.uint32(1 << _B) - nl
    diff, borrowed = _borrow(xp, t)
    ge_n = (top > 0) | ~borrowed
    return xp.where(ge_n[..., None], diff, res)


# Nested-jit dispatch: on the jax path each op is traced ONCE per
# (modulus, operand shapes) and becomes a call in outer jaxprs — composite
# kernels (point ops, butterflies) would otherwise retrace the limb
# arithmetic at every call site, making trace time the bottleneck.
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
    return _dispatch(xp, "mul", mod, _mont_mul_impl, a, b)


def _low_mul_cols(xp, a, b_const):
    """Low 16 columns of a*b for canonical 16-bit limbs a (mod 2^256)."""
    pm = a[..., :, None] * b_const
    return (_skew_colsum(xp, pm & _M)[..., :NLIMBS]
            + _shift_up(xp, _skew_colsum(xp, pm >> _SH)[..., :NLIMBS], 1))


def _mont_mul_impl(xp, a, b, mod: Modulus):
    W = 2 * NLIMBS + 1
    t_cols = _mul_cols(xp, a, b, W)              # T = a*b, entries < 2^21

    # m = (T mod R) * N' mod R, computed from T's REDUNDANT low columns:
    # T_low = A + 2^16*B with A = cols & M (16-bit), B = cols >> 16
    # (< 2^5), so T_low*N' = A*N' + 2^16*(B*N') — B's partial products fit
    # uint32 without hi/lo splitting. Skips normalizing T entirely.
    nprime = xp.asarray(mod.nprime)
    tl = t_cols[..., :NLIMBS]
    m_cols = _low_mul_cols(xp, tl & _M, nprime)
    pm_hi = (tl >> _SH)[..., :, None] * nprime   # < 2^21 exact
    m_cols = m_cols + _shift_up(xp, _skew_colsum(xp, pm_hi)[..., :NLIMBS], 1)
    m = _normalize(xp, m_cols)[..., :NLIMBS]     # canonical (< R)

    # S = T + m*N  (≡ 0 mod R); result = S / R < 2n
    u_cols = _mul_cols(xp, m, xp.asarray(mod.limbs), W)
    s_cols = u_cols + t_cols
    s = _normalize(xp, s_cols)                   # (…, W+2)
    res = s[..., NLIMBS:2 * NLIMBS]
    top = s[..., 2 * NLIMBS]
    return _cond_sub_n(xp, res, top, mod)


def add_mod(xp, a, b, mod: Modulus):
    return _dispatch(xp, "add", mod, _add_mod_impl, a, b)


def _add_mod_impl(xp, a, b, mod: Modulus):
    a, b = xp.broadcast_arrays(a, b)
    d = _normalize(xp, a + b)                    # (…, 18)
    return _cond_sub_n(xp, d[..., :NLIMBS], d[..., NLIMBS], mod)


def sub_mod(xp, a, b, mod: Modulus):
    return _dispatch(xp, "sub", mod, _sub_mod_impl, a, b)


def _sub_mod_impl(xp, a, b, mod: Modulus):
    a, b = xp.broadcast_arrays(a, b)
    t = a + np.uint32(1 << _B) - b
    diff, borrowed = _borrow(xp, t)
    # if borrowed, add n back
    fixed = _normalize(xp, diff + xp.asarray(mod.limbs))[..., :NLIMBS]
    return xp.where(borrowed[..., None], fixed, diff)


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
    _, borrowed = _borrow(xp, a + np.uint32(1 << _B) - b)
    return ~borrowed


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
