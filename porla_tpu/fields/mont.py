"""Vectorized 256-bit modular arithmetic on 16x16-bit limb tensors.

All functions are `xp`-agnostic: pass `numpy` for eager host execution or
`jax.numpy` inside jitted TPU kernels — the exact same arithmetic runs in
both places, so every device kernel has a bit-identical host twin.

Design notes (why this maps well onto TPU vector units):
- limbs are 16-bit values held in uint32 lanes; a*b of two limbs is exact
  in uint32 (max (2^16-1)^2 < 2^32);
- schoolbook products are accumulated as 32 "columns" after splitting each
  partial product into hi/lo 16-bit halves, so every column stays < 2^22 —
  no carries needed until a single final propagation;
- Montgomery reduction (R = 2^256, 16-bit digits) interleaves with the
  columns; all sequential dependencies are 16-step scalar chains over fully
  vectorized batch axes.

This replaces the roles of NTL's ZZ_p arithmetic and libsecp256k1's
field_5x52/scalar_4x64 code in the reference (porla/Utils/utils.h,
porla/Utils/secp256k1_lib/field_5x52_impl.h) with a single batched core.
"""

from __future__ import annotations

import numpy as np

from porla_tpu.fields.limbs import LIMB_BITS, LIMB_MASK, NLIMBS, int_to_limbs

_B = LIMB_BITS
_M = LIMB_MASK


class Modulus:
    """Host-precomputed per-modulus constants."""

    def __init__(self, n: int, name: str = ""):
        assert n % 2 == 1 and n < (1 << 256)
        self.n = n
        self.name = name or hex(n)[:18]
        self.limbs = int_to_limbs(n)                      # (16,) u32
        self.limb_list = [int(x) for x in self.limbs]
        self.n0inv = (-pow(n, -1, 1 << _B)) % (1 << _B)   # -n^-1 mod 2^16
        self.r = (1 << 256) % n                           # R mod n
        self.r2 = (self.r * self.r) % n                   # R^2 mod n
        self.r2_limbs = int_to_limbs(self.r2)
        self.one_limbs = int_to_limbs(1)
        self.r_limbs = int_to_limbs(self.r)               # mont form of 1

    def to_mont_int(self, v: int) -> int:
        return (v * self.r) % self.n

    def __repr__(self):
        return f"Modulus({self.name})"


def _split(xp, a):
    """(…, 16) tensor -> list of 16 (…,) lanes."""
    return [a[..., i] for i in range(NLIMBS)]


def _join(xp, lanes):
    return xp.stack(lanes, axis=-1)


def mont_mul(xp, a, b, mod: Modulus):
    """Montgomery product a*b*R^-1 mod n. a, b canonical (< n) -> result < n.

    If one operand is in Montgomery form (v*R mod n), the result is the
    plain modular product of the other operand with v — the convention used
    throughout the data plane (twiddles live in Montgomery form).
    """
    al = _split(xp, a)
    bl = _split(xp, b)
    zero = xp.zeros_like(al[0])
    cols = [zero] * (2 * NLIMBS + 1)

    # schoolbook columns, hi/lo split (every term exact in uint32)
    for i in range(NLIMBS):
        ai = al[i]
        for j in range(NLIMBS):
            p = ai * bl[j]
            cols[i + j] = cols[i + j] + (p & _M)
            cols[i + j + 1] = cols[i + j + 1] + (p >> _B)

    # interleaved Montgomery reduction, 16-bit digits
    n0inv = np.uint32(mod.n0inv)
    nl = [np.uint32(x) for x in mod.limb_list]
    carry = zero
    for i in range(NLIMBS):
        cur = cols[i] + carry
        m = (cur * n0inv) & _M
        t0 = m * nl[0]
        cur = cur + (t0 & _M)
        cols[i + 1] = cols[i + 1] + (t0 >> _B)
        for j in range(1, NLIMBS):
            t = m * nl[j]
            cols[i + j] = cols[i + j] + (t & _M)
            cols[i + j + 1] = cols[i + j + 1] + (t >> _B)
        carry = cur >> _B

    # final carry propagation over the high half
    res = []
    for k in range(NLIMBS, 2 * NLIMBS):
        cur = cols[k] + carry
        res.append(cur & _M)
        carry = cur >> _B
    cur = cols[2 * NLIMBS] + carry  # < 2 (t/R < 2n < 2^257)
    top = cur

    return _cond_sub_n(xp, res, top, mod)


def _cond_sub_n(xp, res_lanes, top, mod: Modulus):
    """Given value = top*2^256 + res (< 2n), subtract n when >= n."""
    nl = [np.uint32(x) for x in mod.limb_list]
    diff = []
    borrow = xp.zeros_like(res_lanes[0])
    base = np.uint32(1 << _B)
    for k in range(NLIMBS):
        t = res_lanes[k] + base - nl[k] - borrow
        diff.append(t & _M)
        borrow = np.uint32(1) - (t >> _B)
    ge_n = (top > 0) | (borrow == 0)
    out = [xp.where(ge_n, d, r) for d, r in zip(diff, res_lanes)]
    return _join(xp, out)


def add_mod(xp, a, b, mod: Modulus):
    al = _split(xp, a)
    bl = _split(xp, b)
    res = []
    carry = xp.zeros_like(al[0])
    for k in range(NLIMBS):
        t = al[k] + bl[k] + carry
        res.append(t & _M)
        carry = t >> _B
    return _cond_sub_n(xp, res, carry, mod)


def sub_mod(xp, a, b, mod: Modulus):
    al = _split(xp, a)
    bl = _split(xp, b)
    nl = [np.uint32(x) for x in mod.limb_list]
    base = np.uint32(1 << _B)
    diff = []
    borrow = xp.zeros_like(al[0])
    for k in range(NLIMBS):
        t = al[k] + base - bl[k] - borrow
        diff.append(t & _M)
        borrow = np.uint32(1) - (t >> _B)
    # if borrowed, add n back
    neg = borrow != 0
    fixed = []
    carry = xp.zeros_like(al[0])
    for k in range(NLIMBS):
        t = diff[k] + nl[k] + carry
        fixed.append(t & _M)
        carry = t >> _B
    out = [xp.where(neg, f, d) for f, d in zip(fixed, diff)]
    return _join(xp, out)


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
    """a >= b as (…,) bool, via borrow chain."""
    al = _split(xp, a)
    bl = _split(xp, b)
    base = np.uint32(1 << _B)
    borrow = xp.zeros_like(al[0])
    for k in range(NLIMBS):
        t = al[k] + base - bl[k] - borrow
        borrow = np.uint32(1) - (t >> _B)
    return borrow == 0


def to_mont(xp, a, mod: Modulus):
    return mont_mul(xp, a, const_limbs(xp, a, mod.r2_limbs), mod)


def from_mont(xp, a, mod: Modulus):
    return mont_mul(xp, a, const_limbs(xp, a, mod.one_limbs), mod)


def mod_reduce(xp, a, mod: Modulus):
    """Reduce an arbitrary (<2^256) limb value into [0, n): a*R^-1*R."""
    # a may be >= n; mont_mul tolerates operands < 2^256 as long as the
    # Montgomery bound holds: t = (a*b + m*n)/R with a < 2^256, b = R^2 < n
    # gives t < (2^256*n + 2^256*n)/2^256 = 2n — still within _cond_sub_n.
    am = mont_mul(xp, a, const_limbs(xp, a, mod.r2_limbs), mod)
    return mont_mul(xp, am, const_limbs(xp, a, mod.one_limbs), mod)


def get_bit(xp, a, bit: int):
    """Bit `bit` of each element, as uint32 0/1."""
    return (a[..., bit // _B] >> np.uint32(bit % _B)) & np.uint32(1)
