"""Fused Pallas elliptic-curve kernels: the MAC-mirror fast path.

The protocol's hot EC ops (the point butterfly M0 +/- tw*M1 inside
mix/CRebuild, point scaling, per-block commitment MSMs) run thousands of
independent 256-bit scalar multiplications. The XLA limb path
(curves/weierstrass.py over fields/mont.py) bottlenecks on VPU u32
multiplies and HBM round-trips between fusions — the same disease the
NTT had (see ntt/pallas_stage.py).

This module runs whole scalar-muls in VMEM:

- Field elements are (32, lanes) byte-digit tiles (Montgomery form).
- mul = VPU f32 convolution (exact: byte products < 2^16, column sums
  < 2^21 < 2^24) + the Toeplitz-matmul Montgomery reduction and
  packed-carry normalization shared with the NTT stage kernel.
- Point double/add are the same branchless dbl-2009-l / add-2007-bl
  formulas as weierstrass.py, on digit tiles.
- scalar_mul: 4-bit windowed double-and-add with the 16-entry
  per-lane table resident in VMEM; the window loop is a fori_loop.
- butterfly: scalar_mul fused with the two Jacobian adds.

Replaces the per-point CPU loops of the reference's libsecp256k1
(group_impl.h:336, ecmult_impl.h:335, ecmult_const_impl.h:137) with
batch kernels. Bit-exact vs the golden models (tests/test_pallas_curve).
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from porla_tpu.curves.weierstrass import CurveOps, JacPoint
from porla_tpu.fields import limbs as L
from porla_tpu.fields import mont
from porla_tpu.ntt import mxu
from porla_tpu.ntt.mxu import ND
from porla_tpu.ntt.pallas_stage import (_add_mod, _cond_sub, _f32_to_u32,
                                        _fold, _resolve, _sub_mod,
                                        _u32_to_bf16)

_M8 = np.uint32(0xFF)


def use_pallas() -> bool:
    """Route protocol EC ops through these kernels? On the TPU backend
    yes (PORLA_NO_PALLAS=1 overrides); on CPU the interpret path is far
    slower than the XLA limb path, so tests keep the latter."""
    import os
    return (jax.default_backend() == "tpu"
            and os.environ.get("PORLA_NO_PALLAS") != "1")


# --- in-kernel field ops on (32, B) byte-digit tiles ------------------------

def _conv_columns(a, b):
    """Exact product columns of two canonical byte-digit tiles:
    (32, B) x (32, B) -> (64, B) u32 columns < 2^21 (f32 FMA on VPU)."""
    af = a.astype(jnp.int32).astype(jnp.float32)
    bf = b.astype(jnp.int32).astype(jnp.float32)
    acc = jnp.zeros((2 * ND, a.shape[1]), jnp.float32)
    for i in range(ND):
        # shifted-add accumulation (Mosaic cannot lower slice-scatter)
        acc = acc + jnp.pad(af[i:i + 1] * bf, ((i, ND - i), (0, 0)))
    return _f32_to_u32(acc)


def _redc(t256, tabs):
    """Montgomery-reduce (64, B) product columns -> canonical digits.
    Same tail as the NTT stage kernel."""
    mN_, mN, nd, _ = tabs
    t_low, _ = _resolve(_fold(t256[:ND], ND))
    m256 = _f32_to_u32(jnp.dot(mN_, _u32_to_bf16(t_low),
                               preferred_element_type=jnp.float32))
    m, _ = _resolve(_fold(m256, ND))
    u256 = _f32_to_u32(jnp.dot(mN, _u32_to_bf16(m),
                               preferred_element_type=jnp.float32))
    sn, _ = _resolve(_fold(u256 + t256, 66))
    return _cond_sub(sn[ND:2 * ND], sn[2 * ND:2 * ND + 1], nd)


def _f_mul(a, b, tabs):
    return _redc(_conv_columns(a, b), tabs)


# --- field core v2: Karatsuba-hybrid conv + wide-dot REDC -------------------
#
# Round-4 bucket-kernel frontier (profile_msm_kernel.py): each 1.25 us
# field mul spent ~60% in the pad-shift conv and ~40% in THREE
# packed-carry resolves. v2 cuts both:
#  - 1-level UNSIGNED Karatsuba: mid = m1 - z0 - z2 is term-wise
#    nonnegative columnwise ((a0+a1)_i(b0+b1)_j >= a0_i b0_j + a1_i b1_j
#    per term), so everything stays exact in u32/f32 with no sign
#    handling; 3x16-tap convs beat one 32-tap (fewer 64-row pad-adds).
#  - wide-dot REDC: the 9-bit folded columns (lo <= 255, hi in {0,1})
#    feed a WIDENED Toeplitz bf16 dot directly — columns 32..63 of the
#    matrix carry the one-digit-shifted constant, truncated mod R — so
#    resolve #1 disappears; for moduli with 2n < R (BN254) resolve #2
#    disappears too (u < n^2/R + 1.004*n < 2n keeps the single
#    cond_sub sound; for secp256k1 n ~ R so m stays canonical).
#  - squarings (Z1^2, H^2, R^2) use the symmetric conv (~45% fewer
#    products).
# Exactness: chained-mul KAT vs host ints in examples/profile_fmul.py,
# plus the interpret-mode golden tests of every consumer kernel.

def _conv16(af, bf):
    """16-tap f32 conv -> (31, B) columns (<= 16*510^2 < 2^23)."""
    acc = jnp.zeros((31, af.shape[1]), jnp.float32)
    for i in range(16):
        acc = acc + jnp.pad(af[i:i + 1] * bf, ((i, 15 - i), (0, 0)))
    return acc


def _conv_columns2(a, b):
    """1-level Karatsuba-hybrid product columns: (32,B)x(32,B) ->
    (64,B) u32 columns < 2^24 (all contributions nonnegative)."""
    af = a.astype(jnp.int32).astype(jnp.float32)
    bf = b.astype(jnp.int32).astype(jnp.float32)
    a0, a1 = af[:16], af[16:]
    b0, b1 = bf[:16], bf[16:]
    z0 = _conv16(a0, b0)
    z2 = _conv16(a1, b1)
    m1 = _conv16(a0 + a1, b0 + b1)
    mid = m1 - z0 - z2
    t = (jnp.pad(z0, ((0, 33), (0, 0)))
         + jnp.pad(mid, ((16, 17), (0, 0)))
         + jnp.pad(z2, ((32, 1), (0, 0))))
    return _f32_to_u32(t)


def _conv16_sqr(af):
    """16-tap symmetric conv (square): a_i*a_j terms for i < j counted
    once against doubled digits."""
    a2 = af + af
    acc = jnp.zeros((31, af.shape[1]), jnp.float32)
    for i in range(16):
        if i + 1 < 16:  # Mosaic rejects zero-size slices
            row = jnp.concatenate([af[i:i + 1], a2[i + 1:]], axis=0)
        else:
            row = af[i:i + 1]
        acc = acc + jnp.pad(af[i:i + 1] * row, ((2 * i, 16 - i - 1), (0, 0)))
    return acc


def _conv_sqr2(a):
    """Karatsuba square columns: (32,B) -> (64,B) u32 < 2^24."""
    af = a.astype(jnp.int32).astype(jnp.float32)
    a0, a1 = af[:16], af[16:]
    z0 = _conv16_sqr(a0)
    z2 = _conv16_sqr(a1)
    m1 = _conv16_sqr(a0 + a1)
    mid = m1 - z0 - z2
    t = (jnp.pad(z0, ((0, 33), (0, 0)))
         + jnp.pad(mid, ((16, 17), (0, 0)))
         + jnp.pad(z2, ((32, 1), (0, 0))))
    return _f32_to_u32(t)


def _split9(v):
    """(32,B) folded values <= 511 -> (64,B) bf16 lo||hi for the wide
    dots, with the top hi flag dropped (truncation mod R — sound: any
    m = t*N' mod R works, and changing m by R changes u by n = 0 mod n)."""
    lo = v & np.uint32(0xFF)
    hi = v >> np.uint32(8)
    rowid = jax.lax.broadcasted_iota(jnp.uint32, (ND, 1), 0)
    hi = jnp.where(rowid == np.uint32(ND - 1), np.uint32(0), hi)
    return _u32_to_bf16(jnp.concatenate([lo, hi], axis=0))


def _redc2(t256, tabs2, friendly: bool):
    """Montgomery-reduce (64,B) product columns via the widened
    Toeplitz dots. friendly = (2n < R): skip resolve #2 as well."""
    w_, w, nd, _ = tabs2
    tl = _fold(t256[:ND], ND)
    m256 = _f32_to_u32(jnp.dot(w_, _split9(tl),
                               preferred_element_type=jnp.float32))
    if friendly:
        u_in = _split9(_fold(m256, ND))
    else:
        m, _ = _resolve(_fold(m256, ND))
        u_in = _u32_to_bf16(jnp.concatenate([m, m & np.uint32(0)], axis=0))
    u256 = _f32_to_u32(jnp.dot(w, u_in,
                               preferred_element_type=jnp.float32))
    sn, _ = _resolve(_fold(u256 + t256, 66))
    return _cond_sub(sn[ND:2 * ND], sn[2 * ND:2 * ND + 1], nd)


def _f_mul2(a, b, tabs2, friendly):
    return _redc2(_conv_columns2(a, b), tabs2, friendly)


def _f_sqr2(a, tabs2, friendly):
    return _redc2(_conv_sqr2(a), tabs2, friendly)


def _p_madd_pure2(p1, p2xy, tabs2, friendly):
    """v2 raw mixed add (8M + 3S); same no-case contract as
    _p_madd_pure."""
    nd = tabs2[2]
    X1, Y1, Z1 = p1
    X2, Y2 = p2xy

    def mul(x, y):
        return _f_mul2(x, y, tabs2, friendly)

    def sqr(x):
        return _f_sqr2(x, tabs2, friendly)

    Z1Z1 = sqr(Z1)
    A2 = mul(Y2, Z1)
    U2 = mul(X2, Z1Z1)
    S2 = mul(A2, Z1Z1)
    H = _sub_mod(U2, X1, nd)
    R = _sub_mod(S2, Y1, nd)
    HH = sqr(H)
    RR = sqr(R)
    HHH = mul(H, HH)
    V = mul(X1, HH)
    Z3 = mul(Z1, H)
    X3 = _sub_mod(_sub_mod(RR, HHH, nd), _add_mod(V, V, nd), nd)
    Y3 = _sub_mod(mul(R, _sub_mod(V, X3, nd)),
                  mul(Y1, HHH), nd)
    return (X3, Y3, Z3)


def _p_add_pure2(p1, p2, tabs2, friendly):
    """v2 raw full add (12M + 4S); same contract as _p_add_pure."""
    nd = tabs2[2]
    X1, Y1, Z1 = p1
    X2, Y2, Z2 = p2

    def mul(x, y):
        return _f_mul2(x, y, tabs2, friendly)

    def sqr(x):
        return _f_sqr2(x, tabs2, friendly)

    Z1Z1 = sqr(Z1)
    Z2Z2 = sqr(Z2)
    A1 = mul(Y1, Z2)
    A2 = mul(Y2, Z1)
    U1 = mul(X1, Z2Z2)
    U2 = mul(X2, Z1Z1)
    S1 = mul(A1, Z2Z2)
    S2 = mul(A2, Z1Z1)
    H = _sub_mod(U2, U1, nd)
    R = _sub_mod(S2, S1, nd)
    HH = sqr(H)
    RR = sqr(R)
    Z1Z2 = mul(Z1, Z2)
    HHH = mul(H, HH)
    V = mul(U1, HH)
    Z3 = mul(Z1Z2, H)
    X3 = _sub_mod(_sub_mod(RR, HHH, nd), _add_mod(V, V, nd), nd)
    Y3 = _sub_mod(mul(R, _sub_mod(V, X3, nd)),
                  mul(S1, HHH), nd)
    return (X3, Y3, Z3)


@lru_cache(maxsize=None)
def _curve_tables2(fp: mont.Modulus):
    """v2 kernel tables: widened Toeplitz REDC matrices (accepting
    lo||hi 9-bit-folded input; cols 32..63 = one-digit-shifted constant
    mod R) + modulus digits + R digits."""
    def wide(val: int, rows: int):
        base = mxu.toeplitz8_mats([val], rows)[0]
        # hi columns carry an implied x256 = ONE-ROW shift of the same
        # Toeplitz (NOT a value shift truncated mod 2^256 — that would
        # drop the top byte of val, e.g. BN254's 0x30, from the integer
        # product the second dot computes)
        shift = np.zeros_like(base)
        shift[1:, :] = base[:-1, :]
        return np.concatenate([base, shift], axis=1).astype(np.float32)
    nprime = (-pow(fp.n, -1, 1 << 256)) % (1 << 256)
    nd = mxu._mod_digits(fp).reshape(ND, 1)
    r_digits = np.asarray([(fp.r % fp.n) >> (8 * k) & 0xFF
                           for k in range(ND)], np.uint32).reshape(ND, 1)
    return (wide(nprime, ND).astype(jnp.bfloat16),
            wide(fp.n, 2 * ND).astype(jnp.bfloat16),
            np.ascontiguousarray(nd), r_digits)


def _mont_friendly(fp: mont.Modulus) -> bool:
    return 2 * fp.n < (1 << 256)


def _table_specs2():
    fixed = lambda *_: (0, 0)  # noqa: E731
    return [
        pl.BlockSpec((ND, 2 * ND), fixed, memory_space=pltpu.VMEM),
        pl.BlockSpec((2 * ND, 2 * ND), fixed, memory_space=pltpu.VMEM),
        pl.BlockSpec((ND, 1), fixed, memory_space=pltpu.VMEM),
        pl.BlockSpec((ND, 1), fixed, memory_space=pltpu.VMEM),
    ]


def _f_is_zero(d):
    return jnp.sum(d.astype(jnp.int32), axis=0, keepdims=True) == 0


def _f_eq(a, b):
    return jnp.sum((a ^ b).astype(jnp.int32), axis=0, keepdims=True) == 0


def _sel(mask, a, b):
    return jnp.where(mask, a, b)


def _sel_pt(mask, a, b):
    return tuple(_sel(mask, x, y) for x, y in zip(a, b))


# --- in-kernel point ops (Jacobian, a=0 curves) -----------------------------

def _p_neg(p, tabs):
    nd = tabs[2]
    x, y, z = p
    zero = y & np.uint32(0)
    ny = _sel(_f_is_zero(y), y, _sub_mod(zero, y, nd))
    return (x, ny, z)


def _p_dbl(p, tabs):
    """dbl-2009-l (weierstrass.double)."""
    nd = tabs[2]
    X, Y, Z = p
    A = _f_mul(X, X, tabs)
    B = _f_mul(Y, Y, tabs)
    C = _f_mul(B, B, tabs)
    xb = _add_mod(X, B, nd)
    xb2 = _f_mul(xb, xb, tabs)
    YZ = _f_mul(Y, Z, tabs)
    D = _sub_mod(_sub_mod(xb2, A, nd), C, nd)
    D = _add_mod(D, D, nd)
    E = _add_mod(_add_mod(A, A, nd), A, nd)
    F = _f_mul(E, E, tabs)
    X3 = _sub_mod(F, _add_mod(D, D, nd), nd)
    C2 = _add_mod(C, C, nd)
    C4 = _add_mod(C2, C2, nd)
    C8 = _add_mod(C4, C4, nd)
    Y3 = _sub_mod(_f_mul(E, _sub_mod(D, X3, nd), tabs), C8, nd)
    Z3 = _add_mod(YZ, YZ, nd)
    return (X3, Y3, Z3)


def _p_add(p1, p2, tabs):
    """add-2007-bl with branchless infinity/doubling/inverse handling
    (weierstrass.add)."""
    nd, rd = tabs[2], tabs[3]
    X1, Y1, Z1 = p1
    X2, Y2, Z2 = p2
    Z1Z1 = _f_mul(Z1, Z1, tabs)
    Z2Z2 = _f_mul(Z2, Z2, tabs)
    A1 = _f_mul(Y1, Z2, tabs)
    A2 = _f_mul(Y2, Z1, tabs)
    U1 = _f_mul(X1, Z2Z2, tabs)
    U2 = _f_mul(X2, Z1Z1, tabs)
    S1 = _f_mul(A1, Z2Z2, tabs)
    S2 = _f_mul(A2, Z1Z1, tabs)
    H = _sub_mod(U2, U1, nd)
    R = _sub_mod(S2, S1, nd)
    HH = _f_mul(H, H, tabs)
    RR = _f_mul(R, R, tabs)
    Z1Z2 = _f_mul(Z1, Z2, tabs)
    HHH = _f_mul(H, HH, tabs)
    V = _f_mul(U1, HH, tabs)
    Z3 = _f_mul(Z1Z2, H, tabs)
    X3 = _sub_mod(_sub_mod(RR, HHH, nd), _add_mod(V, V, nd), nd)
    Y3 = _sub_mod(_f_mul(R, _sub_mod(V, X3, nd), tabs),
                  _f_mul(S1, HHH, tabs), nd)
    raw = (X3, Y3, Z3)

    p1_inf = _f_is_zero(Z1)
    p2_inf = _f_is_zero(Z2)
    h_zero = _f_eq(U1, U2)
    r_zero = _f_eq(S1, S2)
    both = ~p1_inf & ~p2_inf
    dbl_case = both & h_zero & r_zero
    inf_case = both & h_zero & ~r_zero

    zero = X1 & np.uint32(0)
    inf_pt = (rd + zero, rd + zero, zero)
    out = _sel_pt(dbl_case, _p_dbl(p1, tabs), raw)
    out = _sel_pt(inf_case, inf_pt, out)
    out = _sel_pt(p2_inf, p1, out)
    out = _sel_pt(p1_inf, p2, out)
    return out


def _p_add_pure(p1, p2, tabs):
    """Raw add-2007-bl, NO case handling (16 muls). Contract: neither
    operand is infinity and p1 != p2 (the doubling case). p1 == -p2
    yields Z3 = 0, which IS the infinity encoding, so the inverse case
    is handled for free. Used by the blinded Pippenger kernels
    (pallas_msm): bucket accumulators start at secret random points, so
    p1 == p2 happens with negligible probability and the branchless
    doubling ladder (+8 muls) and infinity selects can be dropped."""
    nd = tabs[2]
    X1, Y1, Z1 = p1
    X2, Y2, Z2 = p2
    Z1Z1 = _f_mul(Z1, Z1, tabs)
    Z2Z2 = _f_mul(Z2, Z2, tabs)
    A1 = _f_mul(Y1, Z2, tabs)
    A2 = _f_mul(Y2, Z1, tabs)
    U1 = _f_mul(X1, Z2Z2, tabs)
    U2 = _f_mul(X2, Z1Z1, tabs)
    S1 = _f_mul(A1, Z2Z2, tabs)
    S2 = _f_mul(A2, Z1Z1, tabs)
    H = _sub_mod(U2, U1, nd)
    R = _sub_mod(S2, S1, nd)
    HH = _f_mul(H, H, tabs)
    RR = _f_mul(R, R, tabs)
    Z1Z2 = _f_mul(Z1, Z2, tabs)
    HHH = _f_mul(H, HH, tabs)
    V = _f_mul(U1, HH, tabs)
    Z3 = _f_mul(Z1Z2, H, tabs)
    X3 = _sub_mod(_sub_mod(RR, HHH, nd), _add_mod(V, V, nd), nd)
    Y3 = _sub_mod(_f_mul(R, _sub_mod(V, X3, nd), tabs),
                  _f_mul(S1, HHH, tabs), nd)
    return (X3, Y3, Z3)


def _p_madd_pure(p1, p2xy, tabs):
    """Raw mixed add (11 muls): p2 is affine with Z2 = 1 (Montgomery R)
    implied, given as (x, y) only. Same no-case contract as
    _p_add_pure."""
    nd = tabs[2]
    X1, Y1, Z1 = p1
    X2, Y2 = p2xy
    Z1Z1 = _f_mul(Z1, Z1, tabs)
    A2 = _f_mul(Y2, Z1, tabs)
    U2 = _f_mul(X2, Z1Z1, tabs)
    S2 = _f_mul(A2, Z1Z1, tabs)
    H = _sub_mod(U2, X1, nd)
    R = _sub_mod(S2, Y1, nd)
    HH = _f_mul(H, H, tabs)
    RR = _f_mul(R, R, tabs)
    HHH = _f_mul(H, HH, tabs)
    V = _f_mul(X1, HH, tabs)
    Z3 = _f_mul(Z1, H, tabs)
    X3 = _sub_mod(_sub_mod(RR, HHH, nd), _add_mod(V, V, nd), nd)
    Y3 = _sub_mod(_f_mul(R, _sub_mod(V, X3, nd), tabs),
                  _f_mul(Y1, HHH, tabs), nd)
    return (X3, Y3, Z3)


def _p_madd(p1, p2, tabs):
    """Mixed add: p2 is affine-or-infinity (Z2 in {0, R}), so mont-muls
    by Z2/Z2^2/Z2^3 collapse to identities — 11 field muls instead of 16.
    Same branchless case handling as _p_add."""
    nd, rd = tabs[2], tabs[3]
    X1, Y1, Z1 = p1
    X2, Y2, Z2 = p2
    Z1Z1 = _f_mul(Z1, Z1, tabs)
    A2 = _f_mul(Y2, Z1, tabs)
    U1, S1 = X1, Y1                       # * z2^k with z2 = 1
    U2 = _f_mul(X2, Z1Z1, tabs)
    S2 = _f_mul(A2, Z1Z1, tabs)
    H = _sub_mod(U2, U1, nd)
    R = _sub_mod(S2, S1, nd)
    HH = _f_mul(H, H, tabs)
    RR = _f_mul(R, R, tabs)
    HHH = _f_mul(H, HH, tabs)
    V = _f_mul(U1, HH, tabs)
    Z3 = _f_mul(Z1, H, tabs)
    X3 = _sub_mod(_sub_mod(RR, HHH, nd), _add_mod(V, V, nd), nd)
    Y3 = _sub_mod(_f_mul(R, _sub_mod(V, X3, nd), tabs),
                  _f_mul(S1, HHH, tabs), nd)
    raw = (X3, Y3, Z3)

    p1_inf = _f_is_zero(Z1)
    p2_inf = _f_is_zero(Z2)
    h_zero = _f_eq(U1, U2)
    r_zero = _f_eq(S1, S2)
    both = ~p1_inf & ~p2_inf
    dbl_case = both & h_zero & r_zero
    inf_case = both & h_zero & ~r_zero

    zero = X1 & np.uint32(0)
    inf_pt = (rd + zero, rd + zero, zero)
    out = _sel_pt(dbl_case, _p_dbl(p1, tabs), raw)
    out = _sel_pt(inf_case, inf_pt, out)
    out = _sel_pt(p2_inf, p1, out)
    out = _sel_pt(p1_inf, p2, out)
    return out


def _build_table(p, tabs):
    """T[d] = d*P for d in 0..15, stacked (16, 32, B) per coordinate."""
    rd = tabs[3]
    zero = p[0] & np.uint32(0)
    table = [(rd + zero, rd + zero, zero), p]
    for d in range(2, 16):
        if d % 2 == 0:
            table.append(_p_dbl(table[d // 2], tabs))
        else:
            table.append(_p_add(table[d - 1], p, tabs))
    return tuple(jnp.stack([t[c] for t in table], axis=0) for c in range(3))


def _lookup(tbl, digit):
    """Branchless 16-way select; digit (1, B). (A variant broadcasting
    the digit to full tile shape first measured 2x SLOWER in the smul
    kernel — Mosaic handles the (1, B) mask broadcast fine.)"""
    out = []
    for c in range(3):
        acc = jnp.zeros_like(tbl[c][0])
        for d in range(16):
            acc = acc | jnp.where(digit == np.uint32(d), tbl[c][d],
                                  np.uint32(0))
        out.append(acc)
    return tuple(out)


def _scalar_mul_body(p, s, tabs, nbits):
    """Windowed (4-bit, MSB-first) scalar mul; matches
    weierstrass.scalar_mul. s: (32, B) byte digits holding the scalar
    PRE-SHIFTED so its top window sits in the top nibble (the wrapper
    rolls scalars left by 256-nbits bits). The loop carries the shifted
    scalar and peels the top nibble each window — Mosaic has no
    dynamic_slice on values, so all indexing is static."""
    rd = tabs[3]
    tbl = _build_table(p, tabs)
    zero = p[0] & np.uint32(0)
    nwin = nbits // 4
    acc0 = (rd + zero, rd + zero, zero)

    def body(_, carry):
        (ax, ay, az), s = carry
        digit = s[ND - 1:ND] >> np.uint32(4)
        s2 = ((s << np.uint32(4)) & _M8) \
            | jnp.pad(s[:ND - 1] >> np.uint32(4), ((1, 0), (0, 0)))
        acc = (ax, ay, az)
        acc = _p_dbl(acc, tabs)
        acc = _p_dbl(acc, tabs)
        acc = _p_dbl(acc, tabs)
        acc = _p_dbl(acc, tabs)
        acc = _p_add(acc, _lookup(tbl, digit), tabs)
        return (acc, s2)

    (acc, _) = jax.lax.fori_loop(0, nwin, body, (acc0, s))
    return acc


def _glv_smul_body(p, s1, s2, g1, g2, beta, tabs):
    """GLV windowed scalar mul: k*P = k1*P + k2*phi(P) with phi = the
    cube-root endomorphism (x, y) -> (beta*x, y) and |k1|, |k2| < 2^128
    (see curves/glv.py; reference ecmult_impl.h:620-634). Halves the
    doubling chain: 32 windows of (4 dbl + 2 table adds) instead of 64
    of (4 dbl + 1 add).

    s1, s2: (32, B) digit tiles pre-shifted for 128 bits; g1, g2:
    (1, B) sign masks (1 = negate); beta: (ND, 1) Montgomery digits."""
    rd = tabs[3]
    nd = tabs[2]
    x, y, z = p
    zero = x & np.uint32(0)

    def neg_if(pt, m):
        return _sel_pt(m != 0, _p_neg(pt, tabs), pt)

    p1 = neg_if((x, y, z), g1)
    p2 = neg_if((_f_mul(x, beta + zero, tabs), y, z), g2)
    tbl1 = _build_table(p1, tabs)
    tbl2 = _build_table(p2, tabs)
    acc0 = (rd + zero, rd + zero, zero)

    def body(_, carry):
        acc, s1, s2 = carry
        d1 = s1[ND - 1:ND] >> np.uint32(4)
        d2 = s2[ND - 1:ND] >> np.uint32(4)

        def shift(s):
            return ((s << np.uint32(4)) & _M8) \
                | jnp.pad(s[:ND - 1] >> np.uint32(4), ((1, 0), (0, 0)))
        acc = _p_dbl(acc, tabs)
        acc = _p_dbl(acc, tabs)
        acc = _p_dbl(acc, tabs)
        acc = _p_dbl(acc, tabs)
        acc = _p_add(acc, _lookup(tbl1, d1), tabs)
        acc = _p_add(acc, _lookup(tbl2, d2), tabs)
        return (acc, shift(s1), shift(s2))

    (acc, _, _) = jax.lax.fori_loop(0, 32, body, (acc0, s1, s2))
    return acc


# --- fixed-base path --------------------------------------------------------
#
# The protocol's commitment MSMs (Pedersen generators, KZG SRS — reference
# Client.hpp:374-421 / Server.hpp:329-361 / main.go:103-116) always use the
# SAME bases. With per-window tables T_w[d] = d * 16^w * G precomputed, a
# scalar-mul is nwin table-lookup+adds: no doublings and no per-call table
# build (~3x fewer field muls than the double-and-add kernel). Tables are
# built once per (bases, nbits) on the host golden model and streamed from
# HBM one window per grid step; the output block accumulates in VMEM.

def _fb_kernel(W, tx, ty, tz, dig, mN__ref, mN_ref, nd_ref, rd_ref,
               ox, oy, oz):
    """W windows per grid step: per-step scheduling overhead (~0.1 ms,
    measured dominant over the 11-mul adds) is amortized W-fold."""
    g = pl.program_id(1)
    tabs = (mN__ref[:], mN_ref[:], nd_ref[:], rd_ref[:])
    rd = tabs[3]
    zero = ox[:] & np.uint32(0)

    @pl.when(g == 0)
    def _init():
        ox[:], oy[:], oz[:] = rd + zero, rd + zero, zero

    acc = (ox[:], oy[:], oz[:])
    for k in range(W):
        tbl = (tx[0, 16 * k:16 * (k + 1)], ty[0, 16 * k:16 * (k + 1)],
               tz[0, 16 * k:16 * (k + 1)])          # (16, ND, bt) each
        digit = dig[0, k:k + 1]                     # (1, bt)
        # table entries are affine (z in {0, R}) -> mixed add, 11 muls
        acc = _p_madd(acc, _lookup(tbl, digit), tabs)
    ox[:], oy[:], oz[:] = acc


# --- kernels ----------------------------------------------------------------
#
# Note (measured, one v5e): restructuring the fixed-base sum as a
# log-depth tree of wide batched adds (all 64 window lookups at once,
# then 6+ rounds of (32, 512)-tile Jacobian adds) is bit-exact but NOT
# faster than the serial per-window chain — both converge to ~0.3-0.5 us
# per lane-add, i.e. the field-mul primitive (digit conv + Toeplitz REDC
# dots + carry resolve) is the wall, not scheduling. Streaming-DMA and
# packed-DMA variants measured the same or worse. Hence the kernels below
# stay window-serial and the optimization lever is fewer field muls per
# point op (mixed adds against the affine table entries).

def _smul_kernel(nbits, x_ref, y_ref, z_ref, s_ref,
                 mN__ref, mN_ref, nd_ref, rd_ref, ox, oy, oz):
    tabs = (mN__ref[:], mN_ref[:], nd_ref[:], rd_ref[:])
    p = (x_ref[:], y_ref[:], z_ref[:])
    r = _scalar_mul_body(p, s_ref[:], tabs, nbits)
    ox[:], oy[:], oz[:] = r


def _butterfly_kernel(nbits, m0x, m0y, m0z, m1x, m1y, m1z, s_ref,
                      mN__ref, mN_ref, nd_ref, rd_ref,
                      hx, hy, hz, lx, ly, lz):
    tabs = (mN__ref[:], mN_ref[:], nd_ref[:], rd_ref[:])
    m1 = (m1x[:], m1y[:], m1z[:])
    t = _scalar_mul_body(m1, s_ref[:], tabs, nbits)
    m0 = (m0x[:], m0y[:], m0z[:])
    hx[:], hy[:], hz[:] = _p_add(m0, t, tabs)
    lx[:], ly[:], lz[:] = _p_add(m0, _p_neg(t, tabs), tabs)


def _glv_smul_kernel(x_ref, y_ref, z_ref, s1_ref, s2_ref, g1_ref, g2_ref,
                     mN__ref, mN_ref, nd_ref, rd_ref, beta_ref,
                     ox, oy, oz):
    tabs = (mN__ref[:], mN_ref[:], nd_ref[:], rd_ref[:])
    p = (x_ref[:], y_ref[:], z_ref[:])
    r = _glv_smul_body(p, s1_ref[:], s2_ref[:], g1_ref[:], g2_ref[:],
                       beta_ref[:], tabs)
    ox[:], oy[:], oz[:] = r


def _glv_butterfly_kernel(m0x, m0y, m0z, m1x, m1y, m1z,
                          s1_ref, s2_ref, g1_ref, g2_ref,
                          mN__ref, mN_ref, nd_ref, rd_ref, beta_ref,
                          hx, hy, hz, lx, ly, lz):
    tabs = (mN__ref[:], mN_ref[:], nd_ref[:], rd_ref[:])
    m1 = (m1x[:], m1y[:], m1z[:])
    t = _glv_smul_body(m1, s1_ref[:], s2_ref[:], g1_ref[:], g2_ref[:],
                       beta_ref[:], tabs)
    m0 = (m0x[:], m0y[:], m0z[:])
    hx[:], hy[:], hz[:] = _p_add(m0, t, tabs)
    lx[:], ly[:], lz[:] = _p_add(m0, _p_neg(t, tabs), tabs)


# --- host-side wrappers -----------------------------------------------------

@lru_cache(maxsize=None)
def _curve_tables(fp: mont.Modulus):
    mN_, mN = mxu._mod_mats8(fp)
    nd = mxu._mod_digits(fp).reshape(ND, 1)
    r_digits = np.asarray([(fp.r % fp.n) >> (8 * k) & 0xFF
                           for k in range(ND)], np.uint32).reshape(ND, 1)
    return (np.asarray(mN_, np.float32).astype(jnp.bfloat16),
            np.asarray(mN, np.float32).astype(jnp.bfloat16),
            np.ascontiguousarray(nd), r_digits)


def _table_specs():
    fixed = lambda *_: (0, 0)  # noqa: E731
    return [
        pl.BlockSpec((ND, ND), fixed, memory_space=pltpu.VMEM),
        pl.BlockSpec((2 * ND, ND), fixed, memory_space=pltpu.VMEM),
        pl.BlockSpec((ND, 1), fixed, memory_space=pltpu.VMEM),
        pl.BlockSpec((ND, 1), fixed, memory_space=pltpu.VMEM),
    ]


@lru_cache(maxsize=None)
def _smul_call(nbits: int, B: int, bt: int, interpret: bool):
    from functools import partial
    spec = pl.BlockSpec((ND, bt), lambda b: (0, b),
                        memory_space=pltpu.VMEM)
    out = jax.ShapeDtypeStruct((ND, B), jnp.uint32)
    return jax.jit(pl.pallas_call(
        partial(_smul_kernel, nbits),
        grid=(B // bt,),
        in_specs=[spec] * 4 + _table_specs(),
        out_specs=(spec,) * 3,
        out_shape=(out,) * 3,
        interpret=interpret,
    ))


@lru_cache(maxsize=None)
def _butterfly_call(nbits: int, B: int, bt: int, interpret: bool):
    from functools import partial
    spec = pl.BlockSpec((ND, bt), lambda b: (0, b),
                        memory_space=pltpu.VMEM)
    out = jax.ShapeDtypeStruct((ND, B), jnp.uint32)
    return jax.jit(pl.pallas_call(
        partial(_butterfly_kernel, nbits),
        grid=(B // bt,),
        in_specs=[spec] * 7 + _table_specs(),
        out_specs=(spec,) * 6,
        out_shape=(out,) * 6,
        interpret=interpret,
    ))


@lru_cache(maxsize=None)
def _glv_smul_call(B: int, bt: int, interpret: bool):
    spec = pl.BlockSpec((ND, bt), lambda b: (0, b),
                        memory_space=pltpu.VMEM)
    sgn = pl.BlockSpec((1, bt), lambda b: (0, b),
                       memory_space=pltpu.VMEM)
    beta = pl.BlockSpec((ND, 1), lambda b: (0, 0),
                        memory_space=pltpu.VMEM)
    out = jax.ShapeDtypeStruct((ND, B), jnp.uint32)
    return jax.jit(pl.pallas_call(
        _glv_smul_kernel,
        grid=(B // bt,),
        in_specs=[spec] * 5 + [sgn] * 2 + _table_specs() + [beta],
        out_specs=(spec,) * 3,
        out_shape=(out,) * 3,
        interpret=interpret,
    ))


@lru_cache(maxsize=None)
def _glv_butterfly_call(B: int, bt: int, interpret: bool):
    spec = pl.BlockSpec((ND, bt), lambda b: (0, b),
                        memory_space=pltpu.VMEM)
    sgn = pl.BlockSpec((1, bt), lambda b: (0, b),
                       memory_space=pltpu.VMEM)
    beta = pl.BlockSpec((ND, 1), lambda b: (0, 0),
                        memory_space=pltpu.VMEM)
    out = jax.ShapeDtypeStruct((ND, B), jnp.uint32)
    return jax.jit(pl.pallas_call(
        _glv_butterfly_kernel,
        grid=(B // bt,),
        in_specs=[spec] * 8 + [sgn] * 2 + _table_specs() + [beta],
        out_specs=(spec,) * 6,
        out_shape=(out,) * 6,
        interpret=interpret,
    ))


def _glv_prep(ops: CurveOps, scalars, B: int):
    """Host-side GLV split of a (B0, 16) scalar-limb batch: returns
    (s1, s2 digit tiles pre-shifted for 128 bits, g1, g2 sign masks,
    beta Montgomery digit column). Distinct values are decomposed once
    (fold twiddles arrive heavily tiled)."""
    from porla_tpu.curves import glv
    from porla_tpu.fields import limbs as L2
    gp = glv.params_for(ops.curve)
    ints = L2.limbs_to_ints(np.asarray(scalars, np.uint32))
    cache: dict = {}
    rows = []
    for k in ints:
        d = cache.get(k)
        if d is None:
            d = cache[k] = glv.decompose(k, gp)
        rows.append(d)
    k1 = L2.ints_to_limbs([d[0] for d in rows])
    k2 = L2.ints_to_limbs([d[2] for d in rows])
    s1 = _scalar_digits(k1, B, 128)
    s2 = _scalar_digits(k2, B, 128)
    g1 = np.zeros((1, B), np.uint32)
    g2 = np.zeros((1, B), np.uint32)
    g1[0, :len(rows)] = [d[1] for d in rows]
    g2[0, :len(rows)] = [d[3] for d in rows]
    beta_mont = ops.fp.to_mont_int(gp.beta)
    beta = np.asarray([(beta_mont >> (8 * i)) & 0xFF for i in range(ND)],
                      np.uint32).reshape(ND, 1)
    return s1, s2, jnp.asarray(g1), jnp.asarray(g2), jnp.asarray(beta)


_FB_W = 4  # windows per grid step (VMEM: 2 x W x 1.5 MB table blocks)


@lru_cache(maxsize=None)
def _fb_call(B: int, bt: int, nwin: int, interpret: bool):
    from functools import partial
    W = _FB_W if nwin % _FB_W == 0 else 1
    spec = pl.BlockSpec((ND, bt), lambda b, g: (0, b),
                        memory_space=pltpu.VMEM)
    tspec = pl.BlockSpec((1, 16 * W, ND, bt), lambda b, g: (g, 0, 0, 0),
                         memory_space=pltpu.VMEM)
    dspec = pl.BlockSpec((1, W, bt), lambda b, g: (g, 0, b),
                         memory_space=pltpu.VMEM)
    out = jax.ShapeDtypeStruct((ND, B), jnp.uint32)
    return W, jax.jit(pl.pallas_call(
        partial(_fb_kernel, W),
        grid=(B // bt, nwin // W),
        in_specs=[tspec] * 3 + [dspec] + _table_specs(),
        out_specs=(spec,) * 3,
        out_shape=(out,) * 3,
        interpret=interpret,
    ))


class FbTable:
    """Per-window lookup tables for a fixed set of bases: coords
    (nwin, 16, 32, ng) u32 digit tiles (raw base pattern). Device
    placement is cached — the ~100MB of tables must ride the
    host->device tunnel once, not per commit call."""

    def __init__(self, ops: CurveOps, coords, nbits: int, ng: int, bt: int):
        self.ops = ops
        self.tx, self.ty, self.tz = coords
        self.nbits = nbits
        self.ng = ng
        self.bt = bt
        self._dev = None
        self._dev_tiled: dict | None = None

    def device_coords(self):
        """Raw (nwin, 16, ND, ng) on device (tree path)."""
        if self._dev is None:
            self._dev = tuple(jnp.asarray(c)
                              for c in (self.tx, self.ty, self.tz))
        return self._dev

    def device_coords_tiled(self, W: int = 1):
        """Lane-width-tiled, W-window-grouped (nwin/W, 16*W, ND, bt)
        tables on device (window-serial kernel)."""
        key = W
        if self._dev_tiled is None:
            self._dev_tiled = {}
        if key not in self._dev_tiled:
            reps = self.bt // self.ng
            nwin = self.nbits // 4
            self._dev_tiled[key] = tuple(
                jnp.asarray(np.ascontiguousarray(
                    np.tile(c, (1, 1, 1, reps))
                    .reshape(nwin // W, 16 * W, ND, self.bt)))
                for c in (self.tx, self.ty, self.tz))
        return self._dev_tiled[key]


def build_fb_table(ops: CurveOps, gens_affine, nbits: int = 256,
                   bt: int = 256) -> FbTable:
    """Precompute T_w[d] = d * 16^w * G_i on the host golden model for
    every base (affine (x, y) int pairs or INF), then pack Montgomery
    digit tiles with the base pattern tiled across bt lanes."""
    from porla_tpu.golden import ecc
    cur = ops.curve
    ng = len(gens_affine)
    assert bt % ng == 0, "base pattern must tile the lane width"
    nwin = nbits // 4
    pts = []                                  # (w, d, g) order
    bases = list(gens_affine)
    for w in range(nwin):
        row = [ecc.INF] * (16 * ng)
        for g in range(ng):
            e = ecc.INF
            for d in range(1, 16):
                e = ecc.add(cur, e, bases[g])
                row[d * ng + g] = e
        pts.append(row)
        if w != nwin - 1:
            for g in range(ng):
                b = bases[g]
                for _ in range(4):
                    b = ecc.add(cur, b, b)
                bases[g] = b
    flat = [p for row in pts for p in row]
    jp = ops.from_affine(np, flat)            # (nwin*16*ng, 16) limbs

    def pack(c):
        d = np.asarray(mxu.digits_from_limbs(np, np.asarray(c)))
        d = d.reshape(nwin, 16, ng, ND)
        return np.ascontiguousarray(np.moveaxis(d, 3, 2))  # (…, ND, ng)

    return FbTable(ops, (pack(jp.x), pack(jp.y), pack(jp.z)),
                   nbits, ng, bt)


_FB_CACHE: dict = {}


def fb_table_for(ops: CurveOps, generators: JacPoint, nbits: int = 256,
                 bt: int = 256) -> FbTable:
    """Table for a JacPoint batch of bases, cached by coordinate digest
    (the Pedersen generators / KZG SRS never change within a run)."""
    import hashlib
    gx = np.asarray(generators.x)
    key = (hashlib.sha256(
        gx.tobytes() + np.asarray(generators.y).tobytes()
        + np.asarray(generators.z).tobytes()).hexdigest(), nbits, bt,
        ops.fp.n)
    tbl = _FB_CACHE.get(key)
    if tbl is None:
        affine = ops.to_affine(
            JacPoint(gx, np.asarray(generators.y),
                     np.asarray(generators.z)))
        tbl = _FB_CACHE[key] = build_fb_table(ops, affine, nbits, bt)
    return tbl


def _scalar_nibbles(scalars, B: int, nbits: int):
    """(B0, 16)-limb scalars -> (nwin, 1, B) LSB-first 4-bit windows."""
    d = np.asarray(mxu.digits_from_limbs(np, _pad_to(scalars, B)))  # (B, 32)
    nwin = nbits // 4
    out = np.empty((nwin, 1, B), np.uint32)
    for w in range(nwin):
        byte = d[:, w // 2]
        out[w, 0] = (byte >> 4) & 0xF if w % 2 else byte & 0xF
    return jnp.asarray(out)


def fb_scalar_mul(table: FbTable, scalars, interpret: bool | None = None,
                  keep_pad: bool = False) -> JacPoint:
    """scalars[i] * base[i % ng] for (B, 16)-limb standard-form scalars
    (< 2^nbits), lanes cycling through the table's base pattern."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    scalars = np.asarray(scalars, dtype=np.uint32)
    B0 = scalars.shape[0]
    bt = table.bt
    # pow2 padding (same rationale as _prep): batch-size drift across
    # level occupancies must not mint new executables
    B = bt
    while B < B0:
        B <<= 1
    nwin = table.nbits // 4
    W, fn = _fb_call(B, bt, nwin, interpret)
    tabs = _curve_tables(table.ops.fp)
    nib = _scalar_nibbles(scalars, B, table.nbits).reshape(
        nwin // W, W, B)
    tx, ty, tz = table.device_coords_tiled(W)
    x, y, z = fn(tx, ty, tz, nib, *(jnp.asarray(t) for t in tabs))
    if keep_pad:
        return JacPoint(_limbs_T(x), _limbs_T(y), _limbs_T(z))
    return JacPoint(_limbs_T(x)[:B0], _limbs_T(y)[:B0], _limbs_T(z)[:B0])


@lru_cache(maxsize=None)
def _fb_msm_call(ops: CurveOps, B: int, bt: int, nwin: int, nout: int,
                 interpret: bool):
    """Fixed-base kernel FUSED with the lane-halving tree reduction into
    one jitted dispatch: returns nout group sums (contiguous groups of
    B//nout lanes) as (nout, 16) limb coords. The IPA prover calls this
    once per transcript round — the round trips (kernel, tree_sum x2,
    fetch) otherwise each pay the device tunnel's ~0.1-0.3 s latency,
    which dominated audit wall time (reference Server.hpp:2279-2452
    does the same combine inline on the CPU)."""
    W, fb = _fb_call(B, bt, nwin, interpret)

    @jax.jit
    def f(tx, ty, tz, nib, *tabs):
        x, y, z = fb(tx, ty, tz, nib, *tabs)
        g = B // nout
        p = JacPoint(_limbs_T(x).reshape(nout, g, 16),
                     _limbs_T(y).reshape(nout, g, 16),
                     _limbs_T(z).reshape(nout, g, 16))
        w = g
        while w > 1:
            w //= 2
            p = ops.add(
                jnp,
                JacPoint(p.x[:, :w], p.y[:, :w], p.z[:, :w]),
                JacPoint(p.x[:, w:2 * w], p.y[:, w:2 * w],
                         p.z[:, w:2 * w]))
        return p.x[:, 0], p.y[:, 0], p.z[:, 0]
    return W, f


def fb_msm_groups(table: FbTable, scalars, nout: int,
                  interpret: bool | None = None) -> JacPoint:
    """scalars[i] * base[i % ng] summed within nout contiguous lane
    groups -> (nout, 16) JacPoint, in ONE device dispatch."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    scalars = np.asarray(scalars, dtype=np.uint32)
    B0 = scalars.shape[0]
    bt = table.bt
    B = max(bt, -(-B0 // bt) * bt)
    assert B % nout == 0, "groups must tile the padded lane width"
    g = B // nout
    # the lane-halving reduce drops lanes for non-pow2 group widths (the
    # same class as the pippenger bt guard), and with nout > 1 padding
    # must not shift the caller's group boundaries
    assert g & (g - 1) == 0, f"group width must be a power of two: {g}"
    assert nout == 1 or B0 % g == 0, \
        f"B0={B0} must be a multiple of the group width {g} when nout>1"
    # padding lanes (zero scalars -> infinity points) land in the LAST
    # group and contribute the identity to its sum
    nwin = table.nbits // 4
    W, fn = _fb_msm_call(table.ops, B, bt, nwin, nout, interpret)
    tabs = _curve_tables(table.ops.fp)
    nib = _scalar_nibbles(scalars, B, table.nbits).reshape(
        nwin // W, W, B)
    tx, ty, tz = table.device_coords_tiled(W)
    x, y, z = fn(tx, ty, tz, nib, *(jnp.asarray(t) for t in tabs))
    return JacPoint(x, y, z)


def _digits_T(a) -> "jnp.ndarray":
    """(B, 16) u32 limbs -> (32, B) byte-digit tiles."""
    d = mxu.digits_from_limbs(jnp, jnp.asarray(a))     # (B, 32)
    return d.T


def _limbs_T(d) -> "jnp.ndarray":
    """(32, B) digit tiles -> (B, 16) limbs."""
    return mxu.limbs_from_digits(jnp, jnp.asarray(d).T)


def _prep(B0: int, bt: int):
    """Pad the batch to a lane-aligned size; pick the tile width.

    Batches below _MIN_B pad up to _MIN_B so that every small call (fold
    levels 0..7, single-point scales, short MSMs) shares ONE compiled
    executable — each distinct batch size costs a fresh Pallas kernel
    compile through the remote compile service (~30-90 s on this
    platform), which dwarfs the wasted lanes (kernel time at 512 lanes
    ~= 128 lanes; the VPU is latency-bound at these widths). Above
    _MIN_B, pad to the next POWER OF TWO (not the next 128-lane tile):
    protocol batch sizes drift with level occupancy, and each distinct
    padded size is a fresh 30-90 s compile — pow2 buckets cap the
    executable count at log2(max batch) for <=2x wasted lanes."""
    B = _MIN_B
    while B < B0:
        B <<= 1
    btr = min(bt, B)
    while B % btr:
        btr >>= 1
    return B, btr


_MIN_B = 512


def _pad_to(a, B):
    cur = a.shape[0]
    if cur == B:
        return np.asarray(a)
    pad = np.zeros((B - cur,) + a.shape[1:], np.uint32)
    return np.concatenate([np.asarray(a), pad], axis=0)


def _pad_to_dev(a, B):
    """Device-side zero pad: never pulls a device-resident operand back
    to the host (every host fetch through the tunnel costs ~0.15 s)."""
    a = jnp.asarray(a)
    cur = a.shape[0]
    if cur == B:
        return a
    pad = jnp.zeros((B - cur,) + a.shape[1:], jnp.uint32)
    return jnp.concatenate([a, pad], axis=0)


def _scalar_digits(scalars, B: int, nbits: int):
    """(B0, 16)-limb scalars -> (32, B) digit tiles pre-shifted left by
    256-nbits bits (the kernel peels MSB windows from the top nibble).
    Scalars must be < 2^nbits (the low nbits are used, as in
    weierstrass.scalar_mul)."""
    assert nbits % 8 == 0
    d = np.asarray(mxu.digits_from_limbs(np, _pad_to(scalars, B)))
    k = (256 - nbits) // 8
    if k:
        d = np.concatenate(
            [np.zeros((d.shape[0], k), np.uint32), d[:, :ND - k]], axis=1)
    return jnp.asarray(np.ascontiguousarray(d.T))


def scalar_mul(ops: CurveOps, p: JacPoint, scalars, nbits: int = 256,
               bt: int = 256, interpret: bool | None = None,
               keep_pad: bool = False) -> JacPoint:
    """Batched scalars[i] * p[i] over the leading axis via the fused
    kernel. p: (B, 16)-limb JacPoint (Montgomery); scalars (B, 16)
    standard-form limbs. Semantics match weierstrass.scalar_mul.

    keep_pad=True returns the full lane-aligned batch (padded lanes hold
    the point at infinity) so downstream reductions see a constant shape
    per 128-lane bucket instead of recompiling per exact size."""
    import os
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    B0 = p.x.shape[0]
    B, bt_r = _prep(B0, bt)
    tabs = _curve_tables(ops.fp)
    args = [_digits_T(_pad_to_dev(c, B)) for c in (p.x, p.y, p.z)]
    if nbits == 256 and os.environ.get("PORLA_NO_GLV") != "1":
        glv_args = _glv_prep(ops, scalars, B)
        fn = _glv_smul_call(B, bt_r, interpret)
        x, y, z = fn(*args, *glv_args[:4],
                     *(jnp.asarray(t) for t in tabs), glv_args[4])
    else:
        fn = _smul_call(nbits, B, bt_r, interpret)
        sc = _scalar_digits(scalars, B, nbits)
        x, y, z = fn(*args, sc, *(jnp.asarray(t) for t in tabs))
    if keep_pad:
        return JacPoint(_limbs_T(x), _limbs_T(y), _limbs_T(z))
    return JacPoint(_limbs_T(x)[:B0], _limbs_T(y)[:B0], _limbs_T(z)[:B0])


def point_butterfly(ops: CurveOps, m0: JacPoint, m1: JacPoint, scalars,
                    nbits: int = 256, bt: int = 256,
                    interpret: bool | None = None):
    """(m0 + s*m1, m0 - s*m1) per lane — the MAC-mirror butterfly
    (reference Server.hpp:1592-1609) as one fused kernel."""
    import os
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    B0 = m0.x.shape[0]
    B, bt_r = _prep(B0, bt)
    tabs = _curve_tables(ops.fp)
    args = [_digits_T(_pad_to_dev(c, B))
            for c in (m0.x, m0.y, m0.z, m1.x, m1.y, m1.z)]
    if nbits == 256 and os.environ.get("PORLA_NO_GLV") != "1":
        glv_args = _glv_prep(ops, scalars, B)
        fn = _glv_butterfly_call(B, bt_r, interpret)
        out = fn(*args, *glv_args[:4],
                 *(jnp.asarray(t) for t in tabs), glv_args[4])
    else:
        fn = _butterfly_call(nbits, B, bt_r, interpret)
        sc = _scalar_digits(scalars, B, nbits)
        out = fn(*args, sc, *(jnp.asarray(t) for t in tabs))
    hi = JacPoint(*(_limbs_T(c)[:B0] for c in out[:3]))
    lo = JacPoint(*(_limbs_T(c)[:B0] for c in out[3:]))
    return hi, lo
