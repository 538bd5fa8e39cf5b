"""Fused Pallas butterfly stage: modmul-by-twiddle + mod add/sub in VMEM.

The XLA version of the stage (mxu.encode_stage8 / mxu_cg.cg_stage) spends
~85% of its time in VPU carry chains whose intermediates round-trip
through HBM between fusions. This kernel runs one butterfly stage —
Toeplitz dot (MXU), Montgomery reduction (two more dots), carry
normalization, conditional subtract, and the butterfly's mod add/sub —
entirely on (digits, lanes) VMEM tiles.

Math is identical to mxu.mul_const_mont8 with one narrowing: the first
normalization only resolves the low 32 columns (the value mod R — upper
columns are consumed raw by the final accumulation), done with a single
packed-carry chunk instead of a 66-wide pass.

Layout per tile: digit axis = sublanes (axis 0), value batch = lanes
(axis 1); grid = (twiddle group, batch tile). Constants that Pallas
cannot capture (modulus Toeplitz matrices, modulus digits) ride as
broadcast inputs; index vectors are built with broadcasted_iota.
Bit-exact vs engine.encode_stages (tests/test_pallas_stage.py); the
reference semantics are the CRebuild stage loop
(porla/Server/Server.hpp:1548-1687).
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from porla_tpu.fields import mont
from porla_tpu.ntt import mxu
from porla_tpu.ntt.mxu import ND

_M8 = np.uint32(0xFF)
_ONE = np.uint32(1)


def _iota_col(n: int):
    return jax.lax.broadcasted_iota(jnp.uint32, (n, 1), 0)


def _usum(x):
    """Sum disjoint-bit u32 terms over axis 0 (Mosaic lacks unsigned
    reductions; int32 bit patterns are identical for this use)."""
    return jnp.sum(x.astype(jnp.int32), axis=0,
                   keepdims=True).astype(jnp.uint32)


def _u32_to_bf16(x):
    """Mosaic has no u32<->bf16 cast; route via int32 (values <= 255)."""
    return x.astype(jnp.int32).astype(jnp.bfloat16)


def _f32_to_u32(x):
    """Exact for integer-valued f32 < 2^31."""
    return x.astype(jnp.int32).astype(jnp.uint32)


def _shift_digits(x, k: int, width: int):
    """Place x[i] at digit position i+k of a (width, B) array."""
    h = x.shape[0]
    top = width - h - k
    if top < 0:
        x = x[:width - k]
        top = 0
    return jnp.pad(x, ((k, top), (0, 0)))


def _fold(cols, width: int):
    """(W, B) u32 columns < 2^24 -> (width, B) values <= 511 with disjoint
    generate/propagate flags (two shifted-add passes)."""
    v = (_shift_digits(cols & _M8, 0, width)
         + _shift_digits((cols >> np.uint32(8)) & _M8, 1, width)
         + _shift_digits(cols >> np.uint32(16), 2, width))
    return (v & _M8) + _shift_digits(v >> np.uint32(8), 1, width)


def _resolve(v):
    """Exact digits of (W, B) values <= 511 with disjoint carry flags,
    via the packed-carry adder trick (cf. mxu._resolve_digits).
    Returns (digits, carry_out)."""
    W = v.shape[0]
    g = v >> np.uint32(8)
    p = ((v & _M8) == _M8).astype(jnp.uint32)
    outs = []
    carry = None
    for w0 in range(0, W, 32):
        wl = min(32, W - w0)
        ii = _iota_col(wl)
        gw = _usum(g[w0:w0 + wl] << ii)
        pw = _usum(p[w0:w0 + wl] << ii)
        s = (gw | pw) + gw
        if carry is not None:
            s = s + carry
        cin_w = s ^ pw
        if wl == 32:
            top_cin = (cin_w >> np.uint32(31)) & _ONE
            top_g = (gw >> np.uint32(31)) & _ONE
            top_p = (pw >> np.uint32(31)) & _ONE
            carry = top_g | (top_p & top_cin)
        else:
            carry = (cin_w >> np.uint32(wl)) & _ONE
        cin = (cin_w >> ii) & _ONE
        outs.append((v[w0:w0 + wl] + cin) & _M8)
    digits = jnp.concatenate(outs, axis=0) if len(outs) > 1 else outs[0]
    return digits, carry


def _cond_sub(res, top, nd):
    """If (res + top*R) >= n subtract n. res (32, B) canonical digits,
    top (1, B), nd (32, B-broadcastable) modulus digits."""
    t = res + np.uint32(256) - nd
    g = (t >> np.uint32(8)) ^ _ONE
    p = (t == np.uint32(256)).astype(jnp.uint32)
    ii = _iota_col(ND)
    gw = _usum(g << ii)
    pw = _usum(p << ii)
    cin_w = ((gw | pw) + gw) ^ pw
    cin = (cin_w >> ii) & _ONE
    diff = (t - cin) & _M8
    top_cin = (cin_w >> np.uint32(31)) & _ONE
    top_g = (gw >> np.uint32(31)) & _ONE
    top_p = (pw >> np.uint32(31)) & _ONE
    borrowed = top_g | (top_p & top_cin)
    ge_n = (top > 0) | (borrowed == 0)
    return jnp.where(ge_n, diff, res)


def _add_mod(a, b, nd):
    """(a + b) mod n on (32, B) canonical digit tiles."""
    s = a + b
    v = (_shift_digits(s & _M8, 0, ND + 1)
         + _shift_digits(s >> np.uint32(8), 1, ND + 1))
    d, _ = _resolve(v)
    return _cond_sub(d[:ND], d[ND:ND + 1], nd)


def _sub_mod(a, b, nd):
    """(a - b) mod n on (32, B) canonical digit tiles
    (cf. mxu.sub_mod256)."""
    t = a + np.uint32(256) - b
    g = (t >> np.uint32(8)) ^ _ONE
    p = (t == np.uint32(256)).astype(jnp.uint32)
    ii = _iota_col(ND)
    gw = _usum(g << ii)
    pw = _usum(p << ii)
    cin_w = ((gw | pw) + gw) ^ pw
    cin = (cin_w >> ii) & _ONE
    diff = (t - cin) & _M8
    top_cin = (cin_w >> np.uint32(31)) & _ONE
    top_g = (gw >> np.uint32(31)) & _ONE
    top_p = (pw >> np.uint32(31)) & _ONE
    borrowed = top_g | (top_p & top_cin)
    fixed = diff + nd                                     # <= 510
    v = (_shift_digits(fixed & _M8, 0, ND + 1)
         + _shift_digits(fixed >> np.uint32(8), 1, ND + 1))
    d, _ = _resolve(v)
    return jnp.where(borrowed != 0, d[:ND], diff)


def _stage_kernel(mats_ref, u_ref, t_ref, mN__ref, mN_ref, nd_ref,
                  hi_ref, lo_ref):
    mats = mats_ref[0]                                      # (64, 32) bf16
    x = _u32_to_bf16(t_ref[0])                              # (32, B)
    nd = nd_ref[:]                                          # (32, 1)

    t256 = _f32_to_u32(jnp.dot(mats, x,
                               preferred_element_type=jnp.float32))

    # t mod R: only the low 32 columns, single packed-carry chunk
    t_low, _ = _resolve(_fold(t256[:32], 32))

    m256 = _f32_to_u32(jnp.dot(mN__ref[:], _u32_to_bf16(t_low),
                               preferred_element_type=jnp.float32))
    m, _ = _resolve(_fold(m256, ND))

    u256 = _f32_to_u32(jnp.dot(mN_ref[:], _u32_to_bf16(m),
                               preferred_element_type=jnp.float32))

    s_cols = u256 + t256                                    # (64, B) < 2^22
    sn, _ = _resolve(_fold(s_cols, 66))
    prod = _cond_sub(sn[ND:2 * ND], sn[2 * ND:2 * ND + 1], nd)

    ud = u_ref[0]
    hi_ref[0] = _add_mod(ud, prod, nd)
    lo_ref[0] = _sub_mod(ud, prod, nd)


@lru_cache(maxsize=None)
def _mod_tables(mod: mont.Modulus):
    mN_, mN = mxu._mod_mats8(mod)
    nd = mxu._mod_digits(mod).reshape(ND, 1)
    return (np.asarray(mN_, dtype=np.float32).astype(jnp.bfloat16),
            np.asarray(mN, dtype=np.float32).astype(jnp.bfloat16),
            np.ascontiguousarray(nd))


@lru_cache(maxsize=None)
def _stage_call(m2: int, B: int, bt: int, interpret: bool):
    """One executable per shape; the modulus tables ride as inputs, so
    the p and q lanes share compilations."""
    grid = (m2, B // bt)
    data_spec = pl.BlockSpec((1, ND, bt), lambda g, b: (g, 0, b),
                             memory_space=pltpu.VMEM)
    fixed = lambda g, b: (0, 0)  # noqa: E731
    call = pl.pallas_call(
        _stage_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 2 * ND, ND), lambda g, b: (g, 0, 0),
                         memory_space=pltpu.VMEM),
            data_spec,
            data_spec,
            pl.BlockSpec((ND, ND), fixed, memory_space=pltpu.VMEM),
            pl.BlockSpec((2 * ND, ND), fixed, memory_space=pltpu.VMEM),
            pl.BlockSpec((ND, 1), fixed, memory_space=pltpu.VMEM),
        ],
        out_specs=(data_spec, data_spec),
        out_shape=(jax.ShapeDtypeStruct((m2, ND, B), jnp.uint32),
                   jax.ShapeDtypeStruct((m2, ND, B), jnp.uint32)),
        interpret=interpret,
    )
    return jax.jit(call)


def butterfly_stage(u, t, mats8, mod: mont.Modulus, bt: int = 512,
                    interpret: bool | None = None):
    """u, t: (m2, 32, B) u32 canonical digits; mats8: (m2, 64, 32)
    Toeplitz stack (any real dtype; cast to bf16). Returns (hi, lo) =
    (u + tw*t, u - tw*t) as canonical digits."""
    m2, nd, B = u.shape
    assert nd == ND
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    bt = min(bt, B)
    while B % bt:
        bt >>= 1
    fn = _stage_call(m2, B, bt, interpret)
    tables = _mod_tables(mod)
    return fn(jnp.asarray(mats8, dtype=jnp.bfloat16), u, t,
              *(jnp.asarray(z) for z in tables))


# --- full-encode driver (constant-geometry dataflow) ------------------------

@lru_cache(maxsize=None)
def _cg_step_call(m2: int, G: int, C: int, bt: int, interpret: bool):
    """Stage kernel + the cg boundary (slice/concat) in one executable."""
    call = _stage_call(m2, G * C, bt, interpret)

    def step(mats, u, t, t0, t1, t2):
        u3 = u.reshape(m2, ND, G * C)
        t3 = t.reshape(m2, ND, G * C)
        hi, lo = call(mats, u3, t3, t0, t1, t2)
        hi = hi.reshape(m2, ND, G, C)
        lo = lo.reshape(m2, ND, G, C)
        if G == 1:
            return jnp.concatenate([hi, lo], axis=0)
        h = G // 2
        return (jnp.concatenate([hi[:, :, :h], lo[:, :, :h]], axis=0),
                jnp.concatenate([hi[:, :, h:], lo[:, :, h:]], axis=0))
    return jax.jit(step)


def cg_step(u, t, mats8, mod: mont.Modulus, bt: int = 512,
            interpret: bool | None = None):
    """One cg stage (see mxu_cg): u, t (m2, 32, G, C) -> next (u, t),
    or the final (n, 32, 1, C) tensor when G == 1."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    m2, nd, G, C = u.shape
    assert nd == ND
    btr = min(bt, G * C)
    while (G * C) % btr:
        btr >>= 1
    fn = _cg_step_call(m2, G, C, btr, interpret)
    return fn(jnp.asarray(mats8, dtype=jnp.bfloat16), u, t,
              *(jnp.asarray(z) for z in _mod_tables(mod)))


def encode_stages_pallas(ctx, lane_mod: mont.Modulus, arr,
                         mats_list=None, bt: int = 512,
                         interpret: bool | None = None):
    """All CRebuild stages over an (n, C, 32) digit array (one lane):
    constant-geometry dataflow driven by the fused stage kernel. The
    fast path behind bench.py and the protocol's CRebuild."""
    from porla_tpu.ntt import mxu_cg
    if mats_list is None:
        mats_list = mxu_cg.stage_mats_list(ctx, lane_mod)
    u, t = mxu_cg.cg_prepare(jnp.asarray(arr), jnp)
    for s in range(1, ctx.height - 1):
        u, t = cg_step(u, t, mats_list[s - 1], lane_mod, bt, interpret)
    out = cg_step(u, t, mats_list[-1], lane_mod, bt, interpret)
    return jnp.moveaxis(out[:, :, 0, :], 1, 2)
