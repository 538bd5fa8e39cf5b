"""Constant-geometry MXU encode: the bf16 butterfly pipeline without
per-stage relayouts.

`mxu.encode_stage8` regroups the (n, C, 32) array around every stage
(u/t gather + hi/lo interleave) — two full-array relayouts per stage,
~40% of stage time on a v5e. This module removes them with a
constant-geometry dataflow:

- Stage s carries the state as two group-major tensors
  ``u, t : (m2, 32, G, C)`` (m2 = 2^(s-1) twiddle groups, G = n/2^s
  remaining block pairs, digit axis second so the minor dims stay
  (G, C) for the VPU lanes), with the G axis in *bit-reversed* block
  order.
- Stage s+1 pairs element j of even/odd block pairs with twiddle index
  j running over [0, m): with bit-reversed G order, "even blocks" are
  exactly the first half of the G axis, so the next stage's inputs are
  ``u' = concat(hi[:G/2], lo[:G/2])``, ``t' = concat(hi[G/2:], lo[G/2:])``
  — pure slices and concats, no transposes, and the twiddle tables stay
  in their natural j order.
- One gather at the start (pair split + bit-reversal of the pair axis)
  and one un-transpose at the end; everything between is matmuls and
  fusible elementwise carry chains.

Bit-exact twin of `engine.encode_stages` / `mxu.encode_stages_mxu`
(the reference stage loop, porla/Server/Server.hpp:1548-1687).
"""

from __future__ import annotations

import numpy as np

from porla_tpu.fields import mont
from porla_tpu.ntt import mxu
from porla_tpu.ntt.mxu import ND


def bitrev_perm(count: int) -> np.ndarray:
    """Bit-reversal permutation of [0, count); involution."""
    bits = count.bit_length() - 1
    out = np.zeros(count, dtype=np.int64)
    for g in range(count):
        v, r = g, 0
        for _ in range(bits):
            r = (r << 1) | (v & 1)
            v >>= 1
        out[g] = r
    return out


def cg_prepare(arr, xp=np):
    """(n, C, 32) canonical digits -> stage-1 inputs u, t (1, 32, n/2, C)
    with the pair axis bit-reversed. xp=jnp keeps it on device (static
    gather; no host round trip)."""
    n, C, nd = arr.shape
    assert nd == ND
    rev = bitrev_perm(n // 2)
    u = xp.moveaxis(arr[0::2], 2, 0)[:, rev, :][None]
    t = xp.moveaxis(arr[1::2], 2, 0)[:, rev, :][None]
    if xp is np:
        return np.ascontiguousarray(u), np.ascontiguousarray(t)
    return u, t


def cg_stage(xp, lane_mod: mont.Modulus, u, t, mats8):
    """One butterfly stage in constant-geometry form.

    u, t: (m2, 32, G, C); mats8: this stage's (m2, 64, 32) Toeplitz
    stack (natural twiddle order). Returns (u', t') for the next stage,
    or the final (n, 32, 1, C) tensor when G == 1."""
    m2, _, G, C = u.shape
    u3 = u.reshape(m2, ND, G * C)
    t3 = t.reshape(m2, ND, G * C)
    prod = mxu.mul_const_mont8(xp, t3, mats8, lane_mod)
    ud = xp.moveaxis(u3, 1, 0)
    pd = xp.moveaxis(prod, 1, 0)
    hi = xp.moveaxis(mxu.add_mod256(xp, ud, pd, lane_mod), 0, 1)
    lo = xp.moveaxis(mxu.sub_mod256(xp, ud, pd, lane_mod), 0, 1)
    hi = hi.reshape(m2, ND, G, C)
    lo = lo.reshape(m2, ND, G, C)
    if G == 1:
        return xp.concatenate([hi, lo], axis=0)
    h = G // 2
    u_next = xp.concatenate([hi[:, :, :h], lo[:, :, :h]], axis=0)
    t_next = xp.concatenate([hi[:, :, h:], lo[:, :, h:]], axis=0)
    return u_next, t_next


def cg_finalize(xp, out) -> np.ndarray:
    """(n, 32, 1, C) -> (n, C, 32) natural-order codeword digits."""
    return xp.moveaxis(out[:, :, 0, :], 1, 2)


def stage_mats_list(ctx, lane_mod: mont.Modulus) -> list[np.ndarray]:
    """Per-stage (m2, 64, 32) Toeplitz stacks, natural twiddle order."""
    return [mxu.stage_twiddle_mats8(ctx, lane_mod, 1 << (s - 1))
            for s in range(1, ctx.height)]


def encode_cg(xp, ctx, lane_mod: mont.Modulus, arr: np.ndarray,
              mats_list=None) -> np.ndarray:
    """All stages over an (n, C, 32) digit array (one lane), eager.
    For jitted deployment drive cg_stage per stage (see bench.py)."""
    if mats_list is None:
        mats_list = stage_mats_list(ctx, lane_mod)
    u, t = cg_prepare(np.asarray(arr))
    u, t = xp.asarray(u), xp.asarray(t)
    for s in range(1, ctx.height - 1):
        u, t = cg_stage(xp, lane_mod, u, t, xp.asarray(mats_list[s - 1]))
    out = cg_stage(xp, lane_mod, u, t, xp.asarray(mats_list[-1]))
    return cg_finalize(xp, out)
