"""Pippenger bucket MSM as a fused Pallas kernel.

TPU-native equivalent of libsecp256k1's Pippenger multi-scalar
multiplication (reference porla/Utils/secp256k1_lib/src/ecmult_impl.h:
646-722 pippenger_batch, :814-861 ecmult_multi_var). The CPU algorithm's
data-dependent bucket scatter becomes a lane-parallel select-accumulate:

- Lanes are independent accumulators. The N points are laid out as
  (steps, bt) lane tiles; each lane sweeps its `steps` points serially.
- Per 4-bit window w (grid dim), every lane keeps its own 16 Jacobian
  buckets in VMEM scratch. One step = ONE batched point add into the
  digit-selected bucket (16-way branchless select for read and
  writeback) — the Pippenger invariant of one group-op per
  (point, window) pair, at bt-lane width.
- On a window's last step the buckets fold via the standard suffix-run
  trick (sum_d d*B_d = sum of suffix sums, 30 adds) into one point per
  (window, lane).
- The (nwin, bt) partial grid then reduces in ONE jitted XLA graph:
  log2(bt) lane-halving adds + MSB-first Horner over windows
  (4 doublings + 1 add each).

Cost model vs the windowed double-and-add MSM (kernels.msm): Pippenger
does (N/bt + 30) batched point-ops per window against (N/bt) * 5 for
windowed — it wins once N/bt >> 30, i.e. big-N MSMs (the BASELINE.json
2^20 configs), and loses on the protocol's small audit combines (which
stay on kernels.msm).
"""

from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from porla_tpu.curves import pallas_curve as pc
from porla_tpu.curves.weierstrass import CurveOps, JacPoint
from porla_tpu.fields import limbs as L
from porla_tpu.ntt import mxu
from porla_tpu.ntt.mxu import ND


def _bucket_sel(bx, by, bz, digit):
    """Branchless 16-way bucket read; digit (1, bt)."""
    out = []
    for buf in (bx, by, bz):
        acc = jnp.zeros_like(buf[0])
        for d in range(16):
            acc = acc | jnp.where(digit == np.uint32(d), buf[d],
                                  np.uint32(0))
        out.append(acc)
    return tuple(out)


def _pip_kernel(steps, px, py, pz, dig,
                mN__ref, mN_ref, nd_ref, rd_ref,
                ox, oy, oz, bx, by, bz):
    k = pl.program_id(1)
    tabs = (mN__ref[:], mN_ref[:], nd_ref[:], rd_ref[:])
    rd = tabs[3]
    zero = px[0] & np.uint32(0)                # (ND, bt)
    inf = (rd + zero, rd + zero, zero)

    @pl.when(k == 0)
    def _init():
        for d in range(16):
            bx[d], by[d], bz[d] = inf

    pt = (px[0], py[0], pz[0])
    # dig block holds 8 digit rows (k//8 block index); row k%8 is selected
    # with a branchless iota mask-sum — Mosaic supports neither (1,1,bt)
    # blocks (tiling rule) nor dynamic sublane slices (compiler assert)
    sub = dig[0].astype(jnp.int32)            # (8, bt); Mosaic has no
    rowid = jax.lax.broadcasted_iota(jnp.int32, sub.shape, 0)  # u32 sums
    digit = jnp.sum(jnp.where(rowid == k % 8, sub, 0),
                    axis=0)[None].astype(jnp.uint32)           # (1, bt)
    cur = _bucket_sel(bx[:], by[:], bz[:], digit)
    new = pc._p_add(cur, pt, tabs)            # ONE add per (point, window)
    for d in range(1, 16):                    # digit 0 -> discard
        m = digit == np.uint32(d)
        bx[d] = jnp.where(m, new[0], bx[d])
        by[d] = jnp.where(m, new[1], by[d])
        bz[d] = jnp.where(m, new[2], bz[d])

    @pl.when(k == steps - 1)
    def _flush():
        # emit the raw buckets; the suffix-run fold (sum_d d*B_d,
        # ecmult_impl.h:700-714) runs in the jitted XLA reduce — 30
        # chained in-kernel point adds made the Mosaic program
        # pathologically large to compile
        ox[0], oy[0], oz[0] = bx[:], by[:], bz[:]


@lru_cache(maxsize=None)
def _pip_call(nwin: int, steps: int, bt: int, interpret: bool):
    pspec = pl.BlockSpec((1, ND, bt), lambda w, k: (k, 0, 0),
                         memory_space=pltpu.VMEM)
    dspec = pl.BlockSpec((1, 8, bt), lambda w, k: (w, k // 8, 0),
                         memory_space=pltpu.VMEM)
    ospec = pl.BlockSpec((1, 16, ND, bt), lambda w, k: (w, 0, 0, 0),
                         memory_space=pltpu.VMEM)
    out = jax.ShapeDtypeStruct((nwin, 16, ND, bt), jnp.uint32)
    scratch = [pltpu.VMEM((16, ND, bt), jnp.uint32)] * 3
    return jax.jit(pl.pallas_call(
        partial(_pip_kernel, steps),
        grid=(nwin, steps),
        in_specs=[pspec] * 3 + [dspec] + pc._table_specs(),
        out_specs=(ospec,) * 3,
        out_shape=(out,) * 3,
        scratch_shapes=scratch,
        interpret=interpret,
    ))


@lru_cache(maxsize=None)
def _reduce_fn(ops: CurveOps, nwin: int, bt: int):
    """(nwin, 16, bt, 16) limb bucket grid -> (1, 16) total, one jitted
    graph: suffix-run bucket fold (sum_d d*B_d, ecmult_impl.h:700-714),
    lane halving, then MSB-first Horner over the 4-bit windows."""
    from jax import lax

    @jax.jit
    def f(x, y, z):
        # bucket fold: run/acc suffix accumulation over d = 15..1,
        # batched over (nwin, bt) lanes. fori_loop: the point-add body is
        # traced ONCE (an unrolled 30-add chain of limb graphs made XLA
        # compile time pathological)
        def bucket_body(i, carry):
            rx, ry, rz, ax, ay, az = carry
            d = 14 - i
            b = JacPoint(lax.dynamic_index_in_dim(x, d, 1, False),
                         lax.dynamic_index_in_dim(y, d, 1, False),
                         lax.dynamic_index_in_dim(z, d, 1, False))
            run = ops.add(jnp, JacPoint(rx, ry, rz), b)
            acc = ops.add(jnp, JacPoint(ax, ay, az), run)
            return (*run, *acc)

        run0 = (x[:, 15], y[:, 15], z[:, 15])
        st = lax.fori_loop(0, 14, bucket_body, (*run0, *run0))
        p = JacPoint(st[3], st[4], st[5])

        w = bt
        while w > 1:
            w //= 2
            p = ops.add(jnp, JacPoint(p.x[:, :w], p.y[:, :w], p.z[:, :w]),
                        JacPoint(p.x[:, w:2 * w], p.y[:, w:2 * w],
                                 p.z[:, w:2 * w]))
        # MSB-first Horner over windows, fori_loop again
        def horner_body(i, carry):
            wi = nwin - 2 - i
            acc = JacPoint(*carry)
            for _ in range(4):
                acc = ops.double(jnp, acc)
            b = JacPoint(lax.dynamic_index_in_dim(p.x, wi, 0, False),
                         lax.dynamic_index_in_dim(p.y, wi, 0, False),
                         lax.dynamic_index_in_dim(p.z, wi, 0, False))
            return tuple(ops.add(jnp, acc, b))

        acc = lax.fori_loop(
            0, nwin - 1, horner_body,
            (p.x[nwin - 1], p.y[nwin - 1], p.z[nwin - 1]))
        return acc
    return f


def pippenger_msm(ops: CurveOps, points: JacPoint, scalars,
                  nbits: int = 256, bt: int = 512,
                  interpret: bool | None = None) -> JacPoint:
    """sum_i scalars[i] * points[i] -> JacPoint (1,).

    points: (N, 16) limb JacPoint (Montgomery); scalars: (N, 16)
    standard-form limbs, < 2^nbits. Pads N with (infinity, 0) lanes."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    N = points.x.shape[0]
    bt = min(bt, max(128, -(-N // 128) * 128))
    steps = -(-N // bt)
    npad = steps * bt
    nwin = nbits // 4

    # (steps, ND, bt) digit tiles per coordinate, infinity padding
    def prep(c, fill):
        c = pc._pad_to(np.asarray(c), npad)
        if fill is not None and npad > N:
            c[N:] = fill
        d = np.asarray(mxu.digits_from_limbs(np, c))   # (npad, 32)
        return jnp.asarray(np.ascontiguousarray(
            d.reshape(steps, bt, ND).transpose(0, 2, 1)))

    rd_limbs = L.ints_to_limbs([ops.fp.r % ops.fp.n])[0]
    px = prep(points.x, rd_limbs)
    py = prep(points.y, rd_limbs)
    pz = prep(points.z, None)                          # zero pad = infinity

    # (nwin, steps8, bt) LSB-first 4-bit windows; the steps axis is padded
    # to a multiple of 8 for the (1, 8, bt) digit blocks (padding rows are
    # never visited — the grid stops at `steps`)
    sd = np.asarray(mxu.digits_from_limbs(np, pc._pad_to(
        np.asarray(scalars, np.uint32), npad)))        # (npad, 32)
    dig = np.empty((nwin, npad), np.uint32)
    for w in range(nwin):
        byte = sd[:, w // 2]
        dig[w] = (byte >> 4) & 0xF if w % 2 else byte & 0xF
    steps8 = -(-steps // 8) * 8
    dig3 = np.zeros((nwin, steps8, bt), np.uint32)
    dig3[:, :steps] = dig.reshape(nwin, steps, bt)
    dig = jnp.asarray(dig3)

    fn = _pip_call(nwin, steps, bt, interpret)
    tabs = pc._curve_tables(ops.fp)
    sx, sy, sz = fn(px, py, pz, dig, *(jnp.asarray(t) for t in tabs))

    # (nwin, 16, ND, bt) digit tiles -> (nwin, 16, bt, 16) limbs, then
    # the jitted bucket-fold + reduce
    lx = mxu.limbs_from_digits(jnp, jnp.moveaxis(sx, 2, 3))
    ly = mxu.limbs_from_digits(jnp, jnp.moveaxis(sy, 2, 3))
    lz = mxu.limbs_from_digits(jnp, jnp.moveaxis(sz, 2, 3))
    x, y, z = _reduce_fn(ops, nwin, bt)(lx, ly, lz)
    return JacPoint(x[None], y[None], z[None])
