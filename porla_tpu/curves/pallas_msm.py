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
    call = pl.pallas_call(
        partial(_pip_kernel, steps),
        grid=(nwin, steps),
        in_specs=[pspec] * 3 + [dspec] + pc._table_specs(),
        out_specs=(ospec,) * 3,
        out_shape=(out,) * 3,
        scratch_shapes=scratch,
        interpret=interpret,
    )

    # operands are byte digits: ship them host->HBM as u8 (4x less
    # tunnel/PCIe traffic at 2^20) and widen on device
    @jax.jit
    def f(px8, py8, pz8, dig8, *tabs):
        return call(px8.astype(jnp.uint32), py8.astype(jnp.uint32),
                    pz8.astype(jnp.uint32), dig8.astype(jnp.uint32),
                    *tabs)
    return f


def _fold_kernel(px, py, pz, mN__ref, mN_ref, nd_ref, rd_ref,
                 ox, oy, oz, rx, ry, rz, ax, ay, az):
    """Suffix-run bucket fold sum_d d*B_d (ecmult_impl.h:700-714) as its
    own tiny Pallas kernel: grid (nwin, 15) walks d = 15..1 with TWO
    point-add instances in the program (run += B_d; acc += run) — an
    unrolled in-kernel chain or an XLA limb-path fold are 10-40x slower
    to compile / execute respectively."""
    k = pl.program_id(1)
    tabs = (mN__ref[:], mN_ref[:], nd_ref[:], rd_ref[:])
    tile = (px[0, 0], py[0, 0], pz[0, 0])

    @pl.when(k == 0)
    def _init():
        rx[...], ry[...], rz[...] = tile
        ax[...], ay[...], az[...] = tile

    @pl.when(k > 0)
    def _step():
        run = pc._p_add((rx[...], ry[...], rz[...]), tile, tabs)
        rx[...], ry[...], rz[...] = run
        acc = pc._p_add((ax[...], ay[...], az[...]), run, tabs)
        ax[...], ay[...], az[...] = acc

    @pl.when(k == 14)
    def _out():
        ox[0], oy[0], oz[0] = ax[...], ay[...], az[...]


@lru_cache(maxsize=None)
def _fold_call(nwin: int, bt: int, interpret: bool):
    bspec = pl.BlockSpec((1, 1, ND, bt), lambda w, k: (w, 15 - k, 0, 0),
                         memory_space=pltpu.VMEM)
    ospec = pl.BlockSpec((1, ND, bt), lambda w, k: (w, 0, 0),
                         memory_space=pltpu.VMEM)
    out = jax.ShapeDtypeStruct((nwin, ND, bt), jnp.uint32)
    scratch = [pltpu.VMEM((ND, bt), jnp.uint32)] * 6
    return jax.jit(pl.pallas_call(
        _fold_kernel,
        grid=(nwin, 15),
        in_specs=[bspec] * 3 + pc._table_specs(),
        out_specs=(ospec,) * 3,
        out_shape=(out,) * 3,
        scratch_shapes=scratch,
        interpret=interpret,
    ))


@lru_cache(maxsize=None)
def _reduce_fn(ops: CurveOps, nwin: int, bt: int):
    """(nwin, bt, 16) folded per-window lane partials -> (nwin, 16)
    window totals: log2(bt) lane-halving adds."""
    @jax.jit
    def f(x, y, z):
        p = JacPoint(x, y, z)
        w = bt
        while w > 1:
            w //= 2
            p = ops.add(jnp, JacPoint(p.x[:, :w], p.y[:, :w], p.z[:, :w]),
                        JacPoint(p.x[:, w:2 * w], p.y[:, w:2 * w],
                                 p.z[:, w:2 * w]))
        # per-window totals; the 4-bit Horner over windows runs on the
        # HOST (chained tiny point ops on (1,16) tensors cost ~35 ms
        # each as a device loop — seconds of fixed latency vs ~10 ms of
        # exact host bigint arithmetic)
        return p.x[:, 0], p.y[:, 0], p.z[:, 0]
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

    # (steps, ND, bt) digit tiles per coordinate, infinity padding,
    # shipped as u8
    def prep(c, fill):
        c = pc._pad_to(np.asarray(c), npad)
        if fill is not None and npad > N:
            c[N:] = fill
        d = np.asarray(mxu.digits_from_limbs(np, c)).astype(np.uint8)
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
    dig = np.empty((nwin, npad), np.uint8)
    for w in range(nwin):
        byte = sd[:, w // 2].astype(np.uint8)
        dig[w] = (byte >> 4) & 0xF if w % 2 else byte & 0xF
    steps8 = -(-steps // 8) * 8
    if steps8 == steps:
        dig3 = dig.reshape(nwin, steps, bt)
    else:
        dig3 = np.zeros((nwin, steps8, bt), np.uint8)
        dig3[:, :steps] = dig.reshape(nwin, steps, bt)
    dig = jnp.asarray(dig3)

    fn = _pip_call(nwin, steps, bt, interpret)
    tabs = pc._curve_tables(ops.fp)
    sx, sy, sz = fn(px, py, pz, dig, *(jnp.asarray(t) for t in tabs))

    # Pallas suffix-run bucket fold, then limb decode + lane halving
    fx, fy, fz = _fold_call(nwin, bt, interpret)(
        sx, sy, sz, *(jnp.asarray(t) for t in tabs))
    lx = mxu.limbs_from_digits(jnp, jnp.moveaxis(fx, 1, 2))
    ly = mxu.limbs_from_digits(jnp, jnp.moveaxis(fy, 1, 2))
    lz = mxu.limbs_from_digits(jnp, jnp.moveaxis(fz, 1, 2))
    wx, wy, wz = _reduce_fn(ops, nwin, bt)(lx, ly, lz)

    # host Horner: total = sum_w 16^w * W_w (MSB-first, exact bigints)
    from porla_tpu.curves import kernels as ck
    from porla_tpu.golden import ecc
    host = ck.fetch_many([wx, wy, wz])
    wins = ops.to_affine(JacPoint(*host))
    cv = ops.curve
    acc = wins[nwin - 1]
    for wi in range(nwin - 2, -1, -1):
        acc = ecc.add(cv, ecc.mul(cv, acc, 16), wins[wi])
    out = ops.from_affine(np, [acc])
    return JacPoint(np.asarray(out.x), np.asarray(out.y),
                    np.asarray(out.z))
