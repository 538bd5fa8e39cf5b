"""Ablation profile of the PRODUCTION (v4) Pippenger bucket kernel:
u8 scratch-resident buckets + v2 field core, on-device timing.

Variants (all share the production specs/scratch layout):

  full        the production step (_digit_row + u8 select r/w + madd2)
  noselect    fixed bucket slot (madd2 only; isolates select cost)
  selonly     u8 select read/write with new = cur ^ pt (no field math)
  muls N      N chained _f_mul2 on the tile (per-mul cost, v2 core)
  unroll2     TWO production steps per grid step (operand block spans
              2 point tiles) — amortizes per-grid-step fixed cost

Usage: PYTHONPATH=... python examples/profile_msm_kernel.py [--nb 64]
"""
from __future__ import annotations

import argparse
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from porla_tpu.curves import pallas_curve as pc
from porla_tpu.curves import pallas_msm as pm
from porla_tpu.curves.instances import secp256k1
from porla_tpu.ntt.mxu import ND
from porla_tpu.ntt.pallas_stage import _sub_mod

BT = 512
NWIN = 8          # scaled-down window count: per-step cost is window-free
STEPS = 256


def timed(fn, args, label, steps_total):
    def barrier(out):
        leaf = jax.tree_util.tree_leaves(out)[0]
        _ = np.asarray(leaf[(0,) * (leaf.ndim - 1)][:1])

    barrier(fn(*args))
    t0 = time.perf_counter()
    reps = 3
    for _ in range(reps):
        barrier(fn(*args))
    dt = (time.perf_counter() - t0) / reps
    print(f"{label:14s} {dt*1e3:8.1f} ms  {dt/steps_total*1e6:7.2f} us/step")
    return dt


def _call(body, nb, unroll=1):
    steps = STEPS // unroll
    pspec = pl.BlockSpec((unroll, ND, BT), lambda w, k: (k, 0, 0),
                         memory_space=pltpu.VMEM)
    dspec = pl.BlockSpec((1, 8, BT), lambda w, k: (w, k * unroll // 8, 0),
                         memory_space=pltpu.VMEM)
    bspec = pl.BlockSpec((nb, ND, 1), lambda w, k: (0, 0, 0),
                         memory_space=pltpu.VMEM)
    hspec = pl.BlockSpec(memory_space=pltpu.ANY)
    out = jax.ShapeDtypeStruct((NWIN, nb, ND, BT), jnp.uint8)

    def kern(px, py, dig, dx, dy, w__r, w_r, nd_r, rd_r, ox, oy, oz,
             sx, sy, sz, sems):
        tabs = (w__r[:], w_r[:], nd_r[:], rd_r[:])
        k = pl.program_id(1)
        zero = px[0] & np.uint32(0)

        @pl.when(k == 0)
        def _init():
            z8 = zero.astype(jnp.uint8)
            for s in range(nb):
                sx[s] = dx[s].astype(jnp.uint8) + z8
                sy[s] = dy[s].astype(jnp.uint8) + z8
                sz[s] = rd_r[:].astype(jnp.uint8) + z8

        body(px, py, dig, tabs, zero, sx, sy, sz, k)

        @pl.when(k == steps - 1)
        def _flush():
            w = pl.program_id(0)
            cx = pltpu.make_async_copy(sx, ox.at[w], sems.at[0])
            cy = pltpu.make_async_copy(sy, oy.at[w], sems.at[1])
            cz = pltpu.make_async_copy(sz, oz.at[w], sems.at[2])
            cx.start(); cy.start(); cz.start()  # noqa: E702
            cx.wait(); cy.wait(); cz.wait()  # noqa: E702

    return jax.jit(pl.pallas_call(
        kern,
        grid=(NWIN, steps),
        in_specs=[pspec] * 2 + [dspec] + [bspec] * 2 + pc._table_specs2(),
        out_specs=(hspec,) * 3,
        out_shape=(out,) * 3,
        scratch_shapes=[pltpu.VMEM((nb, ND, BT), jnp.uint8)] * 3
        + [pltpu.SemaphoreType.DMA((3,))],
    ))


def _step(px, py, dig, tabs, zero, sx, sy, sz, k, nb, u=0, unroll=1):
    nd = tabs[2]
    v = pm._digit_row(dig[0], k * unroll + u)
    slot = (v & (pm._SIGN - 1)).astype(jnp.uint32)
    sgn = v >> 8
    cur = pm._scratch_read(sx, sy, sz, slot, nb)
    yneg = _sub_mod(zero, py[u], nd)
    ysel = jnp.where(sgn != 0, yneg, py[u])
    new = pc._p_madd_pure2(cur, (px[u], ysel), tabs, False)
    pm._scratch_write(sx, sy, sz, slot, new, nb)


def body_full(nb, px, py, dig, tabs, zero, sx, sy, sz, k):
    _step(px, py, dig, tabs, zero, sx, sy, sz, k, nb)


def body_unroll2(nb, px, py, dig, tabs, zero, sx, sy, sz, k):
    _step(px, py, dig, tabs, zero, sx, sy, sz, k, nb, 0, 2)
    _step(px, py, dig, tabs, zero, sx, sy, sz, k, nb, 1, 2)


def body_noselect(nb, px, py, dig, tabs, zero, sx, sy, sz, k):
    nd = tabs[2]
    v = pm._digit_row(dig[0], k)
    sgn = v >> 8
    cur = (sx[0].astype(jnp.uint32), sy[0].astype(jnp.uint32),
           sz[0].astype(jnp.uint32))
    yneg = _sub_mod(zero, py[0], nd)
    ysel = jnp.where(sgn != 0, yneg, py[0])
    new = pc._p_madd_pure2(cur, (px[0], ysel), tabs, False)
    sx[0] = new[0].astype(jnp.uint8)
    sy[0] = new[1].astype(jnp.uint8)
    sz[0] = new[2].astype(jnp.uint8)


def body_selonly(nb, px, py, dig, tabs, zero, sx, sy, sz, k):
    v = pm._digit_row(dig[0], k)
    slot = (v & (pm._SIGN - 1)).astype(jnp.uint32)
    cur = pm._scratch_read(sx, sy, sz, slot, nb)
    new = (cur[0] ^ px[0], cur[1] ^ py[0], cur[2] ^ zero)
    pm._scratch_write(sx, sy, sz, slot, new, nb)


def body_muls(n_muls, nb, px, py, dig, tabs, zero, sx, sy, sz, k):
    a = px[0]
    b = py[0]
    for _ in range(n_muls):
        a = pc._f_mul2(a, b, tabs, False)
    sx[0] = a.astype(jnp.uint8)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nb", type=int, default=64)
    args = ap.parse_args()
    nb = args.nb

    ops = secp256k1()
    rng = np.random.default_rng(0)
    px = jnp.asarray(rng.integers(0, 256, (STEPS, ND, BT), np.uint32))
    py = jnp.asarray(rng.integers(0, 256, (STEPS, ND, BT), np.uint32))
    dig = jnp.asarray(
        rng.integers(1, nb, (NWIN, (STEPS + 7) // 8 * 8, BT), np.uint32)
        .reshape(NWIN, -1, BT))
    dx, dy, _ = pm._blinding(ops, nb)
    tabs = [jnp.asarray(t) for t in pc._curve_tables2(ops.fp)]
    args_ = (px, py, dig, dx, dy, *tabs)
    total = NWIN * STEPS

    t_full = timed(_call(partial(body_full, nb), nb), args_, "full", total)
    timed(_call(partial(body_unroll2, nb), nb, unroll=2), args_,
          "unroll2", total)
    t_nosel = timed(_call(partial(body_noselect, nb), nb), args_,
                    "noselect", total)
    timed(_call(partial(body_selonly, nb), nb), args_, "selonly", total)
    t6 = timed(_call(partial(body_muls, 6, nb), nb), args_, "muls6", total)
    t11 = timed(_call(partial(body_muls, 11, nb), nb), args_, "muls11",
                total)
    per_mul = (t11 - t6) / 5 / total
    print(f"\nper-mul: {per_mul*1e6:.2f} us; madd(11mul) model: "
          f"{11*per_mul*1e6:.2f} us; select overhead: "
          f"{(t_full-t_nosel)/total*1e6:.2f} us/step")


if __name__ == "__main__":
    main()
