"""Ablation profile of the Pippenger bucket kernel (v5e, device-resident).

Times the bucket-accumulate kernel with pieces ablated to locate the
per-grid-step cost (BENCH_NOTES round-3 breakdown: 1.29 s / 90112 steps
= 14.3 us/step at 2^20, c=6, bt=512). Variants:

  full        current _pip_kernel step (madd + nb-way select r/w)
  noselect    fixed bucket slot (madd only; isolates select cost)
  selonly     bucket select read/write with new = cur (no field math)
  muls N      kernel doing N chained _f_mul on the tile (per-mul cost)
  convonly N  N chained conv+fold-truncate (no resolve/REDC; UNSOUND,
              timing only)

Usage: PYTHONPATH=... python examples/profile_msm_kernel.py
"""
from __future__ import annotations

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
from porla_tpu.fields import limbs as L
from porla_tpu.ntt.mxu import ND
from porla_tpu.ntt.pallas_stage import _fold, _resolve, _sub_mod

BT = 512
NB = 32
NWIN = 8          # scaled-down window count: per-step cost is window-free
STEPS = 256


# local copies of the round-3 output-block bucket select (the production
# kernel moved to scratch-resident buckets, _scratch_read/_scratch_write)
def _bucket_read(ox, oy, oz, slot, nb):
    out = []
    for buf in (ox, oy, oz):
        acc = jnp.zeros_like(buf[0, 0])
        for s in range(1, nb + 1):
            acc = acc | jnp.where(slot == s, buf[0, s - 1], np.uint32(0))
        out.append(acc)
    return tuple(out)


def _bucket_write(ox, oy, oz, slot, new, nb):
    for s in range(1, nb + 1):
        m = slot == s
        ox[0, s - 1] = jnp.where(m, new[0], ox[0, s - 1])
        oy[0, s - 1] = jnp.where(m, new[1], oy[0, s - 1])
        oz[0, s - 1] = jnp.where(m, new[2], oz[0, s - 1])


def timed(fn, args, label, steps_total):
    def barrier(out):
        # slice ON DEVICE first: fetching a full output block through the
        # ~89 MB/s tunnel would dominate the measurement
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


def _mk_kernel(body):
    def kern(px, py, dig, dx, dy, mN__r, mN_r, nd_r, rd_r, ox, oy, oz):
        body(px, py, dig, dx, dy,
             (mN__r[:], mN_r[:], nd_r[:], rd_r[:]), ox, oy, oz)
    return kern


def _call(body):
    pspec = pl.BlockSpec((1, ND, BT), lambda w, k: (k, 0, 0),
                         memory_space=pltpu.VMEM)
    dspec = pl.BlockSpec((1, 8, BT), lambda w, k: (w, k // 8, 0),
                         memory_space=pltpu.VMEM)
    bspec = pl.BlockSpec((NB, ND, 1), lambda w, k: (0, 0, 0),
                         memory_space=pltpu.VMEM)
    ospec = pl.BlockSpec((1, NB, ND, BT), lambda w, k: (w, 0, 0, 0),
                         memory_space=pltpu.VMEM)
    out = jax.ShapeDtypeStruct((NWIN, NB, ND, BT), jnp.uint32)
    return jax.jit(pl.pallas_call(
        _mk_kernel(body),
        grid=(NWIN, STEPS),
        in_specs=[pspec] * 2 + [dspec] + [bspec] * 2 + pc._table_specs(),
        out_specs=(ospec,) * 3,
        out_shape=(out,) * 3,
    ))


def body_full(px, py, dig, dx, dy, tabs, ox, oy, oz):
    nd = tabs[2]
    k = pl.program_id(1)
    zero = px[0] & np.uint32(0)

    @pl.when(k == 0)
    def _init():
        for s in range(NB):
            ox[0, s] = dx[s] + zero
            oy[0, s] = dy[s] + zero
            oz[0, s] = tabs[3] + zero

    v = pm._digit_row(dig[0], k)
    slot = (v & np.uint32(127)).astype(jnp.uint32)
    sgn = v >> 7
    cur = _bucket_read(ox, oy, oz, slot, NB)
    yneg = _sub_mod(zero, py[0], nd)
    ysel = jnp.where(sgn != 0, yneg, py[0])
    new = pc._p_madd_pure(cur, (px[0], ysel), tabs)
    _bucket_write(ox, oy, oz, slot, new, NB)


def body_noselect(px, py, dig, dx, dy, tabs, ox, oy, oz):
    nd = tabs[2]
    k = pl.program_id(1)
    zero = px[0] & np.uint32(0)

    @pl.when(k == 0)
    def _init():
        for s in range(NB):
            ox[0, s] = dx[s] + zero
            oy[0, s] = dy[s] + zero
            oz[0, s] = tabs[3] + zero

    v = pm._digit_row(dig[0], k)
    sgn = v >> 7
    cur = (ox[0, 0], oy[0, 0], oz[0, 0])
    yneg = _sub_mod(zero, py[0], nd)
    ysel = jnp.where(sgn != 0, yneg, py[0])
    new = pc._p_madd_pure(cur, (px[0], ysel), tabs)
    ox[0, 0], oy[0, 0], oz[0, 0] = new


def body_selonly(px, py, dig, dx, dy, tabs, ox, oy, oz):
    k = pl.program_id(1)
    zero = px[0] & np.uint32(0)

    @pl.when(k == 0)
    def _init():
        for s in range(NB):
            ox[0, s] = dx[s] + zero
            oy[0, s] = dy[s] + zero
            oz[0, s] = tabs[3] + zero

    v = pm._digit_row(dig[0], k)
    slot = (v & np.uint32(127)).astype(jnp.uint32)
    cur = _bucket_read(ox, oy, oz, slot, NB)
    new = (cur[0] ^ px[0], cur[1] ^ py[0], cur[2] ^ zero)
    _bucket_write(ox, oy, oz, slot, new, NB)


def body_muls(n_muls, px, py, dig, dx, dy, tabs, ox, oy, oz):
    k = pl.program_id(1)
    zero = px[0] & np.uint32(0)

    @pl.when(k == 0)
    def _init():
        for s in range(NB):
            ox[0, s] = dx[s] + zero
            oy[0, s] = dy[s] + zero
            oz[0, s] = tabs[3] + zero

    a = px[0]
    b = py[0]
    for _ in range(n_muls):
        a = pc._f_mul(a, b, tabs)
    ox[0, 0] = a


def body_convonly(n_muls, px, py, dig, dx, dy, tabs, ox, oy, oz):
    k = pl.program_id(1)
    zero = px[0] & np.uint32(0)

    @pl.when(k == 0)
    def _init():
        for s in range(NB):
            ox[0, s] = dx[s] + zero
            oy[0, s] = dy[s] + zero
            oz[0, s] = tabs[3] + zero

    a = px[0]
    b = py[0]
    for _ in range(n_muls):
        cols = pc._conv_columns(a, b)
        a = _fold(cols[:ND], ND) & np.uint32(0xFF)  # truncate: timing only
    ox[0, 0] = a


def main():
    ops = secp256k1()
    rng = np.random.default_rng(0)
    px = jnp.asarray(rng.integers(0, 256, (STEPS, ND, BT), np.uint32))
    py = jnp.asarray(rng.integers(0, 256, (STEPS, ND, BT), np.uint32))
    dig = jnp.asarray(
        rng.integers(1, NB, (NWIN, (STEPS + 7) // 8 * 8, BT), np.uint32)
        .reshape(NWIN, -1, BT))
    dx, dy, _ = pm._blinding(ops, NB)
    tabs = [jnp.asarray(t) for t in pc._curve_tables(ops.fp)]
    args = (px, py, dig, dx, dy, *tabs)
    total = NWIN * STEPS

    t_full = timed(_call(body_full), args, "full", total)
    t_nosel = timed(_call(body_noselect), args, "noselect", total)
    timed(_call(body_selonly), args, "selonly", total)
    t6 = timed(_call(partial(body_muls, 6)), args, "muls6", total)
    t11 = timed(_call(partial(body_muls, 11)), args, "muls11", total)
    timed(_call(partial(body_convonly, 11)), args, "convonly11", total)
    per_mul = (t11 - t6) / 5 / total
    print(f"\nper-mul: {per_mul*1e6:.2f} us; madd(11mul) model: "
          f"{11*per_mul*1e6:.2f} us; select overhead: "
          f"{(t_full-t_nosel)/total*1e6:.2f} us/step")


if __name__ == "__main__":
    main()
