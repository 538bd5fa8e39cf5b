"""GLV-split Pippenger window-shape experiment (kernel-phase timing).

VERDICT r3 proposed GLV-splitting the Pippenger pipeline: 256-bit
scalars decompose as k1 + lam*k2 with |ki| < 2^128, turning an N-point
44-window problem into a 2N-point 23-window one (c=6). The bucket-add
work is nwin * npoints: 44N vs 46N — the model says ~neutral, with the
only real saving in per-window fixed costs (fold + boundary DMA).
This script MEASURES the two shapes on the actual v3 kernels with
identical per-step work, settling the question with data instead of
the model. (Full GLV integration would also need a device-side
decomposition — k*b2/det high-product rounding — and an on-device
phi(P) = (beta*x, y) map; only worth building if this wins.)
"""
from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

from porla_tpu.curves import pallas_curve as pc
from porla_tpu.curves import pallas_msm as pm
from porla_tpu.curves.instances import bn254

BT = 512
NB = 32


def run_shape(label, ops, nwin, steps):
    friendly = pc._mont_friendly(ops.fp)
    tabs = [jnp.asarray(t) for t in pc._curve_tables2(ops.fp)]
    dx, dy, _ = pm._blinding(ops, NB)
    rng = np.random.default_rng(0)
    px = jnp.asarray(rng.integers(0, 256, (steps, 32, BT), np.uint32))
    py = jnp.asarray(rng.integers(0, 256, (steps, 32, BT), np.uint32))
    steps8 = -(-steps // 8) * 8
    dig = jnp.asarray(rng.integers(1, NB, (nwin, steps8, BT), np.uint32))
    kern = pm._pip_call(nwin, steps, BT, NB, True, False, friendly, False)
    fold = pm._fold_call(nwin, BT, NB, friendly, False)

    def run():
        bufs = kern(px, py, dig, dx, dy, *tabs)
        f = fold(*bufs, *tabs)
        _ = np.asarray(f[0][0, 0, :1])

    run()
    t0 = time.perf_counter()
    for _ in range(3):
        run()
    dt = (time.perf_counter() - t0) / 3
    print(f"{label}: nwin={nwin} steps={steps} -> {dt*1e3:.1f} ms "
          f"({dt/(nwin*steps)*1e6:.2f} us/step)")
    return dt


def main():
    ops = bn254()
    n_points = 1 << 20
    steps = n_points // BT
    t_plain = run_shape("plain 256-bit", ops, 44, steps)
    t_glv = run_shape("glv 2x128-bit", ops, 23, 2 * steps)
    print(f"GLV kernel-phase ratio: {t_plain/t_glv:.3f}x "
          f"({'wins' if t_glv < t_plain else 'loses'} at equal "
          f"per-step cost; decomposition/phi prep not included)")


if __name__ == "__main__":
    main()
