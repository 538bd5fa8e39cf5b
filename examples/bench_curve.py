"""Benchmark EC scalar-mul paths on the real chip: the XLA limb path
(weierstrass.scalar_mul) vs the fused Pallas kernel (pallas_curve).

Run: env PYTHONPATH=/root/repo:/root/.axon_site \
       JAX_COMPILATION_CACHE_DIR=/root/.jax_cache \
       python examples/bench_curve.py [--b 1024] [--nbits 256]
"""

from __future__ import annotations

import argparse
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.jax_cache"))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)


def fetch(x):
    return np.asarray(np.asarray(x).ravel()[:1])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--b", type=int, default=1024)
    ap.add_argument("--nbits", type=int, default=256)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--which", default="xla,pallas")
    ap.add_argument("--bt", type=int, default=256)
    args = ap.parse_args()

    import random

    from porla_tpu.curves import pallas_curve
    from porla_tpu.curves.instances import secp256k1
    from porla_tpu.fields import limbs as L
    from porla_tpu.golden import ecc

    rng = random.Random(1)
    ops = secp256k1()
    cur = ops.curve
    B = args.b
    # a few distinct points tiled to B (generation cost only)
    base = [ecc.mul(cur, cur.g, rng.randrange(1, cur.n)) for _ in range(8)]
    pts = [base[i % 8] for i in range(B)]
    p = ops.from_affine(np, pts)
    sc = L.ints_to_limbs([rng.getrandbits(args.nbits) for _ in range(B)])
    which = args.which.split(",")

    def run(name, fn):
        t0 = time.perf_counter()
        fn()
        compile_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        for _ in range(args.reps):
            fn()
        dt = (time.perf_counter() - t0) / args.reps
        print(f"{name:>8}: {dt*1e3:9.1f} ms  {B/dt:9.0f} pts/s  "
              f"(compile+warm {compile_s:.1f}s)")

    if "xla" in which:
        from porla_tpu.curves import kernels as ck
        pd = ck.to_device(p)
        scd = jnp.asarray(sc)
        smul = jax.jit(lambda pt, s: tuple(
            ops.scalar_mul(jnp, pt, s, args.nbits)))

        def run_xla():
            out = smul(pd, scd)
            fetch(out[0])
        run("xla", run_xla)

    if "pallas" in which:
        def run_pl():
            out = pallas_curve.scalar_mul(ops, p, sc, nbits=args.nbits,
                                          bt=args.bt)
            fetch(out.x)
        run("pallas", run_pl)

    if "fb" in which:
        # commitment-shaped workload: 128 fixed bases cycling over lanes
        t0 = time.perf_counter()
        tbl = pallas_curve.fb_table_for(
            ops, ops.from_affine(np, [base[i % 8] for i in range(128)]))
        print(f"      fb: table build {time.perf_counter()-t0:.1f}s")

        def run_fb():
            out = pallas_curve.fb_scalar_mul(tbl, sc)
            fetch(out.x)
        run("fb", run_fb)

    if "butterfly" in which:
        def run_bf():
            hi, lo = pallas_curve.point_butterfly(ops, p, p, sc,
                                                  nbits=args.nbits,
                                                  bt=args.bt)
            fetch(hi.x)
        run("butterfly", run_bf)


if __name__ == "__main__":
    main()
