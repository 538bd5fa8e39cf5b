"""Big-N variable-base MSM benchmark: Pippenger bucket kernel vs the
windowed double-and-add path, with an exact correctness check.

Points are a small set of distinct bases tiled to N lanes, so the golden
value is sum_g (sum of g's scalars) * P_g — checkable in milliseconds at
any N.

Run:
  env PYTHONPATH=/root/repo:/root/.axon_site \
    JAX_COMPILATION_CACHE_DIR=/root/.jax_cache \
    python examples/bench_msm.py --n 131072
"""

from __future__ import annotations

import argparse
import os
import random
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.jax_cache"))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1 << 17)
    ap.add_argument("--nbits", type=int, default=256)
    ap.add_argument("--bases", type=int, default=8)
    ap.add_argument("--windowed", action="store_true",
                    help="also time the windowed double-and-add MSM")
    ap.add_argument("--curve", choices=["secp256k1", "bn254"],
                    default="secp256k1")
    args = ap.parse_args()

    import jax
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    import numpy as np

    from porla_tpu.curves import kernels as ck
    from porla_tpu.curves import pallas_msm
    from porla_tpu.curves.instances import bn254, secp256k1
    from porla_tpu.fields import limbs as L
    from porla_tpu.golden import ecc

    rng = random.Random(7)
    ops = secp256k1() if args.curve == "secp256k1" else bn254()
    cur = ops.curve

    bases = [ecc.mul(cur, cur.g, rng.randrange(1, cur.n))
             for _ in range(args.bases)]
    sc = [rng.getrandbits(args.nbits) % cur.n for _ in range(args.n)]
    pts_host = ops.from_affine(np, bases)
    reps = args.n // args.bases
    points = type(pts_host)(np.tile(pts_host.x, (reps, 1)),
                            np.tile(pts_host.y, (reps, 1)),
                            np.tile(pts_host.z, (reps, 1)))
    sc_limbs = L.ints_to_limbs(sc)

    want = ecc.INF
    for g in range(args.bases):
        total = sum(sc[g::args.bases]) % cur.n
        want = ecc.add(cur, want, ecc.mul(cur, bases[g], total))

    def run_pip():
        out = pallas_msm.pippenger_msm(ops, points, sc_limbs,
                                       nbits=args.nbits)
        return ops.to_affine(ck.to_host(out))[0]

    t0 = time.perf_counter()
    got = run_pip()
    t_cold = time.perf_counter() - t0
    assert got == want, "pippenger mismatch vs golden"
    print(f"pippenger N={args.n}: cold {t_cold:.2f}s (compile+run), "
          f"correct", flush=True)

    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        run_pip()
        times.append(time.perf_counter() - t0)
    t = min(times)
    print(f"pippenger N={args.n}: warm {t:.3f}s = {args.n / t:.3e} pts/s")

    if args.windowed:
        def run_win():
            out = ck.msm(ops, ck.to_device(points), sc_limbs,
                         nbits=args.nbits)
            return ops.to_affine(ck.to_host(out))[0]
        t0 = time.perf_counter()
        got = run_win()
        print(f"windowed  N={args.n}: cold {time.perf_counter()-t0:.2f}s, "
              f"{'correct' if got == want else 'MISMATCH'}")
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            run_win()
            times.append(time.perf_counter() - t0)
        t = min(times)
        print(f"windowed  N={args.n}: warm {t:.3f}s = "
              f"{args.n / t:.3e} pts/s")


if __name__ == "__main__":
    main()
