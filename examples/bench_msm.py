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
    ap.add_argument("--c", type=int, default=None,
                    help="window width (default: choose_c policy)")
    ap.add_argument("--bt", type=int, default=None, help="lane tile width")
    ap.add_argument("--json", default=None,
                    help="append a JSON result line to this file")
    ap.add_argument("--device-resident", action="store_true",
                    help="stage operands in HBM before timing (the "
                    "protocol's MAC arrays live on device; also removes "
                    "this harness's ~89 MB/s host tunnel, which a real "
                    "TPU host's PCIe/DMA path would not impose)")
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

    affine = None
    if args.device_resident:
        import jax.numpy as jnp
        affine = True  # from_affine bases: z in {0, R}
        points = type(pts_host)(jnp.asarray(points.x),
                                jnp.asarray(points.y),
                                jnp.asarray(points.z))
        sc_limbs = jnp.asarray(sc_limbs)

    def run_pip():
        out = pallas_msm.pippenger_msm(ops, points, sc_limbs,
                                       nbits=args.nbits, c=args.c,
                                       bt=args.bt, affine=affine)
        return ops.to_affine(ck.to_host(out))[0]

    c_used = args.c or pallas_msm.choose_c(args.n, args.nbits)
    t0 = time.perf_counter()
    got = run_pip()
    t_cold = time.perf_counter() - t0
    assert got == want, "pippenger mismatch vs golden"
    print(f"pippenger N={args.n} c={c_used}: cold {t_cold:.2f}s "
          f"(compile+run), correct", flush=True)

    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        run_pip()
        times.append(time.perf_counter() - t0)
    t = min(times)
    print(f"pippenger N={args.n} c={c_used}: warm {t:.3f}s = "
          f"{args.n / t:.3e} pts/s")
    if args.json:
        import json
        rec = {"curve": args.curve, "n": args.n, "nbits": args.nbits,
               "c": c_used, "bt": args.bt, "warm_s": round(t, 4),
               "pts_per_s": round(args.n / t, 1),
               "device_resident": bool(args.device_resident)}
        with open(args.json, "a") as f:
            f.write(json.dumps(rec) + "\n")

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
