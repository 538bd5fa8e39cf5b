"""Multi-chip scaling shapes: per-tier timings at 1/4/8 virtual devices.

Records MULTICHIP_r04's scaling table: the distributed NTT, the sharded
MAC point stage, and the DP MSMs (windowed 32-bit and per-shard
Pippenger 256-bit) timed at nd = 1, 4, 8 virtual CPU devices. CPU
timings are SHAPE-level evidence (collective layouts compile + execute
and the work splits across shards) — ICI-speed measurements need a
real pod slice; see BENCH_NOTES.

Run:
  env JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      PYTHONPATH=/root/repo python examples/bench_multichip.py \
      --json MULTICHIP_r04_scaling.json
"""

from __future__ import annotations

import argparse
import json
import os
import time

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.jax_cache"))


def _timed(fn, *args, reps=3):
    import jax
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        jax.block_until_ready(fn(*args))
    return (time.perf_counter() - t0) / reps


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=4096,
                    help="NTT block count")
    ap.add_argument("--npts", type=int, default=2048,
                    help="MSM point count")
    ap.add_argument("--json", default=None)
    args = ap.parse_args()

    import jax
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    import jax.numpy as jnp
    import numpy as np

    from porla_tpu.curves.instances import secp256k1
    from porla_tpu.curves.weierstrass import JacPoint
    from porla_tpu.fields import limbs
    from porla_tpu.golden import ecc
    from porla_tpu.ntt.engine import _MOD_P, NttContext
    from porla_tpu.parallel import sharded

    ops = secp256k1()
    ctx = NttContext(args.n, "ipa")
    rng = np.random.default_rng(5)
    arr = rng.integers(0, 1 << 16, (args.n, 8, 16), dtype=np.uint32)
    tables = [np.asarray(t) for t in
              sharded.stage_twiddle_tables(ctx, _MOD_P)]
    tables_std = [np.asarray(t) for t in
                  sharded.stage_twiddle_tables_std(ctx)]

    base = [ecc.mul(ecc.SECP256K1, ecc.SECP256K1.g, int(k) + 2)
            for k in rng.integers(1, 1 << 20, 8)]
    pts_aff = [base[i % 8] for i in range(args.npts)]
    pts = ops.from_affine(np, pts_aff)
    ks = [int.from_bytes(rng.bytes(32), "little") % ecc.SECP256K1.n
          for _ in range(args.npts)]
    sc256 = limbs.ints_to_limbs(ks)
    sc32 = limbs.ints_to_limbs([k & 0xFFFFFFFF for k in ks])
    want256 = ecc.msm(ecc.SECP256K1, pts_aff,
                      [k % ecc.SECP256K1.n for k in ks])

    results = {"n": args.n, "npts": args.npts, "tiers": {}}
    for nd in (1, 4, 8):
        if nd > len(jax.devices()):
            continue
        mesh = sharded.make_mesh(jax.devices()[:nd], tp=1)
        stage = lambda a: sharded.stage(mesh, jnp.asarray(a),  # noqa: E731
                                        jax.sharding.PartitionSpec("blocks"))
        tier = {}

        enc = sharded.sharded_encode_fn(ctx, mesh, _MOD_P)
        ta = stage(arr)
        tt = [stage(t) for t in tables]
        tier["ntt_s"] = round(_timed(enc, ta, *tt), 4)

        pt_fns = sharded.sharded_point_stage_fn(ctx, mesh, ops, nbits=32)
        s = ctx.height - 1              # widest exchange stage
        px = stage(np.tile(pts.x, (args.n // args.npts or 1, 1))[:args.n])
        py = stage(np.tile(pts.y, (args.n // args.npts or 1, 1))[:args.n])
        pz = stage(np.tile(pts.z, (args.n // args.npts or 1, 1))[:args.n])
        tws = stage(tables_std[s - 1])
        tier["point_stage_s"] = round(_timed(pt_fns[s], px, py, pz, tws), 4)

        msm32 = sharded.sharded_msm_fn(mesh, nbits=32, ops=ops)
        mx, my, mz = stage(pts.x), stage(pts.y), stage(pts.z)
        tier["msm32_windowed_s"] = round(
            _timed(msm32, mx, my, mz, stage(sc32)), 4)

        fn, finish = sharded.sharded_pippenger_msm_fn(
            mesh, ops, nbits=256, n_local=args.npts // nd)
        out = finish(*fn(mx, my, mz, stage(sc256)))
        assert ops.to_affine(out)[0] == want256, "sharded MSM mismatch"
        tier["msm256_pippenger_s"] = round(
            _timed(lambda *a: fn(*a), mx, my, mz, stage(sc256)), 4)

        results["tiers"][str(nd)] = tier
        print(f"nd={nd}: {tier}", flush=True)

    one = results["tiers"].get("1")
    if one and "8" in results["tiers"]:
        eight = results["tiers"]["8"]
        results["scaling_8dev"] = {
            k: round(one[k] / (8 * eight[k]), 3)
            for k in one if eight.get(k)}
        print("8-device scaling efficiency (ideal=1.0):",
              results["scaling_8dev"], flush=True)
    if args.json:
        with open(args.json, "w") as f:
            json.dump(results, f, indent=1)
        print("wrote", args.json)


if __name__ == "__main__":
    main()
