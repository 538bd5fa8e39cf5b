"""Out-of-core CRebuild benchmark: the streamed disk tier at large n.

Drives the SERVER's streamed rebuild directly (no client traffic): seeds
n raw 4KB blocks in U/, then runs CRebuild_No_Cached-equivalent
streaming (porla_tpu/protocol/stream.py) — staging pass, log2(n)
butterfly stages per side through 512b staging files, alignment-commit +
256b finalize — recording wall time per phase and peak RSS. RAM holds at
most a stripe of the data plane (the point planes stay resident, like
the reference's MAC_commitments_H).

Correctness of the streamed path vs the in-RAM encode is covered by CI
(tests/test_disk_tier.py at small n, both schemes); this driver is the
scale/bounded-memory artifact (BASELINE config 4 territory).

  env PYTHONPATH=/root/repo:/root/.axon_site \
    JAX_COMPILATION_CACHE_DIR=/root/.jax_cache \
    python examples/bench_ooc.py --n 262144 --top 10 --out OOC_r02.json
"""

from __future__ import annotations

import argparse
import json
import os
import resource
import tempfile
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.jax_cache"))


def rss_gb() -> float:
    return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1 << 18)
    ap.add_argument("--top", type=int, default=10)
    ap.add_argument("--stripe", type=int, default=4096)
    ap.add_argument("--scheme", default="ipa")
    ap.add_argument("--mac", action="store_true",
                    help="include the MAC-mirror point stages (EC cost)")
    ap.add_argument("--out", default="OOC_r02.json")
    args = ap.parse_args()

    import jax
    import numpy as np

    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    from porla_tpu.config import BLOCK_SIZE, PorlaConfig
    from porla_tpu.protocol import stream
    from porla_tpu.protocol.server import PorlaServer
    from porla_tpu.protocol.hlog import Planes

    n = args.n
    cfg = PorlaConfig(scheme=args.scheme, top_caching_level=args.top,
                      stream_stripe_blocks=args.stripe,
                      storage_dir=tempfile.mkdtemp(prefix="porla_ooc_"))
    srv = PorlaServer(cfg)
    srv._setup(n)

    # seed U/ with random blocks, batched writes
    rng = np.random.default_rng(0)
    t0 = time.time()
    B = 4096
    for i0 in range(0, n, B):
        cnt = min(B, n - i0)
        blob = rng.integers(0, 256, cnt * BLOCK_SIZE, dtype=np.uint8)
        srv.store.write_blocks(range(i0, i0 + cnt), blob.tobytes())
    t_seed = time.time() - t0
    print(f"seeded {n} blocks ({n * BLOCK_SIZE / 1e9:.1f} GB) "
          f"in {t_seed:.1f}s", flush=True)

    phases = {}
    ctx = srv.ctx
    wt = ctx.wt_scalar(0)
    top = srv.height - 1

    t0 = time.time()
    stream.stage_u_to_staging(srv.store, ctx, wt, n, "bx", "by",
                              args.stripe)
    phases["stage_u"] = round(time.time() - t0, 1)
    print(f"stage_u {phases['stage_u']}s rss={rss_gb():.2f}GB", flush=True)

    t0 = time.time()
    for s in range(1, srv.height):
        t1 = time.time()
        stream.stream_stage(srv.store, ctx, "bx", n, s, args.stripe)
        stream.stream_stage(srv.store, ctx, "by", n, s, args.stripe)
        print(f"  stage {s}/{srv.height - 1}: {time.time() - t1:.1f}s "
              f"rss={rss_gb():.2f}GB", flush=True)
    phases["data_stages"] = round(time.time() - t0, 1)

    if args.mac:
        from porla_tpu.curves import kernels as ck
        t0 = time.time()
        macs = srv.mac_u
        for s in range(1, srv.height):
            macs = srv._crebuild_mac_stage(s, macs)
        ck.fetch_many(list(macs))
        phases["mac_stages_one_plane"] = round(time.time() - t0, 1)
        print(f"mac stages {phases['mac_stages_one_plane']}s", flush=True)

    t0 = time.time()
    srv.levels[top].x = Planes(points={
        "c": srv.mac_u, "a": srv.mac_u})  # placeholders; finalize only
    ax = stream.finalize_staged_level(srv, "bx", True, top, n, args.stripe)
    ay = stream.finalize_staged_level(srv, "by", False, top, n,
                                      args.stripe)
    del ax, ay
    phases["finalize_align_256b"] = round(time.time() - t0, 1)
    print(f"finalize {phases['finalize_align_256b']}s rss={rss_gb():.2f}GB",
          flush=True)

    total = sum(phases.values())
    out = {
        "metric": "streamed_crebuild",
        "n": n, "top_caching_level": args.top,
        "stripe_blocks": args.stripe,
        "data_plane_bytes_per_side": n * 128 * 32,
        "phases_s": phases,
        "total_s": round(total, 1),
        "coeffs_per_s_data_stages": round(
            n * 128 * 2 / phases["data_stages"], 1),
        "peak_rss_gb": round(rss_gb(), 2),
        "backend": jax.default_backend(),
    }
    print(json.dumps(out))
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
