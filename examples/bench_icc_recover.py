"""BASELINE config 2 at scale: ICC erasure recovery inside a 2^16-block
log — a level of m = 2^15 blocks, e erased columns, recovered on device
(ntt/icc_device.py) and verified bit-exact against the inserted blocks.

The reference demonstrates decode only in MATLAB at m=16 via a dense
matrix inverse (icc/main.m); the O(m^3) dense solve is unusable at this
scale on any hardware. The device path costs e batched level-fold NTT
passes + an e x e reduced solve (see icc_device docstring).

  env PYTHONPATH=/root/repo:/root/.axon_site \
    JAX_COMPILATION_CACHE_DIR=/root/.jax_cache \
    python examples/bench_icc_recover.py --out ICC_r04.json
"""

from __future__ import annotations

import argparse
import json
import os
import random
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.jax_cache"))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1 << 16,
                    help="log size (level recovered: m = n/2)")
    ap.add_argument("--erase", type=int, default=128)
    ap.add_argument("--chunks", type=int, default=8)
    ap.add_argument("--q-lane", action="store_true",
                    help="also recover the mod-q CRT lane")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    from porla_tpu.fields import constants as C
    from porla_tpu.fields import limbs as L
    from porla_tpu.fields import mont
    from porla_tpu.ntt import engine, icc, icc_device

    P = C.FFT_PRIME
    m = args.n // 2
    e = args.erase
    # hardened ctx: the reference's GENERATOR is not a primitive root,
    # so its codeword is not MDS and random erasure patterns can be
    # singular by construction (fields/constants.py note); the recovery
    # guarantee is stated for the hardened (true Reed-Solomon) mode
    ctx = engine.NttContext(args.n, "ipa", hardened=True)
    rng = random.Random(17)
    write_times = [(3 + i) for i in range(m)]     # incremental HAdd build
    rec = {"n": args.n, "m": m, "erased": e, "chunks": args.chunks,
           "backend": jax.default_backend()}

    # blocks + codeword (X | Y halves) on device via the level fold
    blk = np.random.default_rng(23).integers(
        0, 1 << 32, (m, args.chunks, 8), dtype=np.uint32)
    # 16 random u16 limbs per chunk (values < 2^256; both lanes reduce)
    blk16 = np.ascontiguousarray(
        np.concatenate([blk & 0xFFFF, blk >> 16], axis=2))

    def build_and_recover(mod, tag):
        tabs = icc_device._stage_twiddles(ctx, m, mod, inverse=False)
        wt = jnp.asarray(icc_device._wt_mont(ctx, write_times, mod)
                         ).reshape(m, 1, L.NLIMBS)
        t0 = time.time()
        bdev = jnp.asarray(blk16)
        X = icc_device._fold_dev(jnp, bdev, tabs, mod)
        Y = icc_device._fold_dev(
            jnp, mont.mont_mul(jnp, bdev, wt, mod), tabs, mod)
        X, Y = np.asarray(X), np.asarray(Y)
        rec[f"encode_{tag}_s"] = round(time.time() - t0, 2)

        # spot-check two codeword columns against the exact host fold
        for c in (0, args.chunks - 1):
            want = icc.fold_transform(
                ctx, [int(L.limbs_to_int(blk16[i, c])) % mod.n
                      for i in range(m)]) if mod.n == P else None
            if want is not None:
                got = [int(L.limbs_to_int(X[j, c])) for j in range(m)]
                assert got == want, "device fold != exact host fold"

        erased = set(rng.sample(range(2 * m), e))
        surviving = {}
        for j in range(2 * m):
            if j in erased:
                continue
            src = X if j < m else Y
            surviving[j] = [int(L.limbs_to_int(src[j % m, c]))
                            for c in range(args.chunks)]
        t0 = time.time()
        got = icc_device.recover_level_device(ctx, write_times,
                                              surviving, mod=mod)
        rec[f"recover_{tag}_s"] = round(time.time() - t0, 2)
        want = [[int(L.limbs_to_int(blk16[i, c])) % mod.n
                 for c in range(args.chunks)] for i in range(m)]
        assert got == want, "recovered blocks differ"
        rec[f"recover_{tag}_bitexact"] = True
        print(f"[{tag}] encode {rec[f'encode_{tag}_s']}s, "
              f"recover {rec[f'recover_{tag}_s']}s, bit-exact", flush=True)

    build_and_recover(engine._MOD_P, "p")
    if args.q_lane:
        build_and_recover(ctx.mod_q, "q")

    print(json.dumps(rec))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(rec, f, indent=1)
        print("wrote", args.out)


if __name__ == "__main__":
    main()
