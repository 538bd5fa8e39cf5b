"""Single-chip benchmark: ICC/NTT erasure-encode throughput.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

The measured op is the compute core of the protocol's hot loop
(CRebuild): all radix-2 NTT stages over a (n, 128-chunk) block array in
both CRT lanes (mod p and mod q), i.e. one full codeword build. Metric =
encoded 256-bit coefficients per second (n * 128 / t).

vs_baseline compares against an estimate of the reference's 8-thread CPU
CRebuild throughput (see BENCH_NOTES.md for the derivation):
~1 microsecond per 512-bit chunk-butterfly (NTL mul + two mod-LCM
reductions), 8 threads -> ~1.2e6 coeffs/s at n = 2^14.
"""

from __future__ import annotations

import json
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.jax_cache"))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

REFERENCE_CPU_COEFFS_PER_S = 1.2e6  # estimated; BENCH_NOTES.md


def main():
    from porla_tpu.ntt import engine, mxu

    on_tpu = jax.default_backend() == "tpu"
    n = 1 << 14 if on_tpu else 1 << 8
    nchunks = 128 if on_tpu else 16
    ctx = engine.NttContext(n, "ipa")
    # Toeplitz twiddle stacks as device arrays (passed as args so they are
    # not baked into the compiled program)
    mats_p = [jnp.asarray(mxu.stage_twiddle_mats8(ctx, ctx.mod_p, 1 << (s - 1)))
              for s in range(1, ctx.height)]
    mats_q = [jnp.asarray(mxu.stage_twiddle_mats8(ctx, ctx.mod_q, 1 << (s - 1)))
              for s in range(1, ctx.height)]
    nstages = ctx.height - 1

    # one executable per stage (a single fused program compiles poorly and
    # runs ~40x slower; per-stage dispatch is also the deployment shape)
    stage_p = [jax.jit(lambda a, m, s=s: mxu.encode_stage8(
        jnp, ctx.mod_p, a, s, m)) for s in range(1, ctx.height)]
    stage_q = [jax.jit(lambda a, m, s=s: mxu.encode_stage8(
        jnp, ctx.mod_q, a, s, m)) for s in range(1, ctx.height)]

    def encode(ap, aq, *mats):
        for i in range(nstages):
            ap = stage_p[i](ap, mats[i])
            aq = stage_q[i](aq, mats[nstages + i])
        return ap, aq

    rng = np.random.default_rng(0)
    # random 8-bit digits are a valid canonical-value subset; throughput
    # is data-independent
    ap = jnp.asarray(rng.integers(0, 1 << 8, (n, nchunks, 32),
                                  dtype=np.uint32))
    aq = jnp.asarray(rng.integers(0, 1 << 8, (n, nchunks, 32),
                                  dtype=np.uint32))

    wp, wq = encode(ap, aq, *mats_p, *mats_q)  # compile + warm
    _ = np.asarray(wp[0, 0, :1])  # true barrier (block_until_ready can
    _ = np.asarray(wq[0, 0, :1])  # return early through the device tunnel)
    # chain reps through data dependencies and finish with a host fetch so
    # async dispatch through the device tunnel cannot fake completion
    reps = 3
    t0 = time.perf_counter()
    bp, bq = ap, aq
    for _ in range(reps):
        bp, bq = encode(bp, bq, *mats_p, *mats_q)
    _ = np.asarray(bp[0, 0, :1])
    dt = (time.perf_counter() - t0) / reps

    coeffs_per_s = n * nchunks / dt
    print(json.dumps({
        "metric": "icc_encode_coeffs_per_s",
        "value": round(coeffs_per_s, 1),
        "unit": f"256-bit coeffs/s (n=2^{n.bit_length()-1}, C={nchunks}, "
                f"both CRT lanes, {jax.default_backend()})",
        "vs_baseline": round(coeffs_per_s / REFERENCE_CPU_COEFFS_PER_S, 3),
    }))


if __name__ == "__main__":
    main()
