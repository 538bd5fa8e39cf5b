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
    from porla_tpu.fields import mont
    from porla_tpu.ntt import engine

    on_tpu = jax.default_backend() == "tpu"
    n = 1 << 14 if on_tpu else 1 << 8
    nchunks = 128 if on_tpu else 16
    ctx = engine.NttContext(n, "ipa")
    tables = [ctx.twiddles(1 << (s - 1)) for s in range(1, ctx.height)]

    @jax.jit
    def encode(ap, aq):
        for s in range(1, ctx.height):
            m = 1 << s
            m2 = m >> 1
            tw = tables[s - 1]

            def stage(a, twl, mod):
                a2 = a.reshape((n // m, m, nchunks, 16))
                u, t_in = a2[:, :m2], a2[:, m2:]
                t = mont.mont_mul(jnp, t_in, twl, mod)
                hi = mont.add_mod(jnp, u, t, mod)
                lo = mont.sub_mod(jnp, u, t, mod)
                return jnp.concatenate([hi, lo], axis=1).reshape(a.shape)

            ap = stage(ap, jnp.asarray(tw.mont_p)[None, :, None, :],
                       engine._MOD_P)
            aq = stage(aq, jnp.asarray(tw.mont_q)[None, :, None, :],
                       ctx.mod_q)
        return ap, aq

    rng = np.random.default_rng(0)
    # random 16-bit limbs are valid field elements' limb pattern subset;
    # throughput is data-independent
    ap = jnp.asarray(rng.integers(0, 1 << 16, (n, nchunks, 16),
                                  dtype=np.uint32))
    aq = jnp.asarray(rng.integers(0, 1 << 16, (n, nchunks, 16),
                                  dtype=np.uint32))

    jax.block_until_ready(encode(ap, aq))  # compile + warm
    # chain reps through data dependencies and finish with a host fetch so
    # async dispatch through the device tunnel cannot fake completion
    reps = 3
    t0 = time.perf_counter()
    bp, bq = ap, aq
    for _ in range(reps):
        bp, bq = encode(bp, bq)
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
