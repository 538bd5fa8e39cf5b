"""Compare NTT stage pipelines on the real chip: per-stage regrouping
(mxu.encode_stage8) vs constant-geometry (mxu_cg), plus dispatch-fusion
variants. Development harness behind bench.py's headline number.

Run: env PYTHONPATH=/root/repo:/root/.axon_site \
       JAX_COMPILATION_CACHE_DIR=/root/.jax_cache \
       python examples/bench_stages.py [--n 14] [--lanes 1]
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
    """True barrier: host-fetch a slice (block_until_ready returns early
    through the tunnel)."""
    return np.asarray(x.ravel()[:1])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=14, help="log2 n")
    ap.add_argument("--c", type=int, default=128)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--which", default="all",
                    help="comma list: old,cg,cg2,pallas")
    ap.add_argument("--bt", type=int, default=512)
    args = ap.parse_args()

    from porla_tpu.ntt import engine, mxu, mxu_cg

    n, C = 1 << args.n, args.c
    ctx = engine.NttContext(n, "ipa")
    nstages = ctx.height - 1
    mats = [jnp.asarray(m) for m in mxu_cg.stage_mats_list(ctx, ctx.mod_p)]

    rng = np.random.default_rng(0)
    arr = rng.integers(0, 1 << 8, (n, C, 32), dtype=np.uint32)
    coeffs = n * C
    which = args.which.split(",") if args.which != "all" else [
        "old", "cg", "cg2", "pallas"]

    def run(name, warm_and_run):
        t_c0 = time.perf_counter()
        warm_and_run()  # compile + warm
        compile_s = time.perf_counter() - t_c0
        t0 = time.perf_counter()
        for _ in range(args.reps):
            warm_and_run()
        dt = (time.perf_counter() - t0) / args.reps
        print(f"{name:>6}: {dt*1e3:8.1f} ms  "
              f"{coeffs/dt:.3e} coeffs/s/lane  (compile+warm {compile_s:.1f}s)")

    # --- old path: per-stage regrouping, one executable per stage
    if "old" in which:
        stage_old = [jax.jit(lambda a, m, s=s: mxu.encode_stage8(
            jnp, ctx.mod_p, a, s, m)) for s in range(1, ctx.height)]
        a_dev = jnp.asarray(arr)

        def run_old():
            x = a_dev
            for i in range(nstages):
                x = stage_old[i](x, mats[i])
            fetch(x)
        run("old", run_old)

    # --- cg path: one executable per stage
    if "cg" in which:
        u0, t0_ = mxu_cg.cg_prepare(arr)
        u0, t0_ = jnp.asarray(u0), jnp.asarray(t0_)

        stage_cg = jax.jit(
            lambda u, t, m: mxu_cg.cg_stage(jnp, ctx.mod_p, u, t, m),
            donate_argnums=(0, 1))
        final_cg = jax.jit(
            lambda u, t, m: mxu_cg.cg_finalize(
                jnp, mxu_cg.cg_stage(jnp, ctx.mod_p, u, t, m)),
            donate_argnums=(0, 1))

        def run_cg():
            u, t = u0 + 0, t0_ + 0  # keep originals (donation)
            for i in range(nstages - 1):
                u, t = stage_cg(u, t, mats[i])
            x = final_cg(u, t, mats[-1])
            fetch(x)
        run("cg", run_cg)

    # --- cg path: two stages per executable
    if "cg2" in which:
        u0, t0_ = mxu_cg.cg_prepare(arr)
        u0, t0_ = jnp.asarray(u0), jnp.asarray(t0_)

        def two(u, t, m1, m2):
            u, t = mxu_cg.cg_stage(jnp, ctx.mod_p, u, t, m1)
            return mxu_cg.cg_stage(jnp, ctx.mod_p, u, t, m2)
        two_j = jax.jit(two, donate_argnums=(0, 1))
        stage_cg = jax.jit(
            lambda u, t, m: mxu_cg.cg_stage(jnp, ctx.mod_p, u, t, m),
            donate_argnums=(0, 1))
        final_cg = jax.jit(
            lambda u, t, m: mxu_cg.cg_finalize(
                jnp, mxu_cg.cg_stage(jnp, ctx.mod_p, u, t, m)),
            donate_argnums=(0, 1))

        def run_cg2():
            u, t = u0 + 0, t0_ + 0
            i = 0
            while i + 2 <= nstages - 1:
                u, t = two_j(u, t, mats[i], mats[i + 1])
                i += 2
            while i < nstages - 1:
                u, t = stage_cg(u, t, mats[i])
                i += 1
            x = final_cg(u, t, mats[-1])
            fetch(x)
        run("cg2", run_cg2)


    # --- cg dataflow driven by the fused Pallas stage kernel
    if "pallas" in which:
        from porla_tpu.ntt import pallas_stage

        u0, t0_ = mxu_cg.cg_prepare(arr)
        u0, t0_ = jnp.asarray(u0), jnp.asarray(t0_)

        bound = [jax.jit(
            lambda u, t, m, m2=(1 << (s - 1)): _pl_step(
                pallas_stage, ctx, u, t, m, m2, args.bt))
            for s in range(1, ctx.height)]

        def run_pl():
            u, t = u0, t0_
            for i in range(nstages - 1):
                u, t = bound[i](u, t, mats[i])
            x = bound[-1](u, t, mats[-1])
            fetch(x[0])
        run("pallas", run_pl)

    if "2lane" in which:
        _twolane(args, ctx, mats, arr, run)
    if "1lane" in which:
        _onelane_cgstep(args, ctx, mats, arr, run)


def _pl_step(pallas_stage, ctx, u, t, m, m2, bt):
    """One cg stage via the Pallas kernel + slice/concat boundary."""
    import jax.numpy as jnp
    G = u.shape[2]
    C = u.shape[3]
    u3 = u.reshape(m2, 32, G * C)
    t3 = t.reshape(m2, 32, G * C)
    hi, lo = pallas_stage.butterfly_stage(u3, t3, m, ctx.mod_p, bt=bt)
    hi = hi.reshape(m2, 32, G, C)
    lo = lo.reshape(m2, 32, G, C)
    if G == 1:
        return (jnp.concatenate([hi, lo], axis=0),)
    h = G // 2
    return (jnp.concatenate([hi[:, :, :h], lo[:, :, :h]], axis=0),
            jnp.concatenate([hi[:, :, h:], lo[:, :, h:]], axis=0))




def _twolane(args, ctx, mats, arr, run):
    """pallas kernels, both lanes interleaved (bench.py's shape)."""
    import jax.numpy as jnp
    import numpy as np
    from porla_tpu.ntt import mxu_cg, pallas_stage

    mats_q = [jnp.asarray(m) for m in
              mxu_cg.stage_mats_list(ctx, ctx.mod_q)]
    u0, t0_ = (jnp.asarray(z) for z in mxu_cg.cg_prepare(arr))
    nstages = ctx.height - 1

    def run_2l():
        up, tp, uq, tq = u0, t0_, u0, t0_
        for i in range(nstages - 1):
            up, tp = pallas_stage.cg_step(up, tp, mats[i], ctx.mod_p)
            uq, tq = pallas_stage.cg_step(uq, tq, mats_q[i], ctx.mod_q)
        xp_ = pallas_stage.cg_step(up, tp, mats[-1], ctx.mod_p)
        xq_ = pallas_stage.cg_step(uq, tq, mats_q[-1], ctx.mod_q)
        fetch(xp_)
        fetch(xq_)
    run("2lane", run_2l)


def _onelane_cgstep(args, ctx, mats, arr, run):
    """pallas kernels via cg_step (one lane) — vs the _pl_step variant."""
    import jax.numpy as jnp
    from porla_tpu.ntt import mxu_cg, pallas_stage

    u0, t0_ = (jnp.asarray(z) for z in mxu_cg.cg_prepare(arr))
    nstages = ctx.height - 1

    def run_1l():
        u, t = u0, t0_
        for i in range(nstages - 1):
            u, t = pallas_stage.cg_step(u, t, mats[i], ctx.mod_p)
        x = pallas_stage.cg_step(u, t, mats[-1], ctx.mod_p)
        fetch(x)
    run("1lane", run_1l)


if __name__ == "__main__":
    main()
