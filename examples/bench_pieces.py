"""Time the components of one bf16 butterfly stage in isolation on the
real chip: the three MXU dots, the carry normalizations, and the mod
add/sub — to locate the bottleneck. Results are NOT exact math (pieces
are run on mismatched data); timing only.
"""

from __future__ import annotations

import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.jax_cache"))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

from porla_tpu.fields import mont
from porla_tpu.ntt import engine, mxu


def fetch(x):
    return np.asarray(x.ravel()[:1])


def timeit(name, fn, *args, reps=10):
    out = fn(*args)
    fetch(out if not isinstance(out, tuple) else out[0])
    t0 = time.perf_counter()
    x = args
    for _ in range(reps):
        out = fn(*x)
    fetch(out if not isinstance(out, tuple) else out[0])
    dt = (time.perf_counter() - t0) / reps
    print(f"{name:>28}: {dt*1e3:8.2f} ms")
    return dt


def main():
    n, C = 1 << 14, 128
    ctx = engine.NttContext(n, "ipa")
    mod = ctx.mod_p
    G = 128                      # a mid/late stage shape
    B = (n // (2 * G)) * C       # total n/2*C values split into G groups
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.integers(0, 256, (G, 32, B), dtype=np.uint32))
    cols64 = jnp.asarray(rng.integers(0, 1 << 21, (G, 64, B),
                                      dtype=np.uint32))
    mats = jnp.asarray(mxu.stage_twiddle_mats8(ctx, mod, G))
    mN_, mN = mxu._mod_mats8(mod)
    dot = mxu._dot8(jnp)

    print(f"shape: G={G} B={B} (values = {G*B})")

    # full modmul
    timeit("mul_const_mont8 (full)", jax.jit(
        lambda a, m: mxu.mul_const_mont8(jnp, a, m, mod)), x, mats)

    # dots only (dot1 + dot2 + dot3 on fake intermediates)
    def dots_only(a, m):
        t256 = dot(m, a)
        m256 = dot(jnp.asarray(np.broadcast_to(mN_[None], (G,) + mN_.shape)),
                   a)
        u256 = dot(jnp.asarray(np.broadcast_to(mN[None], (G,) + mN.shape)), a)
        return t256 + u256[:, :64] + jnp.pad(m256, ((0, 0), (0, 32), (0, 0)))
    timeit("3 dots only", jax.jit(dots_only), x, mats)

    # one normalize of a 64-col tensor (the dominant carry op)
    def norm_only(c):
        return mxu._normalize256(jnp, jnp.moveaxis(c, 1, 0), mxu.ND4 + 2)
    timeit("normalize (66 wide)", jax.jit(norm_only), cols64)

    # fold only (no resolve)
    def fold_only(c):
        return mxu._fold(jnp, jnp.moveaxis(c, 1, 0), mxu.ND4 + 2)
    timeit("fold only (66 wide)", jax.jit(fold_only), cols64)

    # resolve only (values <= 511)
    v511 = jnp.asarray(rng.integers(0, 512, (66, G, B), dtype=np.uint32))
    timeit("resolve only (66 wide)", jax.jit(
        lambda v: mxu._resolve_digits(jnp, v)[0]), v511)

    # add/sub mod256 pair (butterfly tail)
    a32 = jnp.asarray(rng.integers(0, 256, (32, G, B), dtype=np.uint32))
    b32 = jnp.asarray(rng.integers(0, 256, (32, G, B), dtype=np.uint32))

    def addsub(a, b):
        return (mxu.add_mod256(jnp, a, b, mod),
                mxu.sub_mod256(jnp, a, b, mod))
    timeit("add+sub mod256", jax.jit(addsub), a32, b32)

    # cond_sub alone
    top = jnp.asarray(rng.integers(0, 2, (G, B), dtype=np.uint32))
    timeit("cond_sub", jax.jit(
        lambda r, t: mxu._cond_sub(jnp, r, t, mod)), a32, top)


if __name__ == "__main__":
    main()
