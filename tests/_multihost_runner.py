"""Worker for tests/test_multihost.py: one OS process of a 2-process
jax.distributed cluster (CPU backend, 4 virtual devices per process).
Runs the distributed NTT over the global 8-device mesh and checks the
gathered result against the single-host golden stage loop.

The persistent compilation cache is ON (multihost.lockstep fences the
fleet around compiles — the round-3 design disabled the cache instead).
PORLA_MH_SKEW_S=<seconds> makes proc 1 sleep that long before the
collective call, simulating cache-hit/compile skew beyond the Gloo
rendezvous window (~30 s): only the coordination-service barrier in
lockstep survives that.

Usage: python _multihost_runner.py <proc_id> <nproc> <port>
"""

import os
import sys
import time


def main():
    proc_id, nproc, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
    flags = [f for f in os.environ.get("XLA_FLAGS", "").split()
             if "xla_force_host_platform_device_count" not in f]
    flags.append("--xla_force_host_platform_device_count=4")
    os.environ["XLA_FLAGS"] = " ".join(flags)
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                          os.path.expanduser("~/.jax_cache"))

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    import jax.numpy as jnp
    import numpy as np
    from jax.experimental import multihost_utils
    from jax.sharding import NamedSharding, PartitionSpec as P

    from porla_tpu.parallel import multihost, sharded
    from porla_tpu.ntt.engine import (CrtArray, NttContext, _MOD_P,
                                      encode_stages)

    multihost.init_distributed(f"localhost:{port}", nproc, proc_id)
    assert jax.process_count() == nproc
    assert jax.device_count() == 4 * nproc, jax.devices()
    assert jax.local_device_count() == 4

    mesh = multihost.make_mesh()          # blocks=4 (2 hosts x 2), tp=2
    assert mesh.shape["blocks"] * mesh.shape["chunks"] == 4 * nproc

    n, nchunks = 16, 4
    ctx = NttContext(n, "ipa")
    rng = np.random.default_rng(3)        # same data on every process
    arr = rng.integers(0, 1 << 16, (n, nchunks, 16), dtype=np.uint32)

    sh = NamedSharding(mesh, P("blocks"))

    def gput(a):
        rows = multihost.process_local_slice(a.shape[0])
        return jax.make_array_from_process_local_data(sh, a[rows], a.shape)

    tables = sharded.stage_twiddle_tables(ctx, _MOD_P)
    enc = sharded.sharded_encode_fn(ctx, mesh, _MOD_P)
    skew = float(os.environ.get("PORLA_MH_SKEW_S", "0"))
    if skew and proc_id == 1:
        time.sleep(skew)
    out = enc(gput(arr), *[gput(np.asarray(t)) for t in tables])

    got = multihost_utils.process_allgather(out, tiled=True)
    golden = encode_stages(np, ctx, CrtArray(arr, arr)).p
    assert np.array_equal(np.asarray(got), golden), \
        "multi-host NTT mismatch vs golden stage loop"
    print(f"proc {proc_id}: multihost NTT golden-checked", flush=True)


if __name__ == "__main__":
    main()
