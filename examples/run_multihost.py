"""Multi-host protocol server: one process per host, sharded over the
global (DCN x ICI) mesh.

Launch the same command on every host (process 0's host is the
coordinator):

  python examples/run_multihost.py --coordinator host0:9876 \
      --nprocs 2 --proc-id $I --n 4096

Single-machine rehearsal with the CPU backend (two shells):

  JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=4 \
      python examples/run_multihost.py --coordinator localhost:9876 \
      --nprocs 2 --proc-id 0 --cpu &
  ... --proc-id 1 --cpu

Each process builds the host-aware mesh (porla_tpu/parallel/multihost),
then runs a full sharded protocol epoch: initialize, one update, one
audit — every collective riding ICI within the host and DCN across.
"""

from __future__ import annotations

import argparse
import os
import tempfile
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.jax_cache"))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--coordinator", required=True, help="host0:port")
    ap.add_argument("--nprocs", type=int, required=True)
    ap.add_argument("--proc-id", type=int, required=True)
    ap.add_argument("--n", type=int, default=64)
    ap.add_argument("--scheme", choices=["ipa", "kzg"], default="ipa")
    ap.add_argument("--cpu", action="store_true",
                    help="CPU-backend rehearsal (virtual devices)")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    # the persistent compilation cache stays ON: every collective-
    # bearing program is dispatched through multihost.lockstep, which
    # fences the fleet on the coordination service after AOT compile,
    # so cache-hit skew between processes cannot strand a collective
    # rendezvous (round 3 disabled the cache instead — 448 s inits)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    from porla_tpu.parallel import multihost

    multihost.init_distributed(args.coordinator, args.nprocs, args.proc_id)
    mesh = multihost.make_mesh()
    print(f"proc {jax.process_index()}/{jax.process_count()}: "
          f"{jax.local_device_count()} local / {jax.device_count()} global "
          f"devices, mesh {dict(mesh.shape)}", flush=True)

    from porla_tpu.config import PorlaConfig
    from porla_tpu.protocol.client import PorlaClient
    from porla_tpu.protocol.server import PorlaServer
    from porla_tpu.protocol.transport import InProcTransport

    cfg = PorlaConfig(scheme=args.scheme, mesh=mesh,
                      storage_dir=tempfile.mkdtemp(prefix="porla_mh_"))
    server = PorlaServer(cfg)
    client = PorlaClient(cfg, InProcTransport(server),
                         data_seed=bytes([9] * 16))

    t0 = time.time()
    client.initialize(args.n)
    print(f"proc {jax.process_index()}: initialize(n={args.n}) "
          f"in {time.time()-t0:.1f}s", flush=True)
    t0 = time.time()
    client.update(1)
    print(f"proc {jax.process_index()}: update in {time.time()-t0:.1f}s",
          flush=True)
    t0 = time.time()
    client.audit(seed=bytes([2] * 16))
    print(f"proc {jax.process_index()}: audit PASSED "
          f"in {time.time()-t0:.1f}s", flush=True)


if __name__ == "__main__":
    main()
