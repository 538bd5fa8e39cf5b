"""Protocol-level measurement at realistic n on the real chip.

Initializes a database, runs a window of updates that exercises folds of
increasing depth, then audits — with the structured tracing subsystem
enabled — and prints per-span timing. This is the profiling companion of
the reference's self-test meter (Client.hpp:894-919).

Run:
  env PYTHONPATH=/root/repo:/root/.axon_site \
    JAX_COMPILATION_CACHE_DIR=/root/.jax_cache \
    python examples/measure_protocol.py --n 1024 --updates 16 --audits 3
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
    ap.add_argument("--n", type=int, default=1024)
    ap.add_argument("--updates", type=int, default=16)
    ap.add_argument("--audits", type=int, default=3)
    ap.add_argument("--scheme", choices=["ipa", "kzg"], default="ipa")
    args = ap.parse_args()

    import jax
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    from porla_tpu.config import PorlaConfig
    from porla_tpu.protocol.client import PorlaClient
    from porla_tpu.protocol.server import PorlaServer
    from porla_tpu.protocol.transport import InProcTransport
    from porla_tpu.utils import trace

    store = tempfile.mkdtemp(prefix="porla_meas_")
    cfg = PorlaConfig(scheme=args.scheme, storage_dir=store)
    client = PorlaClient(cfg, InProcTransport(PorlaServer(cfg)),
                         data_seed=bytes(range(16)))

    t0 = time.time()
    client.initialize(args.n)
    print(f"initialized n={args.n} in {time.time() - t0:.1f}s", flush=True)

    # warm one update+audit so compiles don't pollute the traced window
    # (round-robin discipline: block id follows write_step — see
    # client.UpdateOrderError)
    client.update((client.write_step % args.n) + 1)
    client.audit()

    trace.enable()
    trace.reset()
    times = []
    for i in range(args.updates):
        t0 = time.perf_counter()
        client.update((client.write_step % args.n) + 1)
        times.append(time.perf_counter() - t0)
    for _ in range(args.audits):
        t0 = time.perf_counter()
        client.audit()
        times.append(("audit", time.perf_counter() - t0))

    per_upd = [t for t in times if not isinstance(t, tuple)]
    per_aud = [t[1] for t in times if isinstance(t, tuple)]
    print(f"updates: mean {sum(per_upd) / len(per_upd):.3f}s "
          f"min {min(per_upd):.3f}s max {max(per_upd):.3f}s")
    if per_aud:
        print(f"audits:  mean {sum(per_aud) / len(per_aud):.3f}s")
    print(trace.report())


if __name__ == "__main__":
    main()
