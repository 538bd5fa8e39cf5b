"""Reference-workload soak: the self_test meter at the reference's
default n=1024 (Client.cpp:7, Client.hpp:894-919), recorded as a JSON
artifact.

One full epoch of n round-robin updates per scheme (every fold depth and
the epoch-boundary CRebuild occur), audits after the last write, trace
JSONL dumped alongside. Run on the real chip:

  env PYTHONPATH=/root/repo:/root/.axon_site \
    JAX_COMPILATION_CACHE_DIR=/root/.jax_cache \
    python examples/soak.py --n 1024 --out SOAK_r02.json
"""

from __future__ import annotations

import argparse
import json
import os
import tempfile
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.jax_cache"))


def run_scheme(scheme: str, n: int, audits: int, epochs: int) -> dict:
    import jax

    from porla_tpu.config import PorlaConfig
    from porla_tpu.protocol.client import PorlaClient
    from porla_tpu.protocol.server import PorlaServer
    from porla_tpu.protocol.transport import InProcTransport
    from porla_tpu.utils import trace

    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    store = tempfile.mkdtemp(prefix=f"porla_soak_{scheme}_")
    cfg = PorlaConfig(scheme=scheme, storage_dir=store)
    client = PorlaClient(cfg, InProcTransport(PorlaServer(cfg)),
                         data_seed=bytes(range(16)))

    t0 = time.time()
    client.initialize(n)
    t_init = time.time() - t0
    print(f"[{scheme}] initialized n={n} in {t_init:.1f}s", flush=True)

    # warm one update + audit (compiles) before the metered epoch —
    # the update must continue the round-robin rotation (UpdateOrderError;
    # the round-4 soak failed its post-epoch audit because this warm-up
    # was a hardcoded update(1) that shifted the rotation)
    client.update((client.write_step % n) + 1)
    client.audit()

    trace.enable()
    trace.reset()
    stats = client.self_test(epochs=epochs, audits_per_epoch=audits)
    trace.dump_jsonl(os.path.join(store, "trace.jsonl"))
    stats.update({"scheme": scheme, "n": n, "init_s": round(t_init, 1),
                  "backend": jax.default_backend(),
                  "trace_jsonl": os.path.join(store, "trace.jsonl")})
    print(f"[{scheme}] {stats}", flush=True)
    return stats


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1024)
    ap.add_argument("--audits", type=int, default=5)
    ap.add_argument("--epochs", type=int, default=1)
    ap.add_argument("--schemes", default="ipa,kzg")
    ap.add_argument("--out", default="SOAK_r02.json")
    args = ap.parse_args()

    results = []
    for s in args.schemes.split(","):
        results.append(run_scheme(s, args.n, args.audits, args.epochs))
        # incremental artifact: a killed run still leaves the schemes
        # that finished (round-4 lesson: all-at-the-end writes lose
        # everything to a timeout)
        with open(args.out, "w") as f:
            json.dump({"workload": "self_test (Client.hpp:894-919)",
                       "epochs": args.epochs, "results": results},
                      f, indent=1)
        print(f"wrote {args.out} ({len(results)} scheme(s))", flush=True)


if __name__ == "__main__":
    main()
