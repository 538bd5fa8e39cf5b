"""End-to-end demo: initialize a database, run updates and audits.

Single process:   python examples/demo_e2e.py --n 16
Two processes:    python examples/demo_e2e.py --serve &   (server)
                  python examples/demo_e2e.py --n 16 --connect tcp://localhost:8888
"""

from __future__ import annotations

import argparse
import os
import sys
import tempfile
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.jax_cache"))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=16, help="number of 4KB blocks")
    ap.add_argument("--updates", type=int, default=2)
    ap.add_argument("--audits", type=int, default=2)
    ap.add_argument("--serve", action="store_true", help="run a ZMQ server")
    ap.add_argument("--connect", type=str, default=None,
                    help="ZMQ endpoint of a running server")
    ap.add_argument("--store", type=str, default=None)
    ap.add_argument("--scheme", choices=["ipa", "kzg"], default="ipa")
    ap.add_argument("--top", type=int, default=None,
                    help="top_caching_level (lower it to drive the "
                         "out-of-core streamed tier)")
    ap.add_argument("--stripe", type=int, default=None,
                    help="stream_stripe_blocks for the out-of-core tier")
    ap.add_argument("--resume", action="store_true",
                    help="with --serve: resume from a checkpoint in "
                         "--store (see PorlaServer.save_checkpoint)")
    args = ap.parse_args()

    import jax
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    from porla_tpu.config import PorlaConfig
    from porla_tpu.protocol.server import PorlaServer
    from porla_tpu.protocol.transport import (InProcTransport,
                                              ZmqClientTransport, serve_zmq)

    store = args.store or tempfile.mkdtemp(prefix="porla_store_")
    extra = {}
    if args.top is not None:
        extra["top_caching_level"] = args.top
    if args.stripe is not None:
        extra["stream_stripe_blocks"] = args.stripe
    cfg = PorlaConfig(scheme=args.scheme, storage_dir=store, **extra)

    if args.serve:
        server = (PorlaServer.restore(cfg) if args.resume
                  else PorlaServer(cfg))
        mode = "resumed" if args.resume else "fresh"
        print(f"serving on tcp://*:{cfg.server_port}, store={store} "
              f"({mode})")
        serve_zmq(server, f"tcp://*:{cfg.server_port}")
        return

    from porla_tpu.protocol.client import PorlaClient

    if args.connect:
        transport = ZmqClientTransport(args.connect)
    else:
        transport = InProcTransport(PorlaServer(cfg))

    client = PorlaClient(cfg, transport, data_seed=bytes(range(16)))

    t0 = time.time()
    client.initialize(args.n)
    print(f"initialized n={args.n} in {time.time()-t0:.1f}s "
          f"(store={store})")

    t0 = time.time()
    client.audit()
    print(f"audit #0 PASSED in {time.time()-t0:.1f}s")

    for i in range(args.updates):
        t0 = time.time()
        client.update(i + 1)
        print(f"update {i+1} in {time.time()-t0:.1f}s "
              f"(write_step={client.write_step})")

    for i in range(args.audits):
        t0 = time.time()
        client.audit()
        print(f"audit #{i+1} PASSED in {time.time()-t0:.1f}s")

    print("ALL CHECKS PASSED")


if __name__ == "__main__":
    sys.exit(main())
