"""Multi-host (DCN) deployment: jax.distributed init + host-aware mesh.

SURVEY §7 scale-out design: shardings ride ICI within a slice and DCN
across hosts. The reference has no cross-machine story at all (one
process, an 8-thread pool with static index splits — reference
porla/Server/Server.hpp:1564-1686); this module is the TPU-native
replacement: each host runs the same program under
`jax.distributed.initialize`, and every `porla_tpu.parallel.sharded`
collective then spans the GLOBAL device set.

Topology-aware layout: the "blocks" (data-parallel / NTT) axis is laid
out with host locality innermost — shard XOR partners at stride <
devices_per_host stay on ICI, and only the outermost log2(n_hosts)
exchange stages of the distributed NTT cross DCN. The "chunks"
(tensor-parallel) axis never leaves a host: its all-gather combine runs
per commitment, so it must stay on ICI.

Works on any backend jax.distributed supports — including the CPU
backend over TCP, which is how tests/test_multihost.py proves the path
end-to-end with two real OS processes on one machine.
"""

from __future__ import annotations

import hashlib

import jax
import numpy as np
from jax.sharding import Mesh


def init_distributed(coordinator: str, num_processes: int,
                     process_id: int) -> None:
    """Join the multi-host cluster. Call ONCE per process before any
    device use. coordinator: "host:port" of process 0.

    The persistent compilation cache may stay ENABLED: every
    collective-bearing program goes through `lockstep` (below), which
    compiles ahead of time and then fences the fleet on the
    coordination service before the first dispatch, so cache-hit /
    compile-time skew between processes can never strand one process
    inside a collective rendezvous (whose Gloo/ICI timeout is ~30 s,
    far less than a cold XLA compile)."""
    jax.distributed.initialize(coordinator_address=coordinator,
                               num_processes=num_processes,
                               process_id=process_id)
    # derive the fleet-shared MSM blinding seed HERE — a known
    # synchronization point — so no collective runs lazily inside the
    # first pippenger_msm call (see pallas_msm.share_fleet_seed)
    from porla_tpu.curves import pallas_msm
    pallas_msm.share_fleet_seed()


def barrier(tag: str, timeout_s: float = 3600.0) -> None:
    """Fleet-wide barrier on the jax.distributed COORDINATION SERVICE
    (gRPC) — not a device collective, so it tolerates arbitrary
    compile-time skew between processes (a device-collective barrier
    such as multihost_utils.sync_global_devices would itself hit the
    ~30 s rendezvous timeout while a peer is still compiling).
    No-op in single-process runs."""
    if jax.process_count() <= 1:
        return
    from jax._src import distributed
    client = distributed.global_state.client
    assert client is not None, "jax.distributed not initialized"
    client.wait_at_barrier(f"porla:{tag}", int(timeout_s * 1000))


def lockstep(fn, tag: str):
    """Wrap a jitted collective-bearing function for multi-process
    safety with the compilation cache ON.

    On the first call with a new argument signature: AOT-compile
    (hits the persistent cache when warm), then `barrier` so every
    process holds the executable BEFORE any process dispatches it.
    Without the fence, a cache-hitting process enters the program's
    first collective immediately while a cache-missing peer compiles
    for minutes, and the collective rendezvous times out (the round-3
    workaround was disabling the cache fleet-wide — 448 s to
    initialize n=16 on 2 CPU processes; see MULTIHOST_r03.json).
    Single-process calls pass straight through."""
    compiled: dict = {}

    def wrapped(*args):
        if jax.process_count() <= 1:
            return fn(*args)
        leaves = jax.tree_util.tree_leaves(args)
        key = tuple((tuple(np.shape(a)), str(np.result_type(
            a.dtype if hasattr(a, "dtype") else a))) for a in leaves)
        exe = compiled.get(key)
        if exe is None:
            exe = fn.lower(*args).compile()
            h = hashlib.sha256(repr((tag, key)).encode()).hexdigest()[:16]
            barrier(f"compile:{tag}:{h}")
            compiled[key] = exe
        return exe(*args)
    return wrapped


def make_mesh(tp: int | None = None) -> Mesh:
    """Global ("blocks", "chunks") mesh over ALL hosts' devices.

    Device order in the blocks axis: [host0 devices..., host1
    devices...], so low-stride ppermute partners are intra-host (ICI)
    and only strides >= devices_per_host/tp cross DCN. The chunks (tp)
    axis is carved out of each host's local devices."""
    devices = jax.devices()              # globally ordered by process
    n = len(devices)
    nproc = jax.process_count()
    per_host = n // nproc
    if tp is None:
        tp = 2 if per_host % 2 == 0 and per_host > 1 else 1
    assert per_host % tp == 0, \
        f"tp={tp} must divide devices/host={per_host} (chunks stay on ICI)"
    # (hosts, local_dp, tp) -> flatten hosts into the blocks axis with
    # local devices innermost
    arr = np.asarray(devices).reshape(nproc, per_host // tp, tp)
    arr = arr.reshape(nproc * (per_host // tp), tp)
    return Mesh(arr, ("blocks", "chunks"))


def process_local_slice(global_rows: int) -> slice:
    """The block rows this process feeds (host-sharded input staging):
    row-contiguous split matching make_mesh's blocks layout."""
    nproc = jax.process_count()
    per = global_rows // nproc
    pid = jax.process_index()
    return slice(pid * per, (pid + 1) * per)


def host_local_array(global_shape, sharding, local_np):
    """Assemble a jax.Array for a global shape from this host's local
    shard (jax.make_array_from_process_local_data)."""
    return jax.make_array_from_process_local_data(
        sharding, local_np, global_shape)
