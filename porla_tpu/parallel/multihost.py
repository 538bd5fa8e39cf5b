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

import jax
import numpy as np
from jax.sharding import Mesh


def init_distributed(coordinator: str, num_processes: int,
                     process_id: int) -> None:
    """Join the multi-host cluster. Call ONCE per process before any
    device use. coordinator: "host:port" of process 0.

    NOTE: keep the persistent compilation cache DISABLED in multi-
    process runs (run_multihost.py does this). A process that hits the
    cache loads an AOT executable whose dispatch ordering differs from
    a fresh JIT compile; the two processes then sit in DIFFERENT
    collectives and the Gloo context rendezvous times out after ~30 s.
    With the cache off, all processes compile in lockstep on identical
    hardware and stay synchronized."""
    jax.distributed.initialize(coordinator_address=coordinator,
                               num_processes=num_processes,
                               process_id=process_id)
    # derive the fleet-shared MSM blinding seed HERE — a known
    # synchronization point — so no collective runs lazily inside the
    # first pippenger_msm call (see pallas_msm.share_fleet_seed)
    from porla_tpu.curves import pallas_msm
    pallas_msm.share_fleet_seed()


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
