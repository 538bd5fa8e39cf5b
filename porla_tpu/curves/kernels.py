"""Jitted, shape-cached entry points for the batched curve operations.

The protocol layer calls these; jit caches one executable per padded
batch-size/nbits combination. Leading batch dims are padded to powers of
two (min 8) so arbitrary protocol sizes reuse a handful of executables —
curve-op graphs are large, so executable count matters. Padding lanes hold
the point at infinity / zero scalars, which are exact no-ops for every
operation here.

On TPU these are the hot MAC-mirror / MSM kernels; under tests they run on
the CPU backend with identical numerics.
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np

from porla_tpu.curves.weierstrass import CurveOps, JacPoint


def _pad_len(n: int) -> int:
    p = 8
    while p < n:
        p <<= 1
    return p


def _pad_point(p: JacPoint, n: int) -> JacPoint:
    """Pad leading axis to n with infinity (z=0) points."""
    cur = p.x.shape[0]
    if cur == n:
        return p
    tail_shape = (n - cur,) + p.x.shape[1:]
    return JacPoint(
        jnp.concatenate([p.x, jnp.ones(tail_shape, jnp.uint32)], 0),
        jnp.concatenate([p.y, jnp.ones(tail_shape, jnp.uint32)], 0),
        jnp.concatenate([p.z, jnp.zeros(tail_shape, jnp.uint32)], 0))


def _pad_scalars(s, n: int):
    cur = s.shape[0]
    if cur == n:
        return s
    tail = (n - cur,) + s.shape[1:]
    return jnp.concatenate([s, jnp.zeros(tail, jnp.uint32)], 0)


@lru_cache(maxsize=None)
def _scalar_mul_fn(ops: CurveOps, nbits: int):
    @jax.jit
    def f(px, py, pz, scalars):
        return tuple(ops.scalar_mul(jnp, JacPoint(px, py, pz), scalars, nbits))
    return f


def scalar_mul(ops: CurveOps, p: JacPoint, scalars, nbits: int = 256,
               pad: bool = True) -> JacPoint:
    """Batched k*P. If `pad`, the leading axis is padded to a power of two
    and the result sliced back."""
    n = p.x.shape[0]
    if pad:
        m = _pad_len(max(n, scalars.shape[0]))
        p = _pad_point(p, m)
        scalars = _pad_scalars(jnp.asarray(scalars), m)
    out = JacPoint(*_scalar_mul_fn(ops, nbits)(p.x, p.y, p.z, scalars))
    if pad:
        out = JacPoint(out.x[:n], out.y[:n], out.z[:n])
    return out


@lru_cache(maxsize=None)
def _add_fn(ops: CurveOps):
    @jax.jit
    def f(ax, ay, az, bx, by, bz):
        return tuple(ops.add(jnp, JacPoint(ax, ay, az), JacPoint(bx, by, bz)))
    return f


def add(ops: CurveOps, a: JacPoint, b: JacPoint) -> JacPoint:
    return JacPoint(*_add_fn(ops)(a.x, a.y, a.z, b.x, b.y, b.z))


@lru_cache(maxsize=None)
def _msm_fn(ops: CurveOps, nbits: int):
    @jax.jit
    def f(px, py, pz, scalars):
        return tuple(ops.msm(jnp, JacPoint(px, py, pz), scalars, nbits))
    return f


@lru_cache(maxsize=None)
def _tree_sum_fn(ops: CurveOps):
    @jax.jit
    def f(px, py, pz):
        return tuple(ops.tree_sum(jnp, JacPoint(px, py, pz), axis=0))
    return f


def tree_sum(ops: CurveOps, p: JacPoint) -> JacPoint:
    """Jitted point-add reduction over the (power-of-two-padded) leading
    axis -> (1,) point."""
    m = _pad_len(p.x.shape[0])
    p = _pad_point(to_device(p), m)
    return JacPoint(*_tree_sum_fn(ops)(p.x, p.y, p.z))


# Above this point count, route variable-base MSMs to the Pippenger
# bucket kernel; below it the windowed per-point path wins (per-window
# bucket-fold overhead amortizes only at scale). The reference's
# analogous policy is Strauss<88/Pippenger>=88 + a bucket-window table
# (ecmult_impl.h:55, 573-597). Measured on the v5e chip (MSM_r03.json):
# windowed 24.0k vs pippenger 4.9k pts/s at N=1024; 18.4k vs 20.0k at
# N=4096; 53.0k vs 57.0k at N=16384 — crossover sits at ~4096.
PIPPENGER_CROSSOVER = int(
    __import__("os").environ.get("PORLA_PIP_CROSSOVER", "4096"))


def msm(ops: CurveOps, points: JacPoint, scalars, nbits: int = 256) -> JacPoint:
    """sum_i scalars[i]*points[i] over the leading axis -> batch-(1,) point.

    Padded lanes contribute the identity (zero scalar * infinity)."""
    from porla_tpu.curves import pallas_curve
    if pallas_curve.use_pallas() and points.x.ndim == 2:
        if points.x.shape[0] >= PIPPENGER_CROSSOVER:
            from porla_tpu.curves import pallas_msm
            # device-resident operands stay on device (v2 preps digits
            # and windows on chip)
            return pallas_msm.pippenger_msm(ops, points, scalars, nbits)
        # keep_pad: the reduction shape stays one-per-128-lane-bucket, so
        # varying audit sample counts reuse one tree_sum executable
        parts = pallas_curve.scalar_mul(ops, points, np.asarray(scalars),
                                        nbits, keep_pad=True)
        return tree_sum(ops, parts)
    n = points.x.shape[0]
    m = _pad_len(n)
    points = _pad_point(points, m)
    scalars = _pad_scalars(jnp.asarray(scalars), m)
    return JacPoint(*_msm_fn(ops, nbits)(points.x, points.y, points.z, scalars))


def to_device(p: JacPoint) -> JacPoint:
    return JacPoint(jnp.asarray(p.x), jnp.asarray(p.y), jnp.asarray(p.z))


def fetch_many(arrs):
    """Fetch several device arrays in ONE host round trip (each separate
    np.asarray pays ~0.1-0.3 s of tunnel latency): flatten, concat on
    device, one transfer, split on host. Host arrays pass through.

    Under a multi-process (DCN) mesh, arrays sharded across processes
    cannot be fetched directly — gather them to every process first
    (one collective over the pytree)."""
    arrs = list(arrs)
    if all(isinstance(a, np.ndarray) for a in arrs):
        return arrs
    shard_idx = [i for i, a in enumerate(arrs)
                 if not isinstance(a, np.ndarray)
                 and not getattr(a, "is_fully_addressable", True)]
    if shard_idx:
        # allgather ONLY the non-fully-addressable entries: process_allgather
        # concatenates numpy/fully-addressable inputs across processes
        # (nproc-times-too-large results for mixed lists); the rest go
        # through the ordinary concat fetch below, order preserved
        from jax.experimental import multihost_utils
        gathered = multihost_utils.process_allgather(
            [arrs[i] for i in shard_idx], tiled=True)
        arrs = list(arrs)
        for i, g in zip(shard_idx, gathered):
            arrs[i] = np.asarray(g)
        if all(isinstance(a, np.ndarray) for a in arrs):
            return arrs
    dev_idx = [i for i, a in enumerate(arrs) if not isinstance(a, np.ndarray)]
    flats = [arrs[i].reshape(-1) for i in dev_idx]
    host = np.asarray(jnp.concatenate(flats)) if len(flats) > 1 \
        else np.asarray(flats[0])
    out, off = list(arrs), 0
    for i in dev_idx:
        a = arrs[i]
        sz = int(np.prod(a.shape)) if a.shape else 1
        out[i] = host[off:off + sz].reshape(a.shape)
        off += sz
    return out


def to_host(p: JacPoint) -> JacPoint:
    return JacPoint(*fetch_many([p.x, p.y, p.z]))


def concat(points: list[JacPoint]) -> JacPoint:
    return JacPoint(
        jnp.concatenate([p.x for p in points], axis=0),
        jnp.concatenate([p.y for p in points], axis=0),
        jnp.concatenate([p.z for p in points], axis=0))


def index(p: JacPoint, idx) -> JacPoint:
    return JacPoint(p.x[idx], p.y[idx], p.z[idx])
