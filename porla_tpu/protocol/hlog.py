"""Hierarchical log structure H and its fold (mix / HRebuild) drivers.

The log has `height = log2(n)+1` levels; level i holds two erasure-coded
arrays X and Y of 2^i blocks (reference Server.hpp:61-70, utils.h:50-55).
A write lands in level 0; when levels 0..l-1 are occupied they are folded
upward by FFT `mix` steps into level l (reference HAdd/HRebuildX/Y at
Server.hpp:1330-1477; the client runs the identical structure over MAC
complements, Client.hpp:921-1038).

Planes: the server folds data (CRT lanes), MAC commitments and MAC
alignments; the client folds complement points only. One `fold_to_level`
driver serves both — point planes for X and Y share twiddles and are
batched into a single kernel call per mix step.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from porla_tpu.curves import kernels as ck
from porla_tpu.curves.instances import secp256k1
from porla_tpu.curves.weierstrass import JacPoint
from porla_tpu.ntt.engine import CrtArray, NttContext
from porla_tpu.protocol import compute


def host_crt(a: CrtArray) -> CrtArray:
    return CrtArray(*ck.fetch_many([a.p, a.q]))


def host_point(p: JacPoint) -> JacPoint:
    return ck.to_host(p)


def infinity_points(n: int, ops=None) -> JacPoint:
    ops = ops or secp256k1()
    inf = ops.infinity(np, (n,))
    # materialize (broadcast views are read-only): callers assign rows
    # in place (server MAC planes)
    return JacPoint(np.ascontiguousarray(inf.x),
                    np.ascontiguousarray(inf.y),
                    np.ascontiguousarray(inf.z))


def concat_crt(a: CrtArray, b: CrtArray) -> CrtArray:
    """Device-side concat (jnp): fold chains stay lazy on device; hosts
    arrays are accepted and placed on device."""
    import jax.numpy as jnp
    return CrtArray(jnp.concatenate([jnp.asarray(a.p), jnp.asarray(b.p)], 0),
                    jnp.concatenate([jnp.asarray(a.q), jnp.asarray(b.q)], 0))


def concat_points(a: JacPoint, b: JacPoint) -> JacPoint:
    import jax.numpy as jnp
    return JacPoint(jnp.concatenate([jnp.asarray(a.x), jnp.asarray(b.x)], 0),
                    jnp.concatenate([jnp.asarray(a.y), jnp.asarray(b.y)], 0),
                    jnp.concatenate([jnp.asarray(a.z), jnp.asarray(b.z)], 0))


@dataclass
class Planes:
    """One side (X or Y) of a level: optional data plane + point planes."""
    data: CrtArray | None = None
    points: dict = field(default_factory=dict)  # name -> JacPoint

    def point_names(self):
        return sorted(self.points)


@dataclass
class Level:
    x: Planes
    y: Planes
    empty: bool = True
    file_backed: bool = False  # data planes spilled to H_X/H_Y files


def materialize_planes(p: Planes) -> Planes:
    """Fetch a (possibly device-lazy) Planes to host numpy — ONE tunnel
    round trip for all arrays, paid once when a fold deposits its
    result."""
    arrs = []
    if p.data is not None:
        arrs += [p.data.p, p.data.q]
    names = p.point_names()
    for n in names:
        arrs += list(p.points[n])
    flat = ck.fetch_many(arrs)
    out = Planes()
    k = 0
    if p.data is not None:
        out.data = CrtArray(flat[0], flat[1])
        k = 2
    for n in names:
        out.points[n] = JacPoint(flat[k], flat[k + 1], flat[k + 2])
        k += 3
    return out


def materialize_planes2(px: Planes, py: Planes) -> tuple[Planes, Planes]:
    """Materialize an (X, Y) plane pair with a single fetch."""
    def collect(p):
        arrs = []
        if p.data is not None:
            arrs += [p.data.p, p.data.q]
        for n in p.point_names():
            arrs += list(p.points[n])
        return arrs

    ax, ay = collect(px), collect(py)
    flat = ck.fetch_many(ax + ay)

    def rebuild(p, chunk):
        out = Planes()
        k = 0
        if p.data is not None:
            out.data = CrtArray(chunk[0], chunk[1])
            k = 2
        for n in p.point_names():
            out.points[n] = JacPoint(chunk[k], chunk[k + 1], chunk[k + 2])
            k += 3
        return out

    return rebuild(px, flat[:len(ax)]), rebuild(py, flat[len(ax):])


def mix_planes(ctx: NttContext, lower_x: Planes, lower_y: Planes,
               upper_x: Planes, upper_y: Planes,
               length: int) -> tuple[Planes, Planes]:
    """mix(level) -> staged level+1 planes of size 2*length
    (reference Server.hpp:1209-1328 / Client.hpp:921-976):
       out[i] = lower[i] + v^i * upper[i]
       out[i+length] = lower[i] - v^i * upper[i]
    """
    tw = ctx.twiddles(length)

    out_x = Planes()
    out_y = Planes()

    if lower_x.data is not None:
        a0 = concat_crt(lower_x.data, lower_y.data)
        a1 = concat_crt(upper_x.data, upper_y.data)
        tw2 = type(tw)(np.concatenate([tw.std, tw.std], 0),
                       np.concatenate([tw.mont_p, tw.mont_p], 0),
                       np.concatenate([tw.mont_q, tw.mont_q], 0))
        hi, lo = compute.data_butterfly(ctx.mod_q, a0, a1, tw2)
        out_x.data = concat_crt(
            CrtArray(hi.p[:length], hi.q[:length]),
            CrtArray(lo.p[:length], lo.q[:length]))
        out_y.data = concat_crt(
            CrtArray(hi.p[length:], hi.q[length:]),
            CrtArray(lo.p[length:], lo.q[length:]))

    names = lower_x.point_names()
    m0 = [lower_x.points[n] for n in names] + [lower_y.points[n] for n in names]
    m1 = [upper_x.points[n] for n in names] + [upper_y.points[n] for n in names]
    his, los = compute.point_butterfly(m0, m1, tw,
                                       ops=getattr(ctx, "curve_ops", None))
    k = len(names)
    # outputs stay device-lazy: fold chains consume them directly, and
    # fold_to_level materializes the final level once at deposit time
    for idx, n in enumerate(names):
        out_x.points[n] = concat_points(his[idx], los[idx])
        out_y.points[n] = concat_points(his[k + idx], los[k + idx])
    return out_x, out_y


def fold_to_level(ctx: NttContext, levels: list[Level], target: int,
                  slot1_x: Planes, slot1_y: Planes) -> None:
    """HRebuildX+Y combined: fold level-0 slot 0 (levels[0] current) with
    the incoming slot 1 through levels 1..target-1, depositing the result
    as level `target`'s content. Marks levels < target empty."""
    st_x, st_y = mix_planes(ctx, levels[0].x, levels[0].y, slot1_x, slot1_y, 1)
    for i in range(1, target):
        st_x, st_y = mix_planes(ctx, levels[i].x, levels[i].y, st_x, st_y,
                                1 << i)
    levels[target].x, levels[target].y = materialize_planes2(st_x, st_y)
    levels[target].empty = False
    for i in range(target):
        levels[i].x = Planes()
        levels[i].y = Planes()
        levels[i].empty = True
