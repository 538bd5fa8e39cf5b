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
    return CrtArray(np.asarray(a.p), np.asarray(a.q))


def host_point(p: JacPoint) -> JacPoint:
    return JacPoint(np.asarray(p.x), np.asarray(p.y), np.asarray(p.z))


def infinity_points(n: int, ops=None) -> JacPoint:
    ops = ops or secp256k1()
    inf = ops.infinity(np, (n,))
    return JacPoint(np.asarray(inf.x), np.asarray(inf.y), np.asarray(inf.z))


def concat_crt(a: CrtArray, b: CrtArray) -> CrtArray:
    return CrtArray(np.concatenate([np.asarray(a.p), np.asarray(b.p)], 0),
                    np.concatenate([np.asarray(a.q), np.asarray(b.q)], 0))


def concat_points(a: JacPoint, b: JacPoint) -> JacPoint:
    return JacPoint(np.concatenate([np.asarray(a.x), np.asarray(b.x)], 0),
                    np.concatenate([np.asarray(a.y), np.asarray(b.y)], 0),
                    np.concatenate([np.asarray(a.z), np.asarray(b.z)], 0))


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
        hi, lo = host_crt(hi), host_crt(lo)
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
    for idx, n in enumerate(names):
        out_x.points[n] = host_point(
            concat_points(host_point(his[idx]), host_point(los[idx])))
        out_y.points[n] = host_point(
            concat_points(host_point(his[k + idx]), host_point(los[k + idx])))
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
    levels[target].x = st_x
    levels[target].y = st_y
    levels[target].empty = False
    for i in range(target):
        levels[i].x = Planes()
        levels[i].y = Planes()
        levels[i].empty = True
