"""Out-of-core streaming for the data plane of levels beyond
TOP_CACHING_LEVEL.

The reference's cold-storage tier streams every butterfly through
512-byte file read-modify-writes (`CRebuild_No_Cached`,
reference porla/Server/Server.hpp:1835-2255; disk `mix`,
Server.hpp:954-1207; file formats porla/Utils/utils.h:473-584). The
TPU-native reshaping here keeps the same out-of-core structure — data
lives in per-block staging files, RAM never holds more than a stripe —
but replaces the per-butterfly RMW with stage-streamed batches: read a
stripe of paired blocks (threaded native IO), run the stripe's
butterflies as one device kernel, write the stripe back. Total IO per
stage is one pass over the level, identical to the reference; the
arithmetic runs at device batch width instead of one 512-bit value at a
time.

Staging records are the CRT residue pair (mod p, mod q) of the mod-LCM
value — 64 bytes per chunk like the reference's 512b format. The final
pass reduces mod p, commits the alignment correction (align_MAC,
Server.hpp:478-562) and writes the reference's 256b codeword files.

MAC (point) planes are NOT streamed: like the reference, which keeps
MAC_commitments_H in RAM for every level (Server.hpp:221-241), point
planes stay RAM/device-resident; only block data goes out of core.
"""

from __future__ import annotations

from typing import Callable

import numpy as np

from porla_tpu.curves import kernels as ck
from porla_tpu.fields import limbs
from porla_tpu.ntt import engine
from porla_tpu.ntt.engine import CrtArray, NttContext
from porla_tpu.protocol import compute
from porla_tpu.utils import trace

# a reader yields the (off, cnt) stripe of an (n, C, 16) CRT data plane
StripeReader = Callable[[int, int], CrtArray]


def _tw_slice(tw, off: int, cnt: int):
    return type(tw)(tw.std[off:off + cnt], tw.mont_p[off:off + cnt],
                    tw.mont_q[off:off + cnt])


def ram_reader(data: CrtArray) -> StripeReader:
    return lambda off, cnt: CrtArray(data.p[off:off + cnt],
                                     data.q[off:off + cnt])


def level_reader(store, mod_q, is_x: bool, level: int) -> StripeReader:
    """Stripe reader over a file-backed level's 256b (mod-p-reduced)
    codeword files; the q lane is re-canonicalized on load."""
    def read(off: int, cnt: int) -> CrtArray:
        arr = store.read_codes_256(is_x, level, range(off, off + cnt))
        return CrtArray(arr, engine.q_lane_from_p(np, arr, mod_q))
    return read


def staged_reader(store, tag: str) -> StripeReader:
    return lambda off, cnt: store.read_staged(tag, range(off, off + cnt))


def stage_u_to_staging(store, ctx: NttContext, wt, n: int,
                       tag_x: str, tag_y: str, stripe: int) -> None:
    """CRebuild pass 0: U blocks -> staging X (copy) and Y (scaled by
    w^bitrev(t)), stripe at a time (Server.hpp:1865-1897)."""
    for i0 in range(0, n, stripe):
        idx = range(i0, min(i0 + stripe, n))
        data = store.read_blocks_crt(idx, ctx.mod_q)
        y = compute.scale_crt(ctx.mod_q, data, wt)
        yp, yq = ck.fetch_many([y.p, y.q])
        store.write_staged(tag_x, idx, data.p, data.q)
        store.write_staged(tag_y, idx, yp, yq)


def stream_stage(store, ctx: NttContext, tag: str, n: int, s: int,
                 stripe: int) -> None:
    """One radix-2 butterfly stage over a staged (n, C, 16) plane:
    pairs (k, k+m2) for k mod m < m2, twiddle v^(k mod m2) — the stage
    loop of CRebuild_No_Cached (Server.hpp:1899-2253), stripewise."""
    m = 1 << s
    m2 = m >> 1
    tw = ctx.twiddles(m2)
    with trace.span("stream.stage", s=s, n=n):
        for g in range(n // m):
            base = g * m
            for off in range(0, m2, stripe):
                cnt = min(stripe, m2 - off)
                ia = range(base + off, base + off + cnt)
                ib = range(base + m2 + off, base + m2 + off + cnt)
                a0 = store.read_staged(tag, ia)
                a1 = store.read_staged(tag, ib)
                hi, lo = compute.data_butterfly(
                    ctx.mod_q, a0, a1, _tw_slice(tw, off, cnt))
                hp, hq, lp, lq = ck.fetch_many([hi.p, hi.q, lo.p, lo.q])
                store.write_staged(tag, ia, hp, hq)
                store.write_staged(tag, ib, lp, lq)


def stream_mix(store, ctx: NttContext, lower: StripeReader,
               upper: StripeReader, out_tag: str, length: int,
               stripe: int) -> None:
    """One streamed fold/mix step (disk `mix`, Server.hpp:954-1207):
        out[i]        = lower[i] + v^i * upper[i]
        out[i+length] = lower[i] - v^i * upper[i]
    writing the 2*length-block result to staging files."""
    tw = ctx.twiddles(length)
    with trace.span("stream.mix", length=length):
        for off in range(0, length, stripe):
            cnt = min(stripe, length - off)
            a0 = lower(off, cnt)
            a1 = upper(off, cnt)
            hi, lo = compute.data_butterfly(
                ctx.mod_q, a0, a1, _tw_slice(tw, off, cnt))
            hp, hq, lp, lq = ck.fetch_many([hi.p, hi.q, lo.p, lo.q])
            store.write_staged(out_tag, range(off, off + cnt), hp, hq)
            store.write_staged(out_tag,
                               range(length + off, length + off + cnt),
                               lp, lq)


def finalize_staged_level(server, tag: str, is_x: bool, level: int,
                          n: int, stripe: int):
    """Final streamed pass of a staged plane: commit the alignment
    correction per block (align_MAC), reduce mod p, write the level's
    256b codeword files, delete staging. Returns the (n,) alignment
    commitment points (host) to be added into the level's "a" plane
    (CRebuild_No_Cached final stage, Server.hpp:1977-2253)."""
    from porla_tpu.protocol import hlog
    from porla_tpu.protocol.server import compute_align_scalars
    store = server.store
    align = hlog.infinity_points(n, server.ops)
    with trace.span("stream.finalize", level=level, n=n):
        for i0 in range(0, n, stripe):
            cnt = min(stripe, n - i0)
            idx = range(i0, i0 + cnt)
            data = store.read_staged(tag, idx)
            c = compute_align_scalars(data, server.mod_q)
            commits = ck.to_host(server._commit_batch(c))
            align.x[i0:i0 + cnt] = commits.x
            align.y[i0:i0 + cnt] = commits.y
            align.z[i0:i0 + cnt] = commits.z
            store.write_codes_256(is_x, level, idx, data.p)
        store.delete_staged(tag, n)
    return align
