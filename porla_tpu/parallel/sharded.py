"""Multi-chip sharding: distributed NTT and sharded commitments.

The reference's only parallelism is an 8-thread pool with static index
splits (SURVEY §2.3). The TPU-native scale-out:

- **Distributed NTT** (`sharded_encode`): the block axis is sharded over
  the mesh's "blocks" axis. Butterfly stages whose span fits in a shard
  are local; larger strides exchange whole shards with their partner
  (shard XOR stride/shard_size) via `jax.lax.ppermute` — each side then
  keeps its own butterfly output. This is the direct analogue of the
  reference's two-regime thread split over butterfly columns
  (Server.hpp:1564-1686), mapped onto ICI instead of shared memory.

- **Sharded Pedersen commitments** (`sharded_commit`): blocks are data-
  parallel over "blocks"; the 128-generator MSM is tensor-parallel over
  "chunks" — each chunk shard computes a partial MSM over its generator
  slice, and partials are combined with an all-gather + local point-add
  tree (group elements do not psum).

Twiddle tables are precomputed per stage on the host as sharded arrays
(entry g holds v^(g mod m2)), so both sides of an exchanged pair read the
same factor.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from porla_tpu.curves.instances import secp256k1
from porla_tpu.curves.weierstrass import JacPoint
from porla_tpu.fields import constants as C
from porla_tpu.fields import limbs, mont
from porla_tpu.ntt.engine import NttContext, _MOD_P
from porla_tpu.parallel.multihost import lockstep


def stage(mesh: Mesh, a, spec) -> jax.Array:
    """Host array -> global jax.Array sharded per `spec` on `mesh`.

    Works on single-process meshes AND multi-process (DCN) meshes: each
    process materializes only its addressable shards from the
    (replicated) host value. Device-resident arrays (chained sharded
    outputs) pass through untouched."""
    if isinstance(a, jax.Array) and not isinstance(a, np.ndarray):
        return a
    a = np.asarray(a)
    sh = jax.sharding.NamedSharding(mesh, spec)
    return jax.make_array_from_callback(a.shape, sh, lambda idx: a[idx])


def _halving_sum(ops, p: JacPoint) -> JacPoint:
    """Log-depth batched point-sum over the leading axis (padded to a
    power of two with infinity lanes) -> leading axis 1. Replaces the
    O(shards) serial add chain in the cross-shard combines — at pod
    scale the combine depth must stay logarithmic."""
    k = p.x.shape[0]
    m = 1
    while m < k:
        m <<= 1
    if m != k:
        pad = (m - k,) + p.x.shape[1:]
        p = JacPoint(
            jnp.concatenate([p.x, jnp.ones(pad, jnp.uint32)], 0),
            jnp.concatenate([p.y, jnp.ones(pad, jnp.uint32)], 0),
            jnp.concatenate([p.z, jnp.zeros(pad, jnp.uint32)], 0))
    w = m
    while w > 1:
        w //= 2
        p = ops.add(jnp, JacPoint(p.x[:w], p.y[:w], p.z[:w]),
                    JacPoint(p.x[w:2 * w], p.y[w:2 * w], p.z[w:2 * w]))
    return p


def make_mesh(devices=None, tp: int | None = None) -> Mesh:
    """Mesh over all devices: ("blocks", "chunks"). tp divides the chunk
    axis (default 2 when the device count allows)."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if tp is None:
        tp = 2 if n % 2 == 0 and n > 1 else 1
    dp = n // tp
    arr = np.asarray(devices).reshape(dp, tp)
    return Mesh(arr, ("blocks", "chunks"))


def stage_twiddle_tables(ctx: NttContext, mod: mont.Modulus):
    """Per-stage (n, 16) Montgomery twiddle arrays: entry g = v_s^(g mod m2)
    (v_s = w^(n/m2)). Sharding row-wise matches the data sharding."""
    n = ctx.n
    tables = []
    for s in range(1, ctx.height):
        m2 = 1 << (s - 1)
        tw = ctx.twiddles(m2)   # (m2, 16) std/mont
        src = tw.mont_p if mod is _MOD_P else tw.mont_q
        idx = np.arange(n) % m2
        tables.append(np.asarray(src)[idx])
    return tables


def sharded_encode_fn(ctx: NttContext, mesh: Mesh, mod: mont.Modulus):
    """Builds a jittable f(arr, *twiddle_tables) running all NTT stages of
    one lane over the mesh. arr: (n, C, 16) sharded on axis 0."""
    n = ctx.n
    nblk = mesh.shape["blocks"]
    n_loc = n // nblk
    height = ctx.height

    def local_stage(a, tw, m: int, m2: int):
        L = a.shape[0]
        a2 = a.reshape((L // m, m) + a.shape[1:])
        u, t_in = a2[:, :m2], a2[:, m2:]
        twl = tw.reshape((L // m, m) + (1, limbs.NLIMBS))[:, :m2]
        t = mont.mont_mul(jnp, t_in, twl, mod)
        hi = mont.add_mod(jnp, u, t, mod)
        lo = mont.sub_mod(jnp, u, t, mod)
        return jnp.concatenate([hi, lo], axis=1).reshape(a.shape)

    def exchange_stage(a, tw, shard_shift: int):
        me = jax.lax.axis_index("blocks")
        nb = nblk
        perm = [(d, d ^ shard_shift) for d in range(nb)]
        other = jax.lax.ppermute(a, "blocks", perm)
        am_hi = (me & shard_shift) == 0
        u = jnp.where(am_hi, a, other)
        t_in = jnp.where(am_hi, other, a)
        twl = tw[:, None, :]
        t = mont.mont_mul(jnp, t_in, twl, mod)
        hi = mont.add_mod(jnp, u, t, mod)
        lo = mont.sub_mod(jnp, u, t, mod)
        return jnp.where(am_hi, hi, lo)

    def body(a, *tables):
        for s in range(1, height):
            m = 1 << s
            m2 = m >> 1
            tw = tables[s - 1]
            if m <= n_loc:
                a = local_stage(a, tw, m, m2)
            else:
                a = exchange_stage(a, tw, m2 // n_loc)
        return a

    spec_a = P("blocks")
    spec_t = P("blocks")
    fn = jax.shard_map(body, mesh=mesh,
                       in_specs=(spec_a,) + (spec_t,) * (height - 1),
                       out_specs=spec_a)
    return lockstep(jax.jit(fn),
                    f"encode:n{n}:b{nblk}:{'p' if mod is _MOD_P else 'q'}")


def stage_twiddle_tables_std(ctx: NttContext):
    """Per-stage (n, 16) STANDARD-form twiddles (EC scalar use): entry g =
    v_s^(g mod m2) — the factors of the MAC-mirror point butterflies
    (Server.hpp:1592)."""
    n = ctx.n
    tables = []
    for s in range(1, ctx.height):
        m2 = 1 << (s - 1)
        tw = ctx.twiddles(m2)
        idx = np.arange(n) % m2
        tables.append(np.asarray(tw.std)[idx])
    return tables


def sharded_point_stage_fn(ctx: NttContext, mesh: Mesh, ops=None,
                           nbits: int = 256):
    """Builds f(px, py, pz, tw_std) -> one radix-2 stage over an (n,) MAC
    point plane sharded on "blocks" — the multi-chip MAC mirror of the
    CRebuild stage loop (the actual O(n log n) EC cost, Server.hpp:
    1548-1830). The stage index is baked per returned fn: local butterfly
    when the pair span fits the shard, ppermute coordinate exchange
    otherwise (same pairing as sharded_encode_fn).

    Returns a dict stage -> jitted fn over global (n, 16) arrays."""
    ops = ops or secp256k1()
    n = ctx.n
    nblk = mesh.shape["blocks"]
    n_loc = n // nblk

    def make(s: int):
        m = 1 << s
        m2 = m >> 1

        def local_stage(px, py, pz, tw):
            L = px.shape[0]

            def sp(a):
                a2 = a.reshape((L // m, m, limbs.NLIMBS))
                return (a2[:, :m2].reshape(L // 2, limbs.NLIMBS),
                        a2[:, m2:].reshape(L // 2, limbs.NLIMBS))

            ux, tx = sp(px)
            uy, ty = sp(py)
            uz, tz = sp(pz)
            tww = tw.reshape((L // m, m, limbs.NLIMBS))[:, :m2].reshape(
                L // 2, limbs.NLIMBS)
            t = ops.scalar_mul(jnp, JacPoint(tx, ty, tz), tww, nbits)
            u = JacPoint(ux, uy, uz)
            hi = ops.add(jnp, u, t)
            lo = ops.add(jnp, u, ops.neg(jnp, t))

            def join(h, l, like):
                h2 = h.reshape((L // m, m2, limbs.NLIMBS))
                l2 = l.reshape((L // m, m2, limbs.NLIMBS))
                return jnp.concatenate([h2, l2], axis=1).reshape(like.shape)

            return (join(hi.x, lo.x, px), join(hi.y, lo.y, py),
                    join(hi.z, lo.z, pz))

        def exchange_stage(px, py, pz, tw):
            shard_shift = m2 // n_loc
            me = jax.lax.axis_index("blocks")
            perm = [(d, d ^ shard_shift) for d in range(nblk)]
            ox = jax.lax.ppermute(px, "blocks", perm)
            oy = jax.lax.ppermute(py, "blocks", perm)
            oz = jax.lax.ppermute(pz, "blocks", perm)
            am_hi = (me & shard_shift) == 0
            u = JacPoint(jnp.where(am_hi, px, ox),
                         jnp.where(am_hi, py, oy),
                         jnp.where(am_hi, pz, oz))
            tpt = JacPoint(jnp.where(am_hi, ox, px),
                           jnp.where(am_hi, oy, py),
                           jnp.where(am_hi, oz, pz))
            t = ops.scalar_mul(jnp, tpt, tw, nbits)
            hi = ops.add(jnp, u, t)
            lo = ops.add(jnp, u, ops.neg(jnp, t))
            return (jnp.where(am_hi, hi.x, lo.x),
                    jnp.where(am_hi, hi.y, lo.y),
                    jnp.where(am_hi, hi.z, lo.z))

        body = local_stage if m <= n_loc else exchange_stage
        return lockstep(jax.jit(jax.shard_map(
            body, mesh=mesh,
            in_specs=(P("blocks"),) * 4,
            out_specs=(P("blocks"),) * 3)),
            f"pstage:n{n}:s{s}:b{nblk}:{nbits}")

    return {s: make(s) for s in range(1, ctx.height)}


def sharded_msm_fn(mesh: Mesh, nbits: int = 256, ops=None):
    """Builds f(px, py, pz, scalars) -> (1,) MSM total with the point
    axis sharded over "blocks" (data parallel): each shard computes a
    windowed partial MSM over its slice, partials combine with an
    all-gather + local point-add chain (group elements do not psum).
    The multi-chip form of the audit combination MSMs
    (Server.hpp:831-848)."""
    ops = ops or secp256k1()
    nblk = mesh.shape["blocks"]

    def body(px, py, pz, scalars):
        parts = ops.scalar_mul(jnp, JacPoint(px, py, pz), scalars, nbits)
        local = ops.tree_sum(jnp, parts, axis=0)          # (1, 16)
        gathered = jax.lax.all_gather(tuple(local), "blocks")
        acc = JacPoint(gathered[0][:, 0], gathered[1][:, 0],
                       gathered[2][:, 0])                 # (nblk, 16)
        acc = _halving_sum(ops, acc)                      # log2(nblk) adds
        return tuple(acc)

    fn = jax.shard_map(
        body, mesh=mesh,
        in_specs=(P("blocks"), P("blocks"), P("blocks"), P("blocks")),
        out_specs=(P(), P(), P()),
        check_vma=False)
    return lockstep(jax.jit(fn), f"smsm:b{nblk}:{nbits}")


def sharded_pippenger_msm_fn(mesh: Mesh, ops=None, nbits: int = 256,
                             n_local: int | None = None,
                             c: int | None = None, bt: int | None = None,
                             interpret: bool | None = None):
    """Perf-grade DP MSM: the v3 Pippenger bucket kernel PER SHARD, with
    a log-depth cross-shard window combine (round 3 routed sharded MSMs
    through the windowed double-and-add path — correctness-grade only,
    ~40x the per-point work of the bucket kernel at 2^20).

    Returns (fn, finish):
      fn(px, py, pz, sc): global (N, 16) arrays sharded on "blocks" ->
        three (nwin, 16) arrays — per-window totals combined across
        shards (replicated). All shards run the SAME kernel shapes
        (SPMD), so the per-shard Pallas Pippenger composes with
        shard_map directly.
      finish(wx, wy, wz) -> host JacPoint (1,): the MSB-first Horner
        over windows plus the exact blinding correction (each shard's
        buckets start at the fleet-consistent blinding points, so the
        correction scales by shards * lanes).

    N must be divisible by mesh blocks; each shard pads its local slice
    to lane tiles with zero-digit lanes (infinity-safe, as in
    pippenger_msm)."""
    import jax.numpy as jnp

    from porla_tpu.curves import pallas_curve as pc
    from porla_tpu.curves import pallas_msm as pm
    from porla_tpu.golden import ecc
    from porla_tpu.ntt import mxu

    ops = ops or secp256k1()
    nblk = mesh.shape["blocks"]
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    assert n_local is not None, "pass n_local = N // mesh blocks"
    if bt is None:
        bt = min(pm._DEFAULT_BT, max(128, 1 << (n_local - 1).bit_length()))
    assert bt & (bt - 1) == 0
    if c is None:
        c = pm.choose_c(n_local, nbits)
    nb = 1 << (c - 1)
    steps = -(-n_local // bt)
    npad = steps * bt
    nwin, tight = pm._nwin_for(nbits, c)

    dx, dy, tsum = pm._blinding(ops, nb)
    friendly = pc._mont_friendly(ops.fp)
    tabs = [jnp.asarray(t) for t in pc._curve_tables2(ops.fp)]
    prep = pm._prep_fn(npad, steps, bt, c, nwin, False, tight)
    pip = pm._pip_call(nwin, steps, bt, nb, False, False, friendly,
                       interpret)
    fold = pm._fold_call(nwin, bt, nb, friendly, interpret)
    reduce_fn = pm._reduce_fn(ops, nwin, bt)

    def pad(a):
        if npad != n_local:
            a = jnp.concatenate(
                [a, jnp.zeros((npad - n_local,) + a.shape[1:], a.dtype)], 0)
        return a

    def body(px, py, pz, sc):
        prepped = prep(pad(px), pad(py), pad(pz), pad(sc))
        bufs = pip(*prepped, dx, dy, *tabs)
        fx, fy, fz = fold(*bufs, *tabs)
        lx = mxu.limbs_from_digits(jnp, jnp.moveaxis(fx, 1, 2))
        ly = mxu.limbs_from_digits(jnp, jnp.moveaxis(fy, 1, 2))
        lz = mxu.limbs_from_digits(jnp, jnp.moveaxis(fz, 1, 2))
        wx, wy, wz = reduce_fn(lx, ly, lz)      # (nwin, 16) each
        gathered = jax.lax.all_gather((wx, wy, wz), "blocks")
        acc = _halving_sum(ops, JacPoint(*gathered))   # (1, nwin, 16)
        return acc.x[0], acc.y[0], acc.z[0]

    fn = lockstep(jax.jit(jax.shard_map(
        body, mesh=mesh,
        in_specs=(P("blocks"),) * 4,
        out_specs=(P(), P(), P()),
        check_vma=False)), f"spip:{nbits}:{n_local}:{c}:{bt}")

    def finish(wx, wy, wz) -> JacPoint:
        from porla_tpu.curves import kernels as ck
        host = ck.fetch_many([wx, wy, wz])
        wins = ops.to_affine(JacPoint(*host))
        cv = ops.curve
        acc = wins[nwin - 1]
        for wi in range(nwin - 2, -1, -1):
            acc = ecc.add(cv, ecc.mul(cv, acc, 1 << c), wins[wi])
        wsum = sum(1 << (c * w) for w in range(nwin)) % cv.n
        kappa = (nblk * bt * wsum * tsum) % cv.n
        acc = ecc.add(cv, acc, ecc.neg(cv, ecc.mul(cv, cv.g, kappa)))
        out = ops.from_affine(np, [acc])
        return JacPoint(np.asarray(out.x), np.asarray(out.y),
                        np.asarray(out.z))

    return fn, finish


def sharded_commit_fn(mesh: Mesh, nbits: int = 256, ops=None):
    """Builds f(gx, gy, gz, scalars) -> (B,) commitment points where the
    generator/chunk axis is sharded over "chunks" and blocks over "blocks".
    Partial per-shard MSMs are combined with an all-gather + local adds."""
    ops = ops or secp256k1()

    def body(gx, gy, gz, scalars):
        # gx: (NG_loc, 16); scalars: (B_loc, NG_loc, 16)
        parts = ops.scalar_mul(
            jnp, JacPoint(gx[None], gy[None], gz[None]), scalars, nbits)
        parts = JacPoint(jnp.moveaxis(parts.x, 1, 0),
                         jnp.moveaxis(parts.y, 1, 0),
                         jnp.moveaxis(parts.z, 1, 0))
        local = ops.tree_sum(jnp, parts, axis=0)  # (1, B_loc, 16)
        # combine chunk-shard partials: gather, then a log-depth batched
        # halving tree (a serial per-shard add chain is the wrong shape
        # for a pod-scale tp axis)
        gathered = jax.lax.all_gather(tuple(local), "chunks")  # (tp, 1, B, 16)
        acc = _halving_sum(ops, JacPoint(
            gathered[0][:, 0], gathered[1][:, 0], gathered[2][:, 0]))
        return (acc.x[0], acc.y[0], acc.z[0])

    # check_vma off: after the all-gather + identical local reduction the
    # outputs are value-replicated over "chunks", which the varying-axis
    # tracker cannot prove.
    fn = jax.shard_map(
        body, mesh=mesh,
        in_specs=(P("chunks"), P("chunks"), P("chunks"),
                  P("blocks", "chunks")),
        out_specs=(P("blocks"), P("blocks"), P("blocks")),
        check_vma=False)
    return lockstep(jax.jit(fn), f"scommit:{nbits}")
