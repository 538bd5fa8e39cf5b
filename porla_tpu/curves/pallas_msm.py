"""Pippenger bucket MSM as fused Pallas kernels (v2: blinded buckets,
signed windows, on-device operand prep).

TPU-native equivalent of libsecp256k1's Pippenger multi-scalar
multiplication (reference porla/Utils/secp256k1_lib/src/ecmult_impl.h:
646-722 pippenger_batch, :814-861 ecmult_multi_var; window policy
:55, 573-597). The CPU algorithm's data-dependent bucket scatter becomes
a lane-parallel select-accumulate:

- Lanes are independent accumulators. The N points are laid out as
  (steps, bt) lane tiles; each lane sweeps its `steps` points serially.
- Scalars are split into SIGNED width-c windows (digits in
  [-2^(c-1), 2^(c-1)], computed on device by a carry scan), so only
  nb = 2^(c-1) buckets per lane are needed; the sign costs one cheap
  y-negation select per step.
- Per window w (grid dim 0), every lane keeps its nb Jacobian buckets
  in VMEM SCRATCH for the whole window, DMAed to/from HBM once per
  window (v3; round 3's revisited output block cost ~3 ms of Mosaic
  double-buffer machinery per window boundary and 2x the VMEM). One
  grid step = ONE batched point add into the digit-selected bucket
  (branchless nb-way select for read and writeback), using the v2
  field core (Karatsuba-hybrid conv + wide-dot REDC + squaring
  specialization — pallas_curve._p_madd_pure2).
- Buckets are initialized to BLINDING points D_s = d_s * G with secret
  per-process scalars d_s (distinct per slot). Accumulators are then
  never the point at infinity and never equal an incoming point except
  with negligible probability, so the bucket add is the RAW formula --
  11-mul mixed add for affine inputs (no branchless doubling ladder,
  no infinity selects; vs 24 muls + selects for the fully-guarded
  add). The known blinding contribution is subtracted exactly at the
  end: total -= bt * (sum_w 2^cw) * (sum_s s*d_s) * G.
- Per (window, lane) the buckets fold via the standard suffix-run
  trick (sum_s s*B_s = sum of suffix sums) in a second tiny kernel,
  then reduce in one jitted XLA graph: log2(bt) lane-halving adds +
  MSB-first Horner over windows on the host (exact bigints).

All operand prep (point limb->digit tiling, signed window extraction)
runs on device in one jitted function; the host ships u16 limbs (half
the tunnel traffic of u32) or reuses device-resident operands as-is.

Soundness note: the blinding scalars are drawn from SystemRandom per
process (PORLA_MSM_BLIND_SEED overrides for reproducible debugging), so
an adversary who controls the MSM inputs cannot steer an accumulator
into the unhandled doubling case; results are exact and independent of
the blinding values.
"""

from __future__ import annotations

import os
import random
from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from porla_tpu.curves import pallas_curve as pc
from porla_tpu.curves.weierstrass import CurveOps, JacPoint
from porla_tpu.fields import limbs as L
from porla_tpu.golden import ecc
from porla_tpu.ntt import mxu
from porla_tpu.ntt.mxu import ND
from porla_tpu.ntt.pallas_stage import _sub_mod

_SIGN = 256  # sign flag in the packed digit (slot | sign); bit 8, NOT
# bit 7: signed width-c digits reach |d| = 2^(c-1), which at c=8 is
# exactly 128 and would collide with a bit-7 flag (caught by the bench
# golden check when first enabling c=8)


# --- bucket-accumulate kernels ----------------------------------------------

def _digit_row(dig, k):
    """Select row k%8 of the (8, bt) digit block with a branchless
    iota mask-sum (Mosaic supports neither (1,1,bt) blocks nor dynamic
    sublane slices)."""
    sub = dig.astype(jnp.int32)
    rowid = jax.lax.broadcasted_iota(jnp.int32, sub.shape, 0)
    return jnp.sum(jnp.where(rowid == k % 8, sub, 0), axis=0)[None]


def _pip_kernel_v3(steps, nb, affine, carry, friendly, *refs):
    """v3 bucket kernel: buckets live in VMEM SCRATCH for the whole
    window and are DMAed to HBM once per window. Round 3 kept them in a
    revisited output block, which Mosaic double-buffers — 12 MB of VMEM
    at bt=512/nb=32 and a measured ~3 ms stall per window boundary
    (profile_msm_kernel.py). Scratch + manual DMA removes both. Point
    ops use the v2 field core (Karatsuba conv + wide-dot REDC,
    pallas_curve._p_madd_pure2)."""
    ncoord = 2 if affine else 3
    pt = refs[:ncoord]
    dig = refs[ncoord]
    if carry:
        bxi, byi, bzi = refs[ncoord + 1:ncoord + 4]
        tabs = tuple(r[:] for r in refs[ncoord + 4:ncoord + 8])
        (ox, oy, oz, sx, sy, sz, sems) = refs[ncoord + 8:]
    else:
        dx, dy = refs[ncoord + 1:ncoord + 3]
        tabs = tuple(r[:] for r in refs[ncoord + 3:ncoord + 7])
        (ox, oy, oz, sx, sy, sz, sems) = refs[ncoord + 7:]
    w = pl.program_id(0)
    k = pl.program_id(1)
    nd, rd = tabs[2], tabs[3]
    zero = pt[0][0] & np.uint32(0)             # (ND, bt)

    @pl.when(k == 0)
    def _init():
        if carry:
            cx = pltpu.make_async_copy(bxi.at[w], sx, sems.at[0])
            cy = pltpu.make_async_copy(byi.at[w], sy, sems.at[1])
            cz = pltpu.make_async_copy(bzi.at[w], sz, sems.at[2])
            cx.start()
            cy.start()
            cz.start()
            cx.wait()
            cy.wait()
            cz.wait()
        else:
            # blinding points are affine (z = R); (ND, 1) columns broadcast
            z8 = zero.astype(jnp.uint8)
            for s in range(nb):
                sx[s] = dx[s].astype(jnp.uint8) + z8
                sy[s] = dy[s].astype(jnp.uint8) + z8
                sz[s] = rd.astype(jnp.uint8) + z8

    v = _digit_row(dig[0], k)                  # (1, bt) i32
    slot = (v & (_SIGN - 1)).astype(jnp.uint32)
    sgn = v >> 8
    cur = _scratch_read(sx, sy, sz, slot, nb)
    yneg = _sub_mod(zero, pt[1][0], nd)        # valid points have y != 0
    ysel = jnp.where(sgn != 0, yneg, pt[1][0])
    if affine:
        new = pc._p_madd_pure2(cur, (pt[0][0], ysel), tabs, friendly)
    else:
        new = pc._p_add_pure2(cur, (pt[0][0], ysel, pt[2][0]), tabs,
                              friendly)
    # slot 0 (zero digit, padding, infinity input) writes nowhere
    _scratch_write(sx, sy, sz, slot, new, nb)

    @pl.when(k == steps - 1)
    def _flush():
        cx = pltpu.make_async_copy(sx, ox.at[w], sems.at[0])
        cy = pltpu.make_async_copy(sy, oy.at[w], sems.at[1])
        cz = pltpu.make_async_copy(sz, oz.at[w], sems.at[2])
        cx.start()
        cy.start()
        cz.start()
        cx.wait()
        cy.wait()
        cz.wait()


def _scratch_read(sx, sy, sz, slot, nb):
    """nb-way bucket read. Scratch holds byte digits as u8 (coordinates
    are 0..255 per limb row), so each of the 3*nb masked ORs moves a
    quarter of the u32 data — the select machinery is the per-step cost
    that made nb=128 lose at u32 (770k vs 851k pts/s at c=7/u32)."""
    out = []
    for buf in (sx, sy, sz):
        acc = jnp.zeros_like(buf[0])
        for s in range(1, nb + 1):
            acc = acc | jnp.where(slot == s, buf[s - 1], np.uint8(0))
        out.append(acc.astype(jnp.uint32))
    return tuple(out)


def _scratch_write(sx, sy, sz, slot, new, nb):
    n8 = tuple(v.astype(jnp.uint8) for v in new)
    for s in range(1, nb + 1):
        m = slot == s
        sx[s - 1] = jnp.where(m, n8[0], sx[s - 1])
        sy[s - 1] = jnp.where(m, n8[1], sy[s - 1])
        sz[s - 1] = jnp.where(m, n8[2], sz[s - 1])


@lru_cache(maxsize=None)
def _pip_call(nwin: int, steps: int, bt: int, nb: int, affine: bool,
              carry: bool, friendly: bool, interpret: bool):
    pspec = pl.BlockSpec((1, ND, bt), lambda w, k: (k, 0, 0),
                         memory_space=pltpu.VMEM)
    dspec = pl.BlockSpec((1, 8, bt), lambda w, k: (w, k // 8, 0),
                         memory_space=pltpu.VMEM)
    bspec = pl.BlockSpec((nb, ND, 1), lambda w, k: (0, 0, 0),
                         memory_space=pltpu.VMEM)
    hspec = pl.BlockSpec(memory_space=pltpu.ANY)   # bucket state: HBM
    out = jax.ShapeDtypeStruct((nwin, nb, ND, bt), jnp.uint8)
    ncoord = 2 if affine else 3
    nin = ncoord + 1
    if carry:
        in_specs = [pspec] * ncoord + [dspec] + [hspec] * 3 \
            + pc._table_specs2()
        aliases = {nin: 0, nin + 1: 1, nin + 2: 2}
    else:
        in_specs = [pspec] * ncoord + [dspec] + [bspec] * 2 \
            + pc._table_specs2()
        aliases = {}
    return jax.jit(pl.pallas_call(
        partial(_pip_kernel_v3, steps, nb, affine, carry, friendly),
        grid=(nwin, steps),
        in_specs=in_specs,
        out_specs=(hspec,) * 3,
        out_shape=(out,) * 3,
        input_output_aliases=aliases,
        scratch_shapes=[pltpu.VMEM((nb, ND, bt), jnp.uint8)] * 3
        + [pltpu.SemaphoreType.DMA((3,))],
        interpret=interpret,
    ))


# --- suffix-run bucket fold --------------------------------------------------

def _fold_kernel(nb, friendly, px, py, pz, w__ref, w_ref, nd_ref, rd_ref,
                 ox, oy, oz, rx, ry, rz, ax, ay, az):
    """Suffix-run bucket fold sum_s s*B_s (ecmult_impl.h:700-714) as its
    own tiny Pallas kernel: grid (nwin, nb) walks s = nb..1 with TWO
    point-add instances in the program (run += B_s; acc += run) — an
    unrolled in-kernel chain or an XLA limb-path fold are 10-40x slower
    to compile / execute respectively. Buckets are blinded (never
    infinity, never equal except negligibly), so the adds are the raw
    v2 full-add formula (12M + 4S)."""
    k = pl.program_id(1)
    tabs = (w__ref[:], w_ref[:], nd_ref[:], rd_ref[:])
    tile = (px[0, 0].astype(jnp.uint32), py[0, 0].astype(jnp.uint32),
            pz[0, 0].astype(jnp.uint32))

    @pl.when(k == 0)
    def _init():
        rx[...], ry[...], rz[...] = tile
        ax[...], ay[...], az[...] = tile

    @pl.when(k > 0)
    def _step():
        run = pc._p_add_pure2((rx[...], ry[...], rz[...]), tile, tabs,
                              friendly)
        rx[...], ry[...], rz[...] = run
        acc = pc._p_add_pure2((ax[...], ay[...], az[...]), run, tabs,
                              friendly)
        ax[...], ay[...], az[...] = acc

    @pl.when(k == nb - 1)
    def _out():
        ox[0], oy[0], oz[0] = ax[...], ay[...], az[...]


@lru_cache(maxsize=None)
def _fold_call(nwin: int, bt: int, nb: int, friendly: bool,
               interpret: bool):
    bspec = pl.BlockSpec((1, 1, ND, bt), lambda w, k: (w, nb - 1 - k, 0, 0),
                         memory_space=pltpu.VMEM)
    ospec = pl.BlockSpec((1, ND, bt), lambda w, k: (w, 0, 0),
                         memory_space=pltpu.VMEM)
    out = jax.ShapeDtypeStruct((nwin, ND, bt), jnp.uint32)
    scratch = [pltpu.VMEM((ND, bt), jnp.uint32)] * 6
    return jax.jit(pl.pallas_call(
        partial(_fold_kernel, nb, friendly),
        grid=(nwin, nb),
        in_specs=[bspec] * 3 + pc._table_specs2(),
        out_specs=(ospec,) * 3,
        out_shape=(out,) * 3,
        scratch_shapes=scratch,
        interpret=interpret,
    ))


@lru_cache(maxsize=None)
def _reduce_fn(ops: CurveOps, nwin: int, bt: int):
    """(nwin, bt, 16) folded per-window lane partials -> (nwin, 16)
    window totals: log2(bt) lane-halving adds (full-cased XLA limb adds:
    lane partials CAN legitimately collide)."""
    @jax.jit
    def f(x, y, z):
        p = JacPoint(x, y, z)
        w = bt
        while w > 1:
            w //= 2
            p = ops.add(jnp, JacPoint(p.x[:, :w], p.y[:, :w], p.z[:, :w]),
                        JacPoint(p.x[:, w:2 * w], p.y[:, w:2 * w],
                                 p.z[:, w:2 * w]))
        # per-window totals; the Horner over windows runs on the HOST
        # (chained tiny point ops on (1,16) tensors cost ~35 ms each as
        # a device loop — seconds of fixed latency vs ~10 ms of exact
        # host bigint arithmetic)
        return p.x[:, 0], p.y[:, 0], p.z[:, 0]
    return f


# --- on-device operand prep ---------------------------------------------------

def _nwin_for(nbits: int, c: int) -> tuple[int, bool]:
    """Window count + `tight` flag. W = ceil(nbits/c) raw windows; when
    c*W > nbits STRICTLY, the top raw window spans < c-1 scalar bits, so
    top_raw + carry_in <= 2^(nbits - c*(W-1)) <= nb — the top window can
    absorb the signed-digit carry UNSIGNED and the extra carry window
    disappears (nwin = W instead of W+1; at c=7 that is 37 windows
    instead of 38 for 256-bit scalars — a free ~2.7% off the bucket
    phase). Sound for ANY scalar < 2^nbits."""
    W = -(-nbits // c)
    tight = c * W > nbits
    return (W, True) if tight else (W + 1, False)


@lru_cache(maxsize=None)
def _prep_fn(npad: int, steps: int, bt: int, c: int, nwin: int,
             affine: bool, tight: bool = False):
    """One jitted function: point limb->digit tiling + signed window
    extraction. Inputs may be u16 (host-shipped, half traffic) or u32
    (device-resident). With `tight`, the top window is unsigned and
    absorbs the carry (see _nwin_for)."""
    nb = 1 << (c - 1)
    nwin_u = nwin if tight else nwin - 1
    steps8 = -(-steps // 8) * 8

    @jax.jit
    def f(x, y, z, sc):
        x = x.astype(jnp.uint32)
        y = y.astype(jnp.uint32)
        z = z.astype(jnp.uint32)
        sc = sc.astype(jnp.uint32)

        def tiles(climbs):
            d = mxu.digits_from_limbs(jnp, climbs)        # (npad, 32)
            return d.reshape(steps, bt, ND).transpose(0, 2, 1)

        px, py = tiles(x), tiles(y)
        # infinity inputs (z = 0) and padding lanes get digit 0 -> never
        # added (the kernels then never see an infinity operand)
        valid = (jnp.sum(z.astype(jnp.int32), axis=1) != 0)

        scp = jnp.concatenate([sc, jnp.zeros((npad, 1), jnp.uint32)], 1)
        vals = []
        for w in range(nwin_u):
            b = w * c
            i, s = b // 16, b % 16
            raw = scp[:, i] >> np.uint32(s)
            if s + c > 16:
                raw = raw | (scp[:, i + 1] << np.uint32(16 - s))
            vals.append(raw & np.uint32((1 << c) - 1))
        vals = jnp.stack(vals).astype(jnp.int32)          # (nwin_u, npad)

        def step(carry, v):
            v = v + carry
            big = (v > nb).astype(jnp.int32)
            return big, v - 2 * nb * big

        if tight:
            # signed-convert windows 0..W-2; the top window takes the
            # carry unsigned (top_raw + carry <= nb by _nwin_for)
            carry, digs = jax.lax.scan(
                step, jnp.zeros((npad,), jnp.int32), vals[:-1])
            digs = jnp.concatenate([digs, (vals[-1] + carry)[None]], 0)
        else:
            carry, digs = jax.lax.scan(
                step, jnp.zeros((npad,), jnp.int32), vals)
            digs = jnp.concatenate([digs, carry[None]], 0)  # (nwin, npad)
        pack = (jnp.abs(digs)
                | jnp.where(digs < 0, _SIGN, 0)).astype(jnp.uint32)
        pack = pack * valid[None].astype(jnp.uint32)
        pack = pack.reshape(nwin, steps, bt)
        if steps8 != steps:
            pack = jnp.pad(pack, ((0, 0), (0, steps8 - steps), (0, 0)))
        if affine:
            return px, py, pack
        return px, py, tiles(z), pack
    return f


_FLEET_SEED: int | None = None


def share_fleet_seed() -> int:
    """Broadcast a full 256-bit blinding seed from process 0 to the
    fleet. MUST be called at a known synchronization point (mesh/
    distributed init — parallel/multihost.init_distributed does) BEFORE
    any MSM: running the collective lazily inside _blinding's lru_cache
    meant processes reaching their first MSM at different points in the
    collective order could mismatch/deadlock, and the old 64-bit seed
    weakened the negligible-collision argument."""
    global _FLEET_SEED
    if _FLEET_SEED is None:
        from jax.experimental import multihost_utils
        ent = np.frombuffer(os.urandom(32), np.uint64)
        ent = np.asarray(multihost_utils.broadcast_one_to_all(ent))
        _FLEET_SEED = int.from_bytes(ent.tobytes(), "little")
    return _FLEET_SEED


@lru_cache(maxsize=None)
def _blinding(ops: CurveOps, nb: int):
    """Per-slot blinding points D_s = d_s * G (secret d_s) as (nb, ND, 1)
    Montgomery digit columns, plus sum_s s*d_s mod n for the exact
    correction."""
    seed = os.environ.get("PORLA_MSM_BLIND_SEED")
    if seed is not None:
        rng = random.Random(int(seed))
    elif jax.process_count() > 1:
        # multi-process SPMD: every process must derive the SAME blinding
        # (host protocol state replicates across the fleet); the seed was
        # broadcast eagerly at distributed-init time
        rng = random.Random(share_fleet_seed())
    else:
        rng = random.SystemRandom()
    cv = ops.curve
    d = [rng.randrange(1, cv.n) for _ in range(nb)]
    jp = ops.from_affine(np, [ecc.mul(cv, cv.g, k) for k in d])

    def cols(climbs):
        dg = np.asarray(mxu.digits_from_limbs(np, np.asarray(climbs)))
        return jnp.asarray(dg.reshape(nb, ND, 1))

    tsum = sum((s + 1) * d[s] for s in range(nb)) % cv.n
    return cols(jp.x), cols(jp.y), tsum


# --- policy -------------------------------------------------------------------

def choose_c(n: int, nbits: int = 256) -> int:
    """Window width from point count — the measured policy table from
    the on-chip sweeps (MSM_r03.json, MSM_r04.json): c=4 below 2^15
    points (per-window fold and fixed dispatch overheads dominate,
    fewer buckets win), c=7 above (bucket adds dominate; with the u8
    bucket scratch the 64-way select stays cheap and nb=64 fits VMEM
    at bt=512 with room to spare). Mirrors the reference's
    bucket-window table (ecmult_impl.h:573-597). Round-4 sweep at
    2^20 BN254 device-resident (pts/s): c6 857k, c7 917k, c8 902k,
    all bt=512 u8; bt=256/1024 lose at every c."""
    env = os.environ.get("PORLA_MSM_C")
    if env:
        return int(env)
    if n < (1 << 15):
        return 4
    # round-5 sweep (BN254 2^20 device-resident, tight windows): c=7
    # 940.2k, c=8@nbits=254 949.3k pts/s; c=9 needs nb=256 which
    # collides with the bit-8 sign flag AND models slower (select
    # doubles, per-step fixed cost doesn't shrink). Prefer c=8 when its
    # window count is tight at this scalar bound (254-bit Fr scalars),
    # else c=7 (tight at 256: 37 windows vs 38).
    return 8 if _nwin_for(nbits, 8)[1] else 7


_DEFAULT_BT = int(os.environ.get("PORLA_MSM_BT", "512"))


# --- entry point --------------------------------------------------------------

def _is_affine_host(ops: CurveOps, z) -> bool:
    z = np.asarray(z)
    r = L.int_to_limbs(ops.fp.r % ops.fp.n).astype(np.uint32)
    zr = (z == r[None]).all(axis=1)
    zi = (z == 0).all(axis=1)
    return bool((zr | zi).all())


def pippenger_msm(ops: CurveOps, points: JacPoint, scalars,
                  nbits: int = 256, bt: int | None = None,
                  c: int | None = None, affine: bool | None = None,
                  interpret: bool | None = None) -> JacPoint:
    """sum_i scalars[i] * points[i] -> JacPoint (1,).

    points: (N, 16) limb JacPoint (Montgomery), host or device
    resident; scalars: (N, 16) standard-form limbs, < 2^nbits. Pads N
    with (infinity, 0) lanes. `affine` marks inputs with z in {0, R}
    (auto-detected for host arrays) and selects the 11-mul mixed-add
    kernel."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    N = points.x.shape[0]
    if bt is None:
        bt = _DEFAULT_BT
    # bt must be a power of two: the lane-halving reduce drops lanes
    # otherwise (a 384-lane tile at N=300 silently lost lane 2's partial)
    bt = min(bt, max(128, 1 << (N - 1).bit_length()))
    assert bt & (bt - 1) == 0, f"lane width must be a power of two: {bt}"
    if c is None:
        c = choose_c(N, nbits)
    nb = 1 << (c - 1)
    steps = -(-N // bt)
    npad = steps * bt
    nwin, tight = _nwin_for(nbits, c)

    if affine is None:
        affine = (isinstance(points.z, np.ndarray)
                  and _is_affine_host(ops, points.z))

    dx, dy, tsum = _blinding(ops, nb)
    friendly = pc._mont_friendly(ops.fp)
    tabs = [jnp.asarray(t) for t in pc._curve_tables2(ops.fp)]
    csteps = int(os.environ.get("PORLA_MSM_CHUNK", "256"))
    host_in = isinstance(points.x, np.ndarray)
    pipelined = host_in and steps > csteps

    if pipelined:
        # chunk the host->device stream so transfers of chunk i+1
        # overlap the bucket kernel of chunk i (bucket state carried
        # through aliased in/out HBM buffers)
        nchunks = -(-steps // csteps)
        steps = nchunks * csteps
        npad = steps * bt

        def pad16(a):
            a = np.asarray(a)
            if a.shape[0] != npad:
                a = np.concatenate(
                    [a, np.zeros((npad - a.shape[0], 16), a.dtype)], 0)
            return a.astype(np.uint16)

        xh, yh, zh = pad16(points.x), pad16(points.y), pad16(points.z)
        sh = pad16(scalars)
        cpts = csteps * bt
        prep = _prep_fn(cpts, csteps, bt, c, nwin, affine, tight)
        first = _pip_call(nwin, csteps, bt, nb, affine, False, friendly,
                          interpret)
        carry = _pip_call(nwin, csteps, bt, nb, affine, True, friendly,
                          interpret)
        bufs = None
        for ci in range(nchunks):
            sl = slice(ci * cpts, (ci + 1) * cpts)
            prepped = prep(jnp.asarray(xh[sl]), jnp.asarray(yh[sl]),
                           jnp.asarray(zh[sl]), jnp.asarray(sh[sl]))
            if bufs is None:
                bufs = first(*prepped, dx, dy, *tabs)
            else:
                bufs = carry(*prepped, *bufs, *tabs)
        sx, sy, sz = bufs
    else:
        def ship(a):
            a = np.asarray(a)
            if a.shape[0] != npad:
                a = np.concatenate(
                    [a, np.zeros((npad - a.shape[0], 16), a.dtype)], 0)
            return jnp.asarray(a.astype(np.uint16))

        if host_in:
            x, y, z = ship(points.x), ship(points.y), ship(points.z)
        else:
            x = pc._pad_to_dev(points.x, npad)
            y = pc._pad_to_dev(points.y, npad)
            z = pc._pad_to_dev(points.z, npad)
        sc = (ship(scalars) if isinstance(scalars, np.ndarray)
              else pc._pad_to_dev(jnp.asarray(scalars), npad))

        prepped = _prep_fn(npad, steps, bt, c, nwin, affine,
                           tight)(x, y, z, sc)
        fn = _pip_call(nwin, steps, bt, nb, affine, False, friendly,
                       interpret)
        sx, sy, sz = fn(*prepped, dx, dy, *tabs)

    fx, fy, fz = _fold_call(nwin, bt, nb, friendly, interpret)(
        sx, sy, sz, *tabs)
    lx = mxu.limbs_from_digits(jnp, jnp.moveaxis(fx, 1, 2))
    ly = mxu.limbs_from_digits(jnp, jnp.moveaxis(fy, 1, 2))
    lz = mxu.limbs_from_digits(jnp, jnp.moveaxis(fz, 1, 2))
    wx, wy, wz = _reduce_fn(ops, nwin, bt)(lx, ly, lz)

    # host Horner: total = sum_w 2^(c w) * W_w (MSB-first, exact
    # bigints), then subtract the known blinding contribution
    from porla_tpu.curves import kernels as ck
    host = ck.fetch_many([wx, wy, wz])
    wins = ops.to_affine(JacPoint(*host))
    cv = ops.curve
    acc = wins[nwin - 1]
    for wi in range(nwin - 2, -1, -1):
        acc = ecc.add(cv, ecc.mul(cv, acc, 1 << c), wins[wi])
    wsum = sum(1 << (c * w) for w in range(nwin)) % cv.n
    kappa = (bt * wsum * tsum) % cv.n
    acc = ecc.add(cv, acc, ecc.neg(cv, ecc.mul(cv, cv.g, kappa)))
    out = ops.from_affine(np, [acc])
    return JacPoint(np.asarray(out.x), np.asarray(out.y),
                    np.asarray(out.z))
