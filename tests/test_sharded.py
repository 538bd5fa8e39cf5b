"""Fast multi-chip sharding tests on a 4-device virtual CPU mesh.

Covers every collective pattern of porla_tpu/parallel/sharded.py in
seconds (small shapes, short scalars) so sharding correctness does not
depend on the full dryrun_multichip protocol run:

- distributed NTT with a ppermute exchange stage (the sharded analogue
  of the reference's CRebuild thread split, Server.hpp:1564-1686),
- the sharded MAC-mirror point butterfly stage (local + exchange),
- tensor-parallel Pedersen commitments (all-gather combine),
- data-parallel audit MSM.
"""

import jax
import numpy as np
import pytest

from porla_tpu.crypto import testrand
from porla_tpu.curves.instances import secp256k1
from porla_tpu.curves.weierstrass import JacPoint
from porla_tpu.fields import limbs
from porla_tpu.golden import ecc
from porla_tpu.ntt.engine import _MOD_P, CrtArray, NttContext, encode_stages
from porla_tpu.parallel import sharded

import jax.numpy as jnp

NBITS = 32  # short scalars keep the point-op graphs quick to compile


@pytest.fixture(scope="module")
def mesh():
    devs = jax.devices()
    if len(devs) < 4:
        pytest.skip("needs 4 virtual devices (see conftest.py)")
    return sharded.make_mesh(devs[:4])  # blocks=2, chunks=2


def test_sharded_encode_matches_stage_loop(mesh):
    n, nchunks = 16, 4
    ctx = NttContext(n, "ipa")
    rng = np.random.default_rng(3)
    arr = rng.integers(0, 1 << 16, (n, nchunks, 16), dtype=np.uint32)
    tables = sharded.stage_twiddle_tables(ctx, _MOD_P)
    enc = sharded.sharded_encode_fn(ctx, mesh, _MOD_P)
    out = np.asarray(enc(arr, *[jnp.asarray(t) for t in tables]))
    golden = encode_stages(np, ctx, CrtArray(arr, arr)).p
    assert np.array_equal(out, golden)


def test_sharded_point_stage_local_and_exchange(mesh):
    ops = secp256k1()
    n = 8  # 4 per shard at blocks=2: stages 1-2 local, stage 3 exchange
    ctx = NttContext(n, "ipa")
    rng = np.random.default_rng(5)
    pts = [ecc.mul(ecc.SECP256K1, ecc.SECP256K1.g, int(k))
           for k in rng.integers(1, 1 << 20, n)]
    jp = ops.from_affine(np, pts)
    tw_std = sharded.stage_twiddle_tables_std(ctx)
    fns = sharded.sharded_point_stage_fn(ctx, mesh, ops, nbits=NBITS)
    px, py, pz = jp.x, jp.y, jp.z
    for s in (2, 3):  # one local (m=4 <= n_loc=4) + one exchange stage
        m, m2 = 1 << s, 1 << (s - 1)
        # truncate twiddles to NBITS (zero the high limbs): the stage fn
        # only consumes the low NBITS bits, and the golden check below
        # uses the same truncated value
        twl = np.array(tw_std[s - 1], np.uint32)
        twl[:, NBITS // 16:] = 0
        got = fns[s](px, py, pz, jnp.asarray(twl))
        gx, gy, gz = (np.asarray(c) for c in got)
        # golden butterfly on the host model
        cur = ecc.SECP256K1
        aff = ops.to_affine(JacPoint(np.asarray(px), np.asarray(py),
                                     np.asarray(pz)))
        want = [None] * n
        for blk in range(n // m):
            for j in range(m2):
                iu, it = blk * m + j, blk * m + m2 + j
                k = limbs.limbs_to_int(twl[iu])
                t = ecc.mul(cur, aff[it], k)
                want[iu] = ecc.add(cur, aff[iu], t)
                want[it] = ecc.add(cur, aff[iu], ecc.neg(cur, t))
        got_aff = ops.to_affine(JacPoint(gx, gy, gz))
        assert got_aff == want, f"stage {s} mismatch"
        px, py, pz = jnp.asarray(gx), jnp.asarray(gy), jnp.asarray(gz)


def test_sharded_commit_matches_golden(mesh):
    ops = secp256k1()
    nchunks = 4
    gens_aff, _ = testrand.derive_ipa_generators(nchunks)
    gens = ops.from_affine(jnp, gens_aff)
    rng = np.random.default_rng(7)
    nblocks = 4
    scalars = rng.integers(0, 1 << 16, (nblocks, nchunks, 16),
                           dtype=np.uint32)
    commit = sharded.sharded_commit_fn(mesh, nbits=NBITS)
    res = commit(gens.x, gens.y, gens.z, jnp.asarray(scalars))
    got = ops.to_affine(JacPoint(*[np.asarray(r) for r in res]))
    for b in range(nblocks):
        ks = [limbs.limbs_to_int(scalars[b, c]) & ((1 << NBITS) - 1)
              for c in range(nchunks)]
        assert got[b] == ecc.msm(ecc.SECP256K1, gens_aff, ks)


def test_sharded_msm_matches_golden(mesh):
    ops = secp256k1()
    rng = np.random.default_rng(9)
    npts = 8
    pts_aff = [ecc.mul(ecc.SECP256K1, ecc.SECP256K1.g, int(k) + 2)
               for k in rng.integers(1, 1 << 20, npts)]
    pts = ops.from_affine(jnp, pts_aff)
    sc = rng.integers(0, 1 << 16, (npts, 16), dtype=np.uint32)
    msm = sharded.sharded_msm_fn(mesh, nbits=NBITS)
    res = msm(pts.x, pts.y, pts.z, jnp.asarray(sc))
    got = ops.to_affine(JacPoint(*[np.asarray(r) for r in res]))[0]
    ks = [limbs.limbs_to_int(sc[i]) & ((1 << NBITS) - 1)
          for i in range(npts)]
    assert got == ecc.msm(ecc.SECP256K1, pts_aff, ks)


def test_sharded_pippenger_msm_fast(mesh):
    """Fast-tier trim of the nightly test below: the SAME production
    kernel chain (per-shard Pallas Pippenger + log-depth window combine,
    interpret mode on CPU) at small shapes and short scalars, so the
    production multi-chip MSM path is exercised by CI and not only by
    the nightly tier (round-4 weak point #5)."""
    ops = secp256k1()
    rng = np.random.default_rng(12)
    npts = 64
    base = [ecc.mul(ecc.SECP256K1, ecc.SECP256K1.g, int(k) + 2)
            for k in rng.integers(1, 1 << 20, 8)]
    pts_aff = [base[i % 8] for i in range(npts)]
    pts = ops.from_affine(jnp, pts_aff)
    ks = [int(k) for k in rng.integers(0, 1 << 16, npts)]
    sc = limbs.ints_to_limbs(ks)
    # 16-bit scalars: halves the unrolled interpret-mode fold graph vs
    # the 32-bit tier-wide NBITS (compile is the whole cost here)
    fn, finish = sharded.sharded_pippenger_msm_fn(
        mesh, ops, nbits=16, n_local=npts // mesh.shape["blocks"])
    out = finish(*fn(pts.x, pts.y, pts.z, jnp.asarray(sc)))
    got = ops.to_affine(out)[0]
    assert got == ecc.msm(ecc.SECP256K1, pts_aff, ks)


@pytest.mark.slow
def test_sharded_pippenger_msm_matches_golden(mesh):
    """Nightly (~4 min interpret-mode): the perf-grade DP MSM (per-shard
    Pallas Pippenger + log-depth window combine) against the exact host
    MSM, full 256-bit scalars."""
    ops = secp256k1()
    rng = np.random.default_rng(11)
    npts = 512  # 256/shard on the 2-block mesh
    base = [ecc.mul(ecc.SECP256K1, ecc.SECP256K1.g, int(k) + 2)
            for k in rng.integers(1, 1 << 20, 8)]
    pts_aff = [base[i % 8] for i in range(npts)]
    pts = ops.from_affine(jnp, pts_aff)
    ks = [int.from_bytes(rng.bytes(32), "little") % ecc.SECP256K1.n
          for _ in range(npts)]
    sc = limbs.ints_to_limbs(ks)
    fn, finish = sharded.sharded_pippenger_msm_fn(
        mesh, ops, nbits=256, n_local=npts // mesh.shape["blocks"])
    out = finish(*fn(pts.x, pts.y, pts.z, jnp.asarray(sc)))
    got = ops.to_affine(out)[0]
    assert got == ecc.msm(ecc.SECP256K1, pts_aff, ks)
