"""Device-path erasure recovery (icc_device) vs the host golden model
(icc.recover_level) and the exact codeword construction."""

import random

import numpy as np
import pytest

from porla_tpu.fields import constants as C
from porla_tpu.ntt import engine, icc, icc_device

P = C.FFT_PRIME


def _codeword(ctx, write_times, blocks):
    """[X | Y] columns of a level holding `blocks` (chunk lists) written
    at `write_times` — via the exact host fold."""
    m = len(write_times)
    nch = len(blocks[0])
    xs, ys = [], []
    for c in range(nch):
        col = [blocks[i][c] for i in range(m)]
        x = icc.fold_transform(ctx, col)
        wt = [pow(ctx.w,
                  engine.reverse_bits(write_times[i] % ctx.n,
                                      ctx.height - 1), P) * col[i] % P
              for i in range(m)]
        y = icc.fold_transform(ctx, wt)
        xs.append(x)
        ys.append(y)
    cols = {}
    for j in range(m):
        cols[j] = [xs[c][j] for c in range(nch)]
        cols[m + j] = [ys[c][j] for c in range(nch)]
    return cols


def _random_case(rng, ctx, m, n_erase, nch=3):
    write_times = [rng.randrange(ctx.n) for _ in range(m)]
    blocks = [[rng.randrange(P) for _ in range(nch)] for _ in range(m)]
    cols = _codeword(ctx, write_times, blocks)
    erased = rng.sample(range(2 * m), n_erase)
    surviving = {j: v for j, v in cols.items() if j not in erased}
    return write_times, blocks, surviving


def test_fold_unfold_roundtrip():
    import jax.numpy as jnp
    rng = random.Random(1)
    ctx = engine.NttContext(64, "ipa", hardened=True)
    m = 16
    mod = engine._MOD_P
    vals = [[rng.randrange(P) for _ in range(2)] for _ in range(m)]
    from porla_tpu.fields import limbs as L
    arr = jnp.asarray(np.stack([L.ints_to_limbs(v) for v in vals]))
    tabs = icc_device._stage_twiddles(ctx, m, mod, inverse=False)
    itabs = icc_device._stage_twiddles(ctx, m, mod, inverse=True)
    f = icc_device._fold_dev(jnp, arr, tabs, mod)
    # forward matches the exact host fold per chunk column
    for c in range(2):
        want = icc.fold_transform(ctx, [vals[i][c] for i in range(m)])
        got = [int(x) for x in L.limbs_to_ints(np.asarray(f)[:, c])]
        assert got == want
    # inverse roundtrips
    b = icc_device._unfold_dev(jnp, f, itabs, mod)
    got = np.asarray(b)
    for i in range(m):
        assert [int(x) for x in L.limbs_to_ints(got[i])] == vals[i]


@pytest.mark.parametrize("m,n_erase", [(8, 4), (16, 9), (16, 16)])
def test_recover_matches_host(m, n_erase):
    rng = random.Random(m * 100 + n_erase)
    ctx = engine.NttContext(64, "ipa", hardened=True)
    wt, blocks, surviving = _random_case(rng, ctx, m, n_erase)
    want = icc.recover_level(ctx, wt, surviving)
    got = icc_device.recover_level_device(ctx, wt, surviving)
    assert got == want
    assert got == [[v % P for v in b] for b in blocks]


def test_recover_mixed_xy_erasures():
    """Erasures hitting both a block's X and Y columns (as long as
    total <= m and enough Y rows survive)."""
    rng = random.Random(7)
    ctx = engine.NttContext(64, "ipa", hardened=True)
    m = 16
    wt = [rng.randrange(ctx.n) for _ in range(m)]
    blocks = [[rng.randrange(P)] for _ in range(m)]
    cols = _codeword(ctx, wt, blocks)
    # erase X and Y of blocks 0..3 plus X of 4..7: 12 <= m columns
    erased = set(range(4)) | {m + j for j in range(4)} | set(range(4, 8))
    surviving = {j: v for j, v in cols.items() if j not in erased}
    got = icc_device.recover_level_device(ctx, wt, surviving)
    assert got == [[v % P for v in b] for b in blocks]


def test_unrecoverable_epoch_pairs():
    """Epoch-CRebuild levels (all write times equal) have Y = wt*X:
    erasing a column pair (j, m+j) is singular and must be diagnosed,
    not silently mis-solved."""
    rng = random.Random(9)
    ctx = engine.NttContext(64, "ipa", hardened=True)
    m = 8
    wt = [5] * m
    blocks = [[rng.randrange(P)] for _ in range(m)]
    cols = _codeword(ctx, wt, blocks)
    erased = {0, m + 0}
    surviving = {j: v for j, v in cols.items() if j not in erased}
    with pytest.raises(ValueError, match="singular|unrecoverable"):
        icc_device.recover_level_device(ctx, wt, surviving)


def test_recover_q_lane_crt():
    """Both CRT lanes recover with the same code path; combined they
    reconstruct full block values mod LCM."""
    rng = random.Random(11)
    ctx = engine.NttContext(64, "ipa", hardened=True)
    mod_q = ctx.mod_q
    m = 8
    lcm = P * mod_q.n
    wt = [rng.randrange(ctx.n) for _ in range(m)]
    blocks_full = [[rng.randrange(1 << 256)] for _ in range(m)]

    def codeword_mod(mod):
        xs, ys = [], []
        col = [blocks_full[i][0] % mod for i in range(m)]
        return col

    # q-lane codeword via the same exact construction mod q
    def fold_mod_q(values):
        x = [v % mod_q.n for v in values]
        length = 1
        while length < m:
            v = pow(ctx.w, ctx.n // length, P) % mod_q.n
            out = [0] * m
            for blk in range(0, m, 2 * length):
                for i in range(length):
                    vi = pow(pow(ctx.w, ctx.n // length, P), i, P) % mod_q.n
                    t = (vi * x[blk + length + i]) % mod_q.n
                    out[blk + i] = (x[blk + i] + t) % mod_q.n
                    out[blk + length + i] = (x[blk + i] - t) % mod_q.n
            x = out
            length <<= 1
        return x

    cols_q = {}
    colv = [blocks_full[i][0] % mod_q.n for i in range(m)]
    xq = fold_mod_q(colv)
    wtv = [pow(ctx.w, engine.reverse_bits(wt[i] % ctx.n, ctx.height - 1),
               P) % mod_q.n * colv[i] % mod_q.n for i in range(m)]
    yq = fold_mod_q(wtv)
    for j in range(m):
        cols_q[j] = [xq[j]]
        cols_q[m + j] = [yq[j]]

    cols_p = _codeword(ctx, wt, [[b[0] % P] for b in blocks_full])
    erased = {1, 3, m + 5}
    surv_p = {j: v for j, v in cols_p.items() if j not in erased}
    surv_q = {j: v for j, v in cols_q.items() if j not in erased}
    rec_p = icc_device.recover_level_device(ctx, wt, surv_p)
    rec_q = icc_device.recover_level_device(ctx, wt, surv_q, mod=mod_q)
    # CRT combine
    inv = pow(P, -1, mod_q.n)
    for i in range(m):
        a, b = rec_p[i][0], rec_q[i][0]
        v = (a + ((b - a) * inv % mod_q.n) * P) % lcm
        assert v == blocks_full[i][0] % lcm
