"""ICC erasure recovery: encode a hierarchical-log level, erase half the
codeword columns, recover exactly — the capability the reference only
demonstrates in MATLAB (icc/main.m)."""

import random

import pytest

from porla_tpu.fields import constants as C
from porla_tpu.ntt import engine, icc

rng = random.Random(77)
P = C.FFT_PRIME


def _level_codeword(ctx, data, write_times):
    """Level content per the reference fold semantics: X = fold(B),
    Y = fold(wt_i * B_i)."""
    x = icc.fold_transform(ctx, data)
    twisted = [
        (d * pow(ctx.w, engine.reverse_bits(t % ctx.n, ctx.height - 1), P)) % P
        for d, t in zip(data, write_times)]
    y = icc.fold_transform(ctx, twisted)
    return x + y


def test_recover_from_erasures():
    n = 16
    m = 8  # level 3 of a 16-block database
    ctx = engine.NttContext(n, "ipa", hardened=True)
    write_times = list(range(8, 8 + m))  # consecutive insertions
    data = [rng.randrange(P) for _ in range(m)]
    code = _level_codeword(ctx, data, write_times)

    for trial in range(5):
        erased = set(rng.sample(range(2 * m), m))
        surviving = {j: [code[j]] for j in range(2 * m) if j not in erased}
        recovered = icc.recover_level(ctx, write_times, surviving)
        assert [r[0] for r in recovered] == data


def test_recover_multichunk():
    n = 8
    m = 4
    nchunks = 3
    ctx = engine.NttContext(n, "ipa", hardened=True)
    write_times = [1, 2, 3, 4]
    data = [[rng.randrange(P) for _ in range(nchunks)] for _ in range(m)]
    codes = [_level_codeword(ctx, [data[i][c] for i in range(m)], write_times)
             for c in range(nchunks)]
    keep = sorted(rng.sample(range(2 * m), m))
    surviving = {j: [codes[c][j] for c in range(nchunks)] for j in keep}
    recovered = icc.recover_level(ctx, write_times, surviving)
    assert recovered == data


def test_epoch_rebuild_pairs_are_singular():
    """At an epoch CRebuild every Y column is wt*X (same scalar), so a
    survivor set made of X_j/Y_j pairs cannot recover — the solver must
    say so rather than return garbage."""
    n = 8
    m = 8
    ctx = engine.NttContext(n, "ipa")
    write_times = [0] * m  # epoch rebuild: identical twist
    data = [rng.randrange(P) for _ in range(m)]
    code = _level_codeword(ctx, data, write_times)
    surviving = {j: [code[j]] for j in [0, 8, 1, 9, 2, 10, 3, 11]}
    with pytest.raises(ValueError, match="singular"):
        icc.recover_level(ctx, write_times, surviving)
    # but the X half alone always recovers
    surviving = {j: [code[j]] for j in range(m)}
    assert [r[0] for r in icc.recover_level(ctx, write_times, surviving)] \
        == data


def test_hardened_mode_is_mds():
    """With a true primitive root (hardened mode), the level code is
    Reed-Solomon: EVERY m-subset of the 2m columns recovers. With the
    reference's non-primitive generator most subsets are singular — a
    latent reference bug documented in fields/constants.py."""
    n = 16
    m = 8
    write_times = list(range(8, 16))
    data = [rng.randrange(P) for _ in range(m)]

    ctx_h = engine.NttContext(n, "ipa", hardened=True)
    code = _level_codeword(ctx_h, data, write_times)
    for trial in range(20):
        keep = sorted(rng.sample(range(2 * m), m))
        surviving = {j: [code[j]] for j in keep}
        rec = icc.recover_level(ctx_h, write_times, surviving)
        assert [r[0] for r in rec] == data, f"hardened not MDS at {keep}"

    # reference mode: same experiment must hit singular subsets
    ctx_r = engine.NttContext(n, "ipa", hardened=False)
    code_r = _level_codeword(ctx_r, data, write_times)
    failures = 0
    for trial in range(20):
        keep = sorted(rng.sample(range(2 * m), m))
        surviving = {j: [code_r[j]] for j in keep}
        try:
            rec = icc.recover_level(ctx_r, write_times, surviving)
            assert [r[0] for r in rec] == data
        except ValueError:
            failures += 1
    assert failures > 0, "expected singular subsets with the reference root"
