"""Known-answer and self-consistency tests for the byte-exact crypto layer."""

import hashlib

import numpy as np

from porla_tpu.crypto import aes, shas, testrand
from porla_tpu.golden import ecc


def test_sha256_matches_hashlib():
    for msg in [b"", b"abc", b"x" * 63, b"y" * 64, b"z" * 1000]:
        assert shas.sha256(msg) == hashlib.sha256(msg).digest()


def test_sha256_incremental():
    h = shas.Sha256()
    h.write(b"hello ")
    h.write(b"world" * 30)
    assert h.finalize() == hashlib.sha256(b"hello " + b"world" * 30).digest()


def test_sha256_write_after_finalize_semantics():
    # After finalize, state is zeroed but the byte counter keeps running
    # (libsecp256k1 hash_impl.h:151-168). Simulate independently.
    h = shas.Sha256()
    h.write(b"A" * 32)
    first = h.finalize()
    assert first == hashlib.sha256(b"A" * 32).digest()
    # state now: s=0, bytes=64 (padded). Writing 64 more bytes must compress
    # them against an all-zero chaining value.
    h.write(b"B" * 64)
    second = h.finalize()

    # independent simulation
    state = [0] * 8
    shas._compress(state, b"B" * 64)
    # finalize pad: bytes=128 -> pad 56 bytes + 8-byte length(1024 bits)
    import struct
    pad = b"\x80" + b"\x00" * 55 + struct.pack(">II", 0, 128 * 8)
    shas._compress(state, pad)
    assert second == struct.pack(">8I", *state)


def test_rfc6979_seeded_known_vector():
    # Self-consistency + determinism of the seeded DRBG
    rng1 = shas.Rfc6979HmacSha256(b"\x00" * 16)
    rng2 = shas.Rfc6979HmacSha256(b"\x00" * 16)
    a, b = rng1.generate(32), rng1.generate(32)
    assert a != b
    assert rng2.generate(32) == a


def test_testrand_zero_state_deterministic():
    t1, t2 = testrand.TestRand(), testrand.TestRand()
    assert t1.rand256() == t2.rand256()
    assert [t1.bits(7) for _ in range(20)] == [t2.bits(7) for _ in range(20)]


def test_derived_generators_on_curve_and_stable():
    gens, u = testrand.derive_ipa_generators(8)
    assert len(gens) == 8
    for pt in gens + [u]:
        assert ecc.is_on_curve(ecc.SECP256K1, pt)
    gens2, u2 = testrand.derive_ipa_generators(8)
    assert gens == gens2 and u == u2
    # h equals generators[0]: both sides draw from a zero-state RNG
    assert testrand.derive_h_mac() == gens[0]


def test_prg_determinism_and_counter():
    seed = bytes(range(16))
    p1 = aes.Prg(seed)
    p2 = aes.Prg(seed)
    assert p1.random_data(100) == p2.random_data(100)
    ints = aes.Prg(seed).random_ints(25)
    assert ints.dtype == np.int32 and ints.shape == (25,)
    # same stream as byte API
    raw = aes.Prg(seed).random_data(100)
    assert np.frombuffer(raw, dtype="<i4").tolist() == ints.tolist()


def test_prg_reseed_id_xor():
    seed = bytes(range(16))
    base = aes.Prg(seed, 0).random_block(1)
    other = aes.Prg(seed, 1).random_block(1)
    assert base != other
    # id=0 means key == seed: cross-check against raw AES-ECB
    manual = aes._ecb_encrypt(seed, b"\x00" * 16)
    assert base == manual


def test_mac_prf_batch_matches_single():
    prf = aes.MacPrf(bytes(range(16)))
    recs = [(0, 5, 7), (1, 2, 3), (3, 9, 1 << 40)]
    batch = prf.prf_scalars_ipa(recs)
    single = [prf.prf_scalar_ipa(*r) for r in recs]
    assert batch == single
    assert all(0 <= s < (1 << 128) for s in batch)
