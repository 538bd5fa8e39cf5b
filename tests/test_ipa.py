"""Unit tests for the Bulletproof inner-product argument.

Round-trips prove/verify on the actual generator derivation and checks
the proof layout and failure behavior (reference inner_product_prove
Server.hpp:2279-2452 / inner_product_verify Client.hpp:1464-1633).
"""

import random

import pytest

from porla_tpu.commit import ipa, pedersen
from porla_tpu.config import NUM_CHUNKS
from porla_tpu.curves import kernels as ck
from porla_tpu.fields import constants as C
from porla_tpu.golden import ecc

# compile-heavy: nightly tier (see pyproject markers)
pytestmark = pytest.mark.slow

Q = C.SECP_N


def _setup():
    gens, u, affine = pedersen.ipa_generators()
    rng = random.Random(1234)
    a = [rng.getrandbits(248) for _ in range(NUM_CHUNKS)]
    v = rng.getrandbits(31)
    b = []
    x = v
    for _ in range(NUM_CHUNKS):
        b.append(x)
        x = (x * x) % Q
    return gens, u, affine, a, b


def _commitment(affine, a):
    cv = ecc.SECP256K1
    acc = None
    for g, s in zip(affine, a):
        acc = ecc.add(cv, acc, ecc.mul(cv, g, s % Q))
    return acc


def test_prove_verify_roundtrip():
    gens, u, affine, a, b = _setup()
    proof = ipa.prove(a, b, gens, u)
    # layout: 32 + 6*(33+33) + 4*32 = 556 bytes (Server.hpp:856)
    assert len(proof) == 556
    ipa.verify(_commitment(affine, a), proof, gens, u)


def test_verify_rejects_wrong_commitment():
    gens, u, affine, a, b = _setup()
    proof = ipa.prove(a, b, gens, u)
    bad = list(a)
    bad[17] += 1
    with pytest.raises(ipa.IpaVerificationError):
        ipa.verify(_commitment(affine, bad), proof, gens, u)


def test_verify_rejects_tampered_proof():
    gens, u, affine, a, b = _setup()
    proof = bytearray(ipa.prove(a, b, gens, u))
    proof[40] ^= 1  # inside the first L point
    with pytest.raises((ipa.IpaVerificationError, ValueError)):
        ipa.verify(_commitment(affine, a), bytes(proof), gens, u)
