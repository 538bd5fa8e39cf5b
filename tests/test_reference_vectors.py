"""Ground-truth parity against the REFERENCE's own C code.

tests/vectors/secp256k1_kat.json is produced by tools/refvec/run.sh,
which compiles the vendored libsecp256k1 exactly as the reference
binaries do (reference porla/Utils/utils.h:6-10) and dumps: the unseeded
test-RNG stream, the 129 IPA generator points, compressed serializations,
ecmult / ecmult_const / ecmult_multi_var results, and the Fiat-Shamir
transcript's write-after-finalize SHA-256 quirk. These vectors pin our
Python golden models (and through them every device kernel, which is
tested bit-exact against the golden models) to the reference
implementation rather than to our own reading of it.
"""

import json
import os

import pytest

from porla_tpu.crypto import testrand
from porla_tpu.crypto.shas import Sha256
from porla_tpu.golden import ecc

VEC = os.path.join(os.path.dirname(__file__), "vectors",
                   "secp256k1_kat.json")


@pytest.fixture(scope="module")
def kat():
    with open(VEC) as f:
        return json.load(f)


def _pt(hexpair):
    return (int(hexpair[0], 16), int(hexpair[1], 16))


def test_testrand_stream(kat):
    tr = testrand.TestRand()
    want = kat["testrand_stream"]
    assert [tr.rand256().hex() for _ in range(4)] == want["rand256"]
    assert [tr.rand256_test().hex() for _ in range(4)] == \
        want["rand256_test"]
    assert [tr.bits(5) for _ in range(8)] == want["bits5"]


def test_generator_derivation(kat):
    gens, u = testrand.derive_ipa_generators(128)
    want = [_pt(g) for g in kat["generators"]]
    assert gens == want[:128]
    assert u == want[128]
    # the client's h equals the first zero-state draw (Client.hpp:153)
    assert testrand.derive_h_mac() == want[0]


def test_compressed_serialization(kat):
    gens, _ = testrand.derive_ipa_generators(128)
    for i, want in enumerate(kat["compressed"]):
        assert ecc.secp_serialize_compressed(gens[i]).hex() == want
        assert ecc.secp_parse_compressed(bytes.fromhex(want)) == gens[i]


def test_ecmult(kat):
    cv = ecc.SECP256K1
    gens, _ = testrand.derive_ipa_generators(128)
    g = (cv.gx, cv.gy)
    for i, want in enumerate(kat["ecmult"]):
        na = (0x0123456789ABCDEF * (i + 1)) & ((1 << 64) - 1)
        ng = (0xFEDCBA9876543210 * (i + 1)) & ((1 << 64) - 1)
        got = ecc.add(cv, ecc.mul(cv, gens[i], na), ecc.mul(cv, g, ng))
        assert got == _pt(want)


def test_ecmult_const(kat):
    cv = ecc.SECP256K1
    gens, _ = testrand.derive_ipa_generators(128)
    for i, want in enumerate(kat["ecmult_const"]):
        k = (0x1111111111111111 * (i + 1)) & ((1 << 64) - 1)
        assert ecc.mul(cv, gens[i], k) == _pt(want)


def _multi_scalars(n):
    return [((i + 1) * 0x9E3779B97F4A7C15) & ((1 << 64) - 1)
            for i in range(n)]


def test_ecmult_multi_golden(kat):
    """Both the Strauss (<88 points) and Pippenger regimes of
    ecmult_multi_var (ecmult_impl.h:55, 814-861) against the golden MSM."""
    cv = ecc.SECP256K1
    gens, _ = testrand.derive_ipa_generators(128)
    for case in kat["ecmult_multi"]:
        n = case["n"]
        pts = [gens[i % 128] for i in range(n)]
        got = ecc.msm(cv, pts, _multi_scalars(n))
        assert got == _pt(case["result"])


def test_ecmult_multi_device_kernel(kat):
    """The batched device MSM (curves/kernels.msm on this backend)
    reproduces the reference's ecmult_multi_var result."""
    import numpy as np

    from porla_tpu.curves import kernels as ck
    from porla_tpu.curves.instances import secp256k1
    from porla_tpu.fields import limbs as L

    ops = secp256k1()
    case = kat["ecmult_multi"][0]  # n=64: small enough for CPU CI
    n = case["n"]
    gens, _ = testrand.derive_ipa_generators(128)
    pts = ops.from_affine(np, [gens[i % 128] for i in range(n)])
    sc = L.ints_to_limbs(_multi_scalars(n))
    out = ck.msm(ops, ck.to_device(pts), sc, nbits=64)
    assert ops.to_affine(ck.to_host(out))[0] == _pt(case["result"])


def test_sha_transcript_quirk(kat):
    """ONE sha256 object: finalize, keep writing (Server.hpp:2306-2432;
    finalize zeroes the chaining state but the byte counter keeps
    advancing, hash_impl.h:151-168)."""
    sha = Sha256()
    sha.write(bytes([0xAA] * 32)).write(bytes([0x55] * 32))
    out1 = sha.finalize()
    sha.write(out1).write(bytes([0x55] * 32))
    out2 = sha.finalize()
    sha.write(out2)
    out3 = sha.finalize()
    assert [out1.hex(), out2.hex(), out3.hex()] == kat["sha_transcript"]
