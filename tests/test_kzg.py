"""BN254 pairing + KZG commitments: correctness and scheme semantics."""

import random

from porla_tpu.commit import kzg
from porla_tpu.fields.constants import BN254_R as FR
from porla_tpu.golden import bn254_pairing as bp
from porla_tpu.golden import ecc

rng = random.Random(7)


def test_pairing_bilinearity():
    e1 = bp.pairing(bp.G2, bp.G1)
    assert e1 != bp.FP12_ONE
    assert bp.fp12_pow(e1, bp.R) == bp.FP12_ONE
    a, b = 31337, 271828
    lhs = bp.pairing(bp.g2_mul(bp.G2, b), ecc.mul(ecc.BN254, bp.G1, a))
    assert lhs == bp.fp12_pow(e1, a * b % bp.R)


def test_srs_roundtrip():
    srs = kzg.KzgSrs.from_tau(12345, 8)
    srs2 = kzg.KzgSrs.from_bytes(srs.to_bytes())
    assert srs2.g1_powers == srs.g1_powers
    assert srs2.g2_tau == srs.g2_tau


def test_commit_msm_matches_eval():
    tau = int.from_bytes(bytes(range(16)), "big")
    srs = kzg.KzgSrs.from_tau(tau, 8)
    coeffs = [rng.randrange(FR) for _ in range(8)]
    # server MSM commit == [f(tau)]G1 (alpha = 1)
    assert kzg.commit_msm(srs, coeffs) == kzg.commit_eval(tau, 1, coeffs)


def test_open_verify_roundtrip():
    srs = kzg.KzgSrs.from_tau(987654321, 8)
    coeffs = [rng.randrange(FR) for _ in range(8)]
    C = kzg.commit_msm(srs, coeffs)
    z = 424242
    H, claimed = kzg.open_at(srs, coeffs, z)
    assert claimed == kzg.poly_eval(coeffs, z)
    assert kzg.verify(srs, C, H, z, claimed)
    # wrong claimed value rejected
    assert not kzg.verify(srs, C, H, z, (claimed + 1) % FR)
    # wrong point rejected
    assert not kzg.verify(srs, C, H, z + 1, claimed)
