"""Audit-plan derivation: determinism, sampling shapes, challenge indices
(the logic both parties must agree on exactly; reference
Client.hpp:682-744 / Server.hpp:596-732)."""

import numpy as np

from porla_tpu.config import NUM_CHECK_AUDIT
from porla_tpu.protocol import auditing, points_io


def test_plan_deterministic():
    seed = bytes(range(16))
    p1 = auditing.build_audit_plan(seed, 5, 16, 5)
    p2 = auditing.build_audit_plan(seed, 5, 16, 5)
    assert [(s.level, s.is_x, s.index, s.coeff) for s in p1.samples] == \
        [(s.level, s.is_x, s.index, s.coeff) for s in p2.samples]
    assert (p1.ipa_challenge, p1.kzg_challenge) == \
        (p2.ipa_challenge, p2.kzg_challenge)


def test_occupied_levels():
    # write_step 5 = 0b101 -> levels 0 and 2, plus the top level always
    assert auditing.occupied_levels(5, 16, 5) == [0, 2, 4]
    assert auditing.occupied_levels(16, 16, 5) == [4]  # full epoch
    assert auditing.occupied_levels(0, 16, 5) == [4]


def test_sample_counts_small_and_large_levels():
    # small levels (2l <= 128) contribute all 2l slots; large ones 128
    plan = auditing.build_audit_plan(b"\x07" * 16, 5, 1 << 10, 11)
    by_level = {}
    for s in plan.samples:
        by_level[s.level] = by_level.get(s.level, 0) + 1
    assert by_level[0] == 2 and by_level[2] == 8
    assert by_level[10] == NUM_CHECK_AUDIT  # 2l = 2048 > 128
    assert plan.n_points == sum(by_level.values())


def test_coeff_abs_semantics():
    # coefficients follow |int32| with INT32_MIN -> 2^31 (C abs + cast)
    assert auditing._abs_i32(-5) == 5
    assert auditing._abs_i32(-(1 << 31)) == 1 << 31
    assert auditing._abs_i32((1 << 31) - 1) == (1 << 31) - 1


def test_masked_write_step():
    assert auditing.masked_write_step(0b10110, 1) == 0b10110
    assert auditing.masked_write_step(0b10110, 2) == 0b10100
    assert auditing.masked_write_step(7, 3) == 0


def test_points_io_roundtrip_both_curves():
    from porla_tpu.curves.instances import bn254, secp256k1
    from porla_tpu.golden import ecc

    for ops, cv in ((secp256k1(), ecc.SECP256K1), (bn254(), ecc.BN254)):
        pts = [ecc.mul(cv, cv.g, k) for k in (1, 7, 123)] + [ecc.INF]
        jac = ops.from_affine(np, pts)
        wire = points_io.points_to_bytes(jac, ops)
        assert len(wire) == 4 * points_io.MAC_WIRE_SIZE
        back = points_io.points_from_bytes(wire, ops=ops)
        assert ops.to_affine(back) == pts
