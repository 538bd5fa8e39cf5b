"""KZG polynomial commitments over BN254 (the reference's ENABLE_KZG
scheme, which it delegates to gnark-crypto via cgo — porla/main.go).

- SRS: [tau^i]G1 for i < size, plus G2 and [tau]G2 (gnark kzg.NewSRS,
  main.go:42-68). In this protocol the CLIENT generates tau from TAU_KEY
  (a trusted setup by the data owner, main.go:31-40) — so the client can
  commit with one scalar multiplication (f(tau)*alpha*G1, main.go:70-89)
  while the server commits via the SRS MSM (main.go:103-116).
- Commit/open MSMs run as batched device kernels over the bn254 curve
  ops; quotient polynomials by synthetic division on the host; pairing
  verification via porla_tpu.golden.bn254_pairing.

Serialization: G1 points use the gnark 64-byte uncompressed marshal
(X||Y big-endian; golden/ecc.py), Fr scalars 32-byte big-endian — the
reference's wire sizes (main.go:118-175).
"""

from __future__ import annotations


import numpy as np

from porla_tpu.curves import kernels as ck
from porla_tpu.curves.instances import bn254
from porla_tpu.fields import limbs
from porla_tpu.fields.constants import BN254_R as FR
from porla_tpu.golden import bn254_pairing as bp
from porla_tpu.golden import ecc


class KzgSrs:
    """Structured reference string of given size."""

    def __init__(self, g1_powers, g2_tau):
        self.g1_powers = g1_powers            # list of affine G1 points
        self.g2 = bp.G2
        self.g2_tau = g2_tau                  # [tau] G2 (Fp2 affine)
        ops = bn254()
        self.g1_dev = ops.from_affine(np, g1_powers)

    @classmethod
    def from_tau(cls, tau: int, size: int) -> "KzgSrs":
        tau %= FR
        pows = []
        acc = 1
        for _ in range(size):
            pows.append(acc)
            acc = (acc * tau) % FR
        g1_powers = [ecc.mul(ecc.BN254, bp.G1, p) for p in pows]
        return cls(g1_powers, bp.g2_mul(bp.G2, tau))

    # --- wire format -------------------------------------------------------

    def to_bytes(self) -> bytes:
        out = bytearray()
        out += len(self.g1_powers).to_bytes(4, "little")
        for pt in self.g1_powers:
            out += ecc.bn254_marshal(pt)
        for c in (self.g2_tau[0][0], self.g2_tau[0][1],
                  self.g2_tau[1][0], self.g2_tau[1][1]):
            out += c.to_bytes(32, "big")
        return bytes(out)

    @classmethod
    def from_bytes(cls, data: bytes) -> "KzgSrs":
        n = int.from_bytes(data[:4], "little")
        off = 4
        g1 = []
        for _ in range(n):
            g1.append(ecc.bn254_unmarshal(data[off:off + 64]))
            off += 64
        cs = [int.from_bytes(data[off + 32 * i:off + 32 * (i + 1)], "big")
              for i in range(4)]
        return cls(g1, ((cs[0], cs[1]), (cs[2], cs[3])))


def commit_msm(srs: KzgSrs, coeffs: list[int]):
    """Server-side commitment sum_i f_i * [tau^i]G1 via the device MSM
    (reference compute_digest_from_srs, main.go:103-116). The SRS is a
    fixed base set, so on TPU this rides the windowed-table kernel."""
    from porla_tpu.curves import pallas_curve
    assert len(coeffs) <= len(srs.g1_powers)
    sc = limbs.ints_to_limbs([c % FR for c in coeffs]
                             + [0] * (len(srs.g1_powers) - len(coeffs)))
    ops = bn254()
    if pallas_curve.use_pallas():
        tbl = pallas_curve.fb_table_for(ops, srs.g1_dev)
        parts = pallas_curve.fb_scalar_mul(tbl, sc, keep_pad=True)
        out = ck.tree_sum(ops, parts)
    else:
        out = ck.msm(ops, ck.to_device(srs.g1_dev), sc, nbits=256)
    return ops.to_affine(ck.to_host(out))[0]


def commit_eval(tau: int, alpha: int, coeffs: list[int]):
    """Client-side commitment f(tau)*alpha*G1 — one scalar mult
    (reference compute_digest, main.go:70-89)."""
    acc = 0
    for c in reversed(coeffs):
        acc = (acc * tau + c) % FR
    return ecc.mul(ecc.BN254, bp.G1, (acc * alpha) % FR)


def poly_eval(coeffs: list[int], z: int) -> int:
    acc = 0
    for c in reversed(coeffs):
        acc = (acc * z + c) % FR
    return acc


def open_at(srs: KzgSrs, coeffs: list[int], z: int):
    """KZG opening proof at z (reference create_proof, main.go:153-175):
    returns (H = [q(tau)]G1 with q = (f - f(z))/(x - z), claimed = f(z))."""
    z %= FR
    claimed = poly_eval(coeffs, z)
    # synthetic division: f(x) - claimed = (x - z) q(x)
    q = [0] * (len(coeffs) - 1)
    carry = 0
    for i in range(len(coeffs) - 1, 0, -1):
        carry = (coeffs[i] + carry * z) % FR
        q[i - 1] = carry
    H = commit_msm(srs, q) if q else None
    return H, claimed


def verify(srs: KzgSrs, commitment, H, z: int, claimed: int) -> bool:
    """e(C - [claimed]G1, G2) == e(H, [tau - z]G2)
    (gnark kzg.Verify semantics, main.go:177-193)."""
    cv = ecc.BN254
    lhs = ecc.add(cv, commitment,
                  ecc.neg(cv, ecc.mul(cv, bp.G1, claimed % FR)))
    g2_tau_minus_z = bp.g2_add(srs.g2_tau,
                               bp.g2_neg(bp.g2_mul(srs.g2, z % FR)))
    nH = ecc.neg(cv, H) if H is not None else None
    return bp.pairing_check([(lhs, srs.g2), (nH, g2_tau_minus_z)])
