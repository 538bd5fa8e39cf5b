"""Point wire serialization for MAC blocks.

The reference ships raw in-memory `secp256k1_gej` structs (field elements
in 5x52-limb representation) as its MAC wire format (utils.h:68,
COMMITMENT_MAC_SIZE). That layout is an implementation artifact of
libsecp256k1; our equivalent MAC wire format is the canonical Jacobian
triple (X, Y, Z) as 3 x 32 little-endian bytes (96 bytes). Infinity is
Z = 0. Both endpoints of this framework use this format; the
externally-checkable audit-reply points stay in the reference's 33-byte
compressed format (protocol/server.py).
"""

from __future__ import annotations

import numpy as np

from porla_tpu.curves.instances import secp256k1
from porla_tpu.curves.weierstrass import JacPoint
from porla_tpu.fields import limbs

MAC_WIRE_SIZE = 96


def points_to_bytes(pts: JacPoint, ops=None) -> bytes:
    """Batched JacPoint (N,) -> N*96 bytes. Converts Montgomery ->
    standard form on the host (exact)."""
    from porla_tpu.curves import kernels as ck
    fp = (ops or secp256k1()).fp
    p = fp.n
    rinv = pow(fp.r, -1, p)
    hx, hy, hz = ck.fetch_many([pts.x, pts.y, pts.z])
    xs = limbs.limbs_to_ints(hx)
    ys = limbs.limbs_to_ints(hy)
    zs = limbs.limbs_to_ints(hz)
    out = bytearray()
    for x, y, z in zip(xs, ys, zs):
        out += ((x * rinv) % p).to_bytes(32, "little")
        out += ((y * rinv) % p).to_bytes(32, "little")
        out += ((z * rinv) % p).to_bytes(32, "little")
    return bytes(out)


def points_from_bytes(data: bytes, xp=np, ops=None) -> JacPoint:
    """N*96 bytes -> batched JacPoint (N,) in Montgomery form."""
    assert len(data) % MAC_WIRE_SIZE == 0
    n = len(data) // MAC_WIRE_SIZE
    fp = (ops or secp256k1()).fp
    xs, ys, zs = [], [], []
    for i in range(n):
        rec = data[i * 96:(i + 1) * 96]
        xs.append(fp.to_mont_int(int.from_bytes(rec[0:32], "little")))
        ys.append(fp.to_mont_int(int.from_bytes(rec[32:64], "little")))
        zs.append(fp.to_mont_int(int.from_bytes(rec[64:96], "little")))
    return JacPoint(xp.asarray(limbs.ints_to_limbs(xs)),
                    xp.asarray(limbs.ints_to_limbs(ys)),
                    xp.asarray(limbs.ints_to_limbs(zs)))
