"""Batched short-Weierstrass (a=0) elliptic-curve arithmetic on limb tensors.

Jacobian coordinates (X, Y, Z), each a (…, 16) uint32 limb tensor in
Montgomery form; the point at infinity is Z == 0. All formulas are
branchless — degenerate cases (infinity operands, doubling, inverse pair)
are resolved with `where`-selects — so every operation vectorizes over
arbitrary batch shapes on the TPU VPU.

This replaces libsecp256k1's group_impl.h/ecmult*.h roles in the reference
(per-point CPU loops; reference porla/Utils/secp256k1_lib/group_impl.h:336,
ecmult_impl.h:335) with batch kernels: the protocol's "MAC mirror" applies
the same butterfly to thousands of points at once.
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np

from porla_tpu.fields import limbs as L
from porla_tpu.fields import mont
from porla_tpu.fields.mont import Modulus
from porla_tpu.golden import ecc


class JacPoint(NamedTuple):
    """Batched Jacobian point; limbs in Montgomery form."""
    x: "np.ndarray"  # (…, 16) uint32
    y: "np.ndarray"
    z: "np.ndarray"

    @property
    def batch_shape(self):
        return self.x.shape[:-1]


class CurveOps:
    """Batched group operations for y^2 = x^3 + b over F_p."""

    def __init__(self, curve: ecc.Curve, name: str = ""):
        self.curve = curve
        self.fp = Modulus(curve.p, name + "_fp")
        self.order = Modulus(curve.n, name + "_order")

    # --- constructors ------------------------------------------------------

    def infinity(self, xp, batch_shape=()):
        one = mont.const_limbs(xp, L.zeros(batch_shape, np), self.fp.r_limbs)
        zero = L.zeros(batch_shape, xp)
        return JacPoint(one, one, zero)

    def from_affine(self, xp, points) -> JacPoint:
        """List of golden-model affine points (or INF) -> batched JacPoint."""
        xs, ys, zs = [], [], []
        for pt in points:
            if pt is ecc.INF:
                xs.append(1)
                ys.append(1)
                zs.append(0)
            else:
                xs.append(pt[0])
                ys.append(pt[1])
                zs.append(1)
        to_m = self.fp.to_mont_int
        return JacPoint(
            xp.asarray(L.ints_to_limbs([to_m(v) for v in xs])),
            xp.asarray(L.ints_to_limbs([to_m(v) for v in ys])),
            xp.asarray(L.ints_to_limbs([to_m(v) for v in zs])))

    def to_affine(self, pt: JacPoint):
        """Batched JacPoint -> list of golden-model affine points (host)."""
        xs = L.limbs_to_ints(np.asarray(pt.x).reshape(-1, L.NLIMBS))
        ys = L.limbs_to_ints(np.asarray(pt.y).reshape(-1, L.NLIMBS))
        zs = L.limbs_to_ints(np.asarray(pt.z).reshape(-1, L.NLIMBS))
        p = self.curve.p
        rinv = pow(self.fp.r, -1, p)
        out = []
        for x, y, z in zip(xs, ys, zs):
            x, y, z = (x * rinv) % p, (y * rinv) % p, (z * rinv) % p
            if z == 0:
                out.append(ecc.INF)
                continue
            zi = pow(z, -1, p)
            zi2 = zi * zi % p
            out.append((x * zi2 % p, y * zi2 * zi % p))
        return out

    # --- field helpers -----------------------------------------------------

    def _mul(self, xp, a, b):
        return mont.mont_mul(xp, a, b, self.fp)

    def _add(self, xp, a, b):
        return mont.add_mod(xp, a, b, self.fp)

    def _sub(self, xp, a, b):
        return mont.sub_mod(xp, a, b, self.fp)

    def _dbl_f(self, xp, a):
        return mont.add_mod(xp, a, a, self.fp)

    # --- group ops ---------------------------------------------------------

    def neg(self, xp, p: JacPoint) -> JacPoint:
        return JacPoint(p.x, mont.neg_mod(xp, p.y, self.fp), p.z)

    def double(self, xp, p: JacPoint) -> JacPoint:
        """dbl-2009-l (a=0): 7 field muls. Maps infinity -> infinity and
        y=0 -> infinity automatically (Z3 = 2YZ)."""
        A = self._mul(xp, p.x, p.x)
        B = self._mul(xp, p.y, p.y)
        C = self._mul(xp, B, B)
        xb = self._add(xp, p.x, B)
        D = self._sub(xp, self._sub(xp, self._mul(xp, xb, xb), A), C)
        D = self._dbl_f(xp, D)
        E = self._add(xp, self._dbl_f(xp, A), A)
        F = self._mul(xp, E, E)
        X3 = self._sub(xp, F, self._dbl_f(xp, D))
        C8 = self._dbl_f(xp, self._dbl_f(xp, self._dbl_f(xp, C)))
        Y3 = self._sub(xp, self._mul(xp, E, self._sub(xp, D, X3)), C8)
        Z3 = self._dbl_f(xp, self._mul(xp, p.y, p.z))
        return JacPoint(X3, Y3, Z3)

    def add(self, xp, p1: JacPoint, p2: JacPoint) -> JacPoint:
        """General Jacobian addition (add-2007-bl) with branchless handling
        of infinity / doubling / inverse-pair cases (~16+7 muls)."""
        Z1Z1 = self._mul(xp, p1.z, p1.z)
        Z2Z2 = self._mul(xp, p2.z, p2.z)
        U1 = self._mul(xp, p1.x, Z2Z2)
        U2 = self._mul(xp, p2.x, Z1Z1)
        S1 = self._mul(xp, self._mul(xp, p1.y, p2.z), Z2Z2)
        S2 = self._mul(xp, self._mul(xp, p2.y, p1.z), Z1Z1)
        H = self._sub(xp, U2, U1)
        R = self._sub(xp, S2, S1)

        HH = self._mul(xp, H, H)
        HHH = self._mul(xp, H, HH)
        V = self._mul(xp, U1, HH)
        RR = self._mul(xp, R, R)
        X3 = self._sub(xp, self._sub(xp, RR, HHH), self._dbl_f(xp, V))
        Y3 = self._sub(xp, self._mul(xp, R, self._sub(xp, V, X3)),
                       self._mul(xp, S1, HHH))
        Z3 = self._mul(xp, self._mul(xp, p1.z, p2.z), H)
        raw = JacPoint(X3, Y3, Z3)

        p1_inf = mont.is_zero(xp, p1.z)
        p2_inf = mont.is_zero(xp, p2.z)
        h_zero = mont.eq(xp, U1, U2)
        r_zero = mont.eq(xp, S1, S2)
        both = ~p1_inf & ~p2_inf
        dbl_case = both & h_zero & r_zero
        inf_case = both & h_zero & ~r_zero

        dbl = self.double(xp, p1)
        inf = self.infinity(xp, ())
        inf = JacPoint(
            xp.broadcast_to(inf.x, raw.x.shape),
            xp.broadcast_to(inf.y, raw.y.shape),
            xp.broadcast_to(inf.z, raw.z.shape))

        out = _select_point(xp, dbl_case, dbl, raw)
        out = _select_point(xp, inf_case, inf, out)
        out = _select_point(xp, p2_inf, p1, out)
        out = _select_point(xp, p1_inf, p2, out)
        return out

    def select(self, xp, mask, a: JacPoint, b: JacPoint) -> JacPoint:
        return _select_point(xp, mask, a, b)

    def scalar_mul(self, xp, p: JacPoint, scalars, nbits: int = 256) -> JacPoint:
        """Batched double-and-add (MSB first): scalars is (…, 16)
        standard-form limbs, treated as raw 256-bit integers — values >= the
        group order wrap in the group exactly like secp256k1_ecmult does in
        the reference (raw limbs are never reduced; Client.hpp:180-192).

        `nbits` bounds the scalar bit-length when the caller knows it is
        small (e.g. 128-bit PRF scalars, 31-bit audit coefficients) — the
        loop shortens accordingly.
        """
        acc0 = self.infinity(xp, ())
        acc = JacPoint(
            xp.broadcast_to(acc0.x, p.x.shape),
            xp.broadcast_to(acc0.y, p.y.shape),
            xp.broadcast_to(acc0.z, p.z.shape))

        def step(acc: JacPoint, bit) -> JacPoint:
            acc = self.double(xp, acc)
            added = self.add(xp, acc, p)
            return _select_point(xp, bit == 1, added, acc)

        if xp is np:
            for i in range(nbits):
                b = nbits - 1 - i
                bit = (scalars[..., b // 16] >> np.uint32(b % 16)) & np.uint32(1)
                acc = step(acc, bit)
            return acc

        import jax

        # (nbits, …) bit tensor, MSB first, so the loop body indexes with a
        # traced iteration counter without per-limb gathers.
        shifts = np.arange(16, dtype=np.uint32)
        bits = (scalars[..., None] >> shifts) & xp.uint32(1)  # (…, 16, 16)
        bits = bits.reshape(scalars.shape[:-1] + (256,))
        bits = xp.moveaxis(bits, -1, 0)[:nbits][::-1]  # (nbits, …) MSB first

        def body(i, acc_t):
            bit = jax.lax.dynamic_index_in_dim(bits, i, axis=0, keepdims=False)
            return tuple(step(JacPoint(*acc_t), bit))

        res = jax.lax.fori_loop(0, nbits, body, tuple(acc))
        return JacPoint(*res)

    def tree_sum(self, xp, p: JacPoint, axis: int = 0) -> JacPoint:
        """Point-add reduction along `axis` via log-depth pairwise adds."""
        assert axis == 0, "reduce leading axis; move it first"
        n = p.x.shape[0]
        while n > 1:
            half = n // 2
            if n % 2:
                lo = JacPoint(p.x[:half], p.y[:half], p.z[:half])
                hi = JacPoint(p.x[half:2 * half], p.y[half:2 * half],
                              p.z[half:2 * half])
                rest = JacPoint(p.x[2 * half:], p.y[2 * half:], p.z[2 * half:])
                s = self.add(xp, lo, hi)
                p = JacPoint(
                    xp.concatenate([s.x, rest.x], axis=0),
                    xp.concatenate([s.y, rest.y], axis=0),
                    xp.concatenate([s.z, rest.z], axis=0))
                n = half + 1
            else:
                lo = JacPoint(p.x[:half], p.y[:half], p.z[:half])
                hi = JacPoint(p.x[half:], p.y[half:], p.z[half:])
                p = self.add(xp, lo, hi)
                n = half
        return p

    def msm(self, xp, points: JacPoint, scalars) -> JacPoint:
        """Multi-scalar multiplication over the leading axis:
        sum_i scalars[i] * points[i]. scalars: (N, …, 16) standard form."""
        parts = self.scalar_mul(xp, points, scalars)
        return self.tree_sum(xp, parts, axis=0)


def _select_point(xp, mask, a: JacPoint, b: JacPoint) -> JacPoint:
    m = mask[..., None]
    return JacPoint(xp.where(m, a.x, b.x),
                    xp.where(m, a.y, b.y),
                    xp.where(m, a.z, b.z))
