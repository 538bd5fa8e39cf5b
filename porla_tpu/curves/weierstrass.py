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
        """dbl-2009-l (a=0), with independent multiplies batched into
        stacked calls (4 mul invocations instead of 7). Maps infinity ->
        infinity and y=0 -> infinity automatically (Z3 = 2YZ)."""
        X, Y, Z = p.x, p.y, p.z
        s1 = self._mul(xp, xp.stack([X, Y]), xp.stack([X, Y]))
        A, B = s1[0], s1[1]
        xb = self._add(xp, X, B)
        s2 = self._mul(xp, xp.stack([B, xb, Y]), xp.stack([B, xb, Z]))
        C, xb2, YZ = s2[0], s2[1], s2[2]
        D = self._dbl_f(xp, self._sub(xp, self._sub(xp, xb2, A), C))
        E = self._add(xp, self._dbl_f(xp, A), A)
        F = self._mul(xp, E, E)
        X3 = self._sub(xp, F, self._dbl_f(xp, D))
        C8 = self._dbl_f(xp, self._dbl_f(xp, self._dbl_f(xp, C)))
        Y3 = self._sub(xp, self._mul(xp, E, self._sub(xp, D, X3)), C8)
        Z3 = self._dbl_f(xp, YZ)
        return JacPoint(X3, Y3, Z3)

    def add(self, xp, p1: JacPoint, p2: JacPoint) -> JacPoint:
        """General Jacobian addition (add-2007-bl) with branchless handling
        of infinity / doubling / inverse-pair cases. Independent multiplies
        are batched into stacked calls (5 mul invocations + the embedded
        double instead of 16+7 separate ones)."""
        X1, Y1, Z1, X2, Y2, Z2 = xp.broadcast_arrays(
            p1.x, p1.y, p1.z, p2.x, p2.y, p2.z)
        p1 = JacPoint(X1, Y1, Z1)
        p2 = JacPoint(X2, Y2, Z2)
        s1 = self._mul(xp, xp.stack([Z1, Z2, Y1, Y2]),
                       xp.stack([Z1, Z2, Z2, Z1]))
        Z1Z1, Z2Z2, A1, A2 = s1[0], s1[1], s1[2], s1[3]
        s2 = self._mul(xp, xp.stack([X1, X2, A1, A2]),
                       xp.stack([Z2Z2, Z1Z1, Z2Z2, Z1Z1]))
        U1, U2, S1, S2 = s2[0], s2[1], s2[2], s2[3]
        H = self._sub(xp, U2, U1)
        R = self._sub(xp, S2, S1)
        s3 = self._mul(xp, xp.stack([H, R, Z1]), xp.stack([H, R, Z2]))
        HH, RR, Z1Z2 = s3[0], s3[1], s3[2]
        s4 = self._mul(xp, xp.stack([H, U1, Z1Z2]), xp.stack([HH, HH, H]))
        HHH, V, Z3 = s4[0], s4[1], s4[2]
        X3 = self._sub(xp, self._sub(xp, RR, HHH), self._dbl_f(xp, V))
        s5 = self._mul(xp, xp.stack([R, S1]),
                       xp.stack([self._sub(xp, V, X3), HHH]))
        Y3 = self._sub(xp, s5[0], s5[1])
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
        """Batched windowed (4-bit) double-and-add, MSB first.

        scalars is (…, 16) standard-form limbs, treated as raw 256-bit
        integers — values >= the group order wrap in the group exactly like
        secp256k1_ecmult does on raw limbs in the reference
        (Client.hpp:180-192). `nbits` bounds the scalar bit-length when the
        caller knows it is small (128-bit PRF scalars, 31-bit audit
        coefficients) — the window loop shortens accordingly.

        Per 4 bits: 4 doubles + 1 table add (+ a mask-select of the
        16-entry per-element table — uint32 selects, no field muls), ~2.9x
        fewer field muls than bitwise double-and-add.
        """
        assert nbits % 4 == 0
        nwin = nbits // 4

        # align point/scalar batch shapes (e.g. shared generators against a
        # (B, 128) scalar batch)
        bshape = np.broadcast_shapes(p.x.shape[:-1], scalars.shape[:-1])
        p = JacPoint(xp.broadcast_to(p.x, bshape + p.x.shape[-1:]),
                     xp.broadcast_to(p.y, bshape + p.y.shape[-1:]),
                     xp.broadcast_to(p.z, bshape + p.z.shape[-1:]))
        scalars = xp.broadcast_to(scalars, bshape + scalars.shape[-1:])

        # per-element table T[d] = d*P, d = 0..15 (T[0] = infinity).
        # The |(…&0) terms make the infinity data-dependent on p AND the
        # scalars so its device-variance matches the loop body under
        # shard_map (vma): both operands may contribute mesh axes.
        inf0 = self.infinity(xp, ())
        vary = (p.x & 0) | (scalars & 0)
        inf = JacPoint(xp.broadcast_to(inf0.x, p.x.shape) | vary,
                       xp.broadcast_to(inf0.y, p.y.shape) | vary,
                       xp.broadcast_to(inf0.z, p.z.shape) | vary)
        table = [inf, p]
        for d in range(2, 16):
            if d % 2 == 0:
                table.append(self.double(xp, table[d // 2]))
            else:
                table.append(self.add(xp, table[d - 1], p))
        tx = xp.stack([t.x for t in table], axis=0)  # (16, …, 16)
        ty = xp.stack([t.y for t in table], axis=0)
        tz = xp.stack([t.z for t in table], axis=0)

        # (nwin, …) digit tensor, MSB-first
        shifts = np.arange(0, 16, 4, dtype=np.uint32)
        digits = (scalars[..., None] >> shifts) & xp.uint32(0xF)  # (…, 16, 4)
        digits = digits.reshape(scalars.shape[:-1] + (64,))
        digits = xp.moveaxis(digits, -1, 0)[:nwin][::-1]

        def lookup(digit):
            """Branchless table select: sum_d T[d]*(digit==d)."""
            m = xp.stack([(digit == np.uint32(d)).astype(xp.uint32)
                          for d in range(16)], axis=0)[..., None]
            return JacPoint(xp.sum(tx * m, axis=0).astype(xp.uint32),
                            xp.sum(ty * m, axis=0).astype(xp.uint32),
                            xp.sum(tz * m, axis=0).astype(xp.uint32))

        def step(acc: JacPoint, digit) -> JacPoint:
            for _ in range(4):
                acc = self.double(xp, acc)
            return self.add(xp, acc, lookup(digit))

        if xp is np:
            acc = inf
            for w in range(nwin):
                acc = step(acc, digits[w])
            return acc

        import jax

        def body(i, acc_t):
            digit = jax.lax.dynamic_index_in_dim(digits, i, axis=0,
                                                 keepdims=False)
            return tuple(step(JacPoint(*acc_t), digit))

        res = jax.lax.fori_loop(0, nwin, body, tuple(inf))
        return JacPoint(*res)

    def tree_sum(self, xp, p: JacPoint, axis: int = 0) -> JacPoint:
        """Point-add reduction along `axis` (log-depth).

        Shape-constant: each step adds the array to itself shifted by a
        power of two with infinity masking, so a jitted reduction of N
        points is ONE executable (shapes never change mid-reduction) —
        important because point-add graphs are expensive to compile."""
        assert axis == 0, "reduce leading axis; move it first"
        n = p.x.shape[0]
        while n > 1:
            half = n // 2
            lo = JacPoint(p.x[:half], p.y[:half], p.z[:half])
            hi = JacPoint(p.x[half:2 * half], p.y[half:2 * half],
                          p.z[half:2 * half])
            s = self.add(xp, lo, hi)
            if n % 2:  # carry the odd element forward
                p = JacPoint(
                    xp.concatenate([s.x, p.x[2 * half:]], axis=0),
                    xp.concatenate([s.y, p.y[2 * half:]], axis=0),
                    xp.concatenate([s.z, p.z[2 * half:]], axis=0))
                n = half + 1
            else:
                p = s
                n = half
        return JacPoint(p.x[:1], p.y[:1], p.z[:1])

    def msm(self, xp, points: JacPoint, scalars, nbits: int = 256) -> JacPoint:
        """Multi-scalar multiplication over the leading axis:
        sum_i scalars[i] * points[i]. scalars: (N, …, 16) standard form."""
        parts = self.scalar_mul(xp, points, scalars, nbits)
        return self.tree_sum(xp, parts, axis=0)


def _select_point(xp, mask, a: JacPoint, b: JacPoint) -> JacPoint:
    m = mask[..., None]
    return JacPoint(xp.where(m, a.x, b.x),
                    xp.where(m, a.y, b.y),
                    xp.where(m, a.z, b.z))
