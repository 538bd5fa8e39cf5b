"""GLV endomorphism scalar decomposition (host side, exact).

Both protocol curves have j-invariant 0, so they carry the cube-root
endomorphism phi(x, y) = (beta*x, y) with phi(P) = lambda*P: a 256-bit
scalar k splits as k = k1 + lambda*k2 with |k1|, |k2| ~ 2^128, halving
the doubling chain of every variable-base scalar mul (the reference's
secp256k1 build uses the same trick: USE_ENDOMORPHISM / GLV split in
ecmult_impl.h:620-634, scalar lambda split in scalar_impl.h).

Parameters are DERIVED, not hard-coded: lambda from the roots of
x^2 + x + 1 mod n, beta from the cube roots of 1 mod p, matched by
checking lambda*G == (beta*Gx, Gy) on the golden model; the short
lattice basis by the extended-Euclid descent (the standard GLV
construction). Everything is asserted at build time, and decompose()
re-asserts k1 + lambda*k2 == k mod n per batch.
"""

from __future__ import annotations

from functools import lru_cache

from porla_tpu.golden import ecc


def _sqrt_mod(a: int, p: int) -> int | None:
    """Tonelli-Shanks (p odd prime). None if a is a non-residue."""
    a %= p
    if a == 0:
        return 0
    if pow(a, (p - 1) // 2, p) != 1:
        return None
    if p % 4 == 3:
        return pow(a, (p + 1) // 4, p)
    # general case
    q, s = p - 1, 0
    while q % 2 == 0:
        q //= 2
        s += 1
    z = 2
    while pow(z, (p - 1) // 2, p) != p - 1:
        z += 1
    m, c, t, r = s, pow(z, q, p), pow(a, q, p), pow(a, (q + 1) // 2, p)
    while t != 1:
        i, t2 = 0, t
        while t2 != 1:
            t2 = t2 * t2 % p
            i += 1
        b = pow(c, 1 << (m - i - 1), p)
        m, c, t, r = i, b * b % p, t * b * b % p, r * b % p
    return r


def _cube_roots_of_unity(p: int) -> list[int]:
    """Nontrivial roots of x^2 + x + 1 mod p: (-1 ± sqrt(-3)) / 2."""
    s = _sqrt_mod(p - 3, p)
    assert s is not None, "p = 1 mod 3 required for the endomorphism"
    inv2 = pow(2, -1, p)
    return [((-1 + s) * inv2) % p, ((-1 - s) * inv2) % p]


def _short_basis(n: int, lam: int):
    """Extended-Euclid descent on (n, lam): rows (r, t) with
    r = t*lam mod n; take the first two with r < sqrt(n) (the classic
    GLV basis v = (r, -t), so r - t*lam = 0 mod n)."""
    rows = []
    r0, r1 = n, lam
    t0, t1 = 0, 1
    lim = 1
    while lim * lim < n:
        lim <<= 1
    while r1:
        if r1 < lim:
            rows.append((r1, t1))
            if len(rows) == 2:
                break
        q = r0 // r1
        r0, r1 = r1, r0 - q * r1
        t0, t1 = t1, t0 - q * t1
    assert len(rows) == 2, "euclid descent found no short basis"
    (r1_, t1_), (r2_, t2_) = rows
    # v_i = (a_i, b_i) with a_i + b_i*lam = 0 mod n
    return (r1_, -t1_), (r2_, -t2_)


class GlvParams:
    def __init__(self, lam, beta, v1, v2, n):
        self.lam = lam
        self.beta = beta
        self.v1 = v1
        self.v2 = v2
        self.n = n


@lru_cache(maxsize=None)
def params_for(curve) -> GlvParams:
    """Derive and verify (lambda, beta, short basis) for an ecc curve."""
    n, p, g = curve.n, curve.p, curve.g
    lams = _cube_roots_of_unity(n)
    betas = _cube_roots_of_unity(p)
    for lam in lams:
        lg = ecc.mul(curve, g, lam)
        for beta in betas:
            if lg == ((beta * g[0]) % p, g[1]):
                v1, v2 = _short_basis(n, lam)
                for (a, b) in (v1, v2):
                    assert (a + b * lam) % n == 0
                    assert abs(a) * abs(a) < 16 * n and \
                        abs(b) * abs(b) < 16 * n
                return GlvParams(lam, beta, v1, v2, n)
    raise AssertionError("no (lambda, beta) pair matched the endomorphism")


def decompose(k: int, gp: GlvParams):
    """k -> (|k1|, sign1, |k2|, sign2) with k1 + lam*k2 = k mod n and
    |ki| < 2^128 (for our 256-bit curves)."""
    n = gp.n
    k %= n
    (a1, b1), (a2, b2) = gp.v1, gp.v2
    det = a1 * b2 - a2 * b1
    # round(k*b2/det), round(-k*b1/det) — det may be negative
    def rdiv(num, den):
        if den < 0:
            num, den = -num, -den
        return (2 * num + den) // (2 * den)
    c1 = rdiv(k * b2, det)
    c2 = rdiv(-k * b1, det)
    k1 = k - c1 * a1 - c2 * a2
    k2 = -c1 * b1 - c2 * b2
    assert (k1 + gp.lam * k2 - k) % n == 0
    assert abs(k1) < 1 << 128 and abs(k2) < 1 << 128, (k, k1, k2)
    return abs(k1), 1 if k1 < 0 else 0, abs(k2), 1 if k2 < 0 else 0
