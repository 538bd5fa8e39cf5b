"""BN254 (alt_bn128) optimal-ate pairing — exact host implementation.

Used by the KZG scheme's verifier (the one piece the reference delegates
entirely to gnark-crypto, porla/main.go:177-193). Pairings run once or
twice per audit verification — control-plane work, so a clear exact
Python implementation is the right tool; the bulk KZG math (MSM commits,
quotient polynomials) runs on the TPU via porla_tpu.curves.

Tower: Fp12 = Fp[w]/(w^12 - 18 w^6 + 82), with Fp2 = Fp[u]/(u^2+1)
embedded via u -> w^6 - 9 (xi = 9 + u is the twist factor). G2 points on
the twist are untwisted into E(Fp12) by (x, y) -> (x w^2, y w^3).
"""

from __future__ import annotations

from porla_tpu.fields.constants import BN254_P as P
from porla_tpu.fields.constants import BN254_R as R
from porla_tpu.fields.constants import BN254_X

ATE_LOOP_COUNT = 6 * BN254_X + 2

# --- Fp2 -------------------------------------------------------------------

def fp2_add(a, b):
    return ((a[0] + b[0]) % P, (a[1] + b[1]) % P)


def fp2_sub(a, b):
    return ((a[0] - b[0]) % P, (a[1] - b[1]) % P)


def fp2_mul(a, b):
    return ((a[0] * b[0] - a[1] * b[1]) % P,
            (a[0] * b[1] + a[1] * b[0]) % P)


def fp2_inv(a):
    d = pow(a[0] * a[0] + a[1] * a[1], P - 2, P)
    return ((a[0] * d) % P, (-a[1] * d) % P)


def fp2_neg(a):
    return ((-a[0]) % P, (-a[1]) % P)


# standard generators
G1 = (1, 2)
G2 = (
    (10857046999023057135944570762232829481370756359578518086990519993285655852781,
     11559732032986387107991004021392285783925812861821192530917403151452391805634),
    (8495653923123431417604973247489272438418190587263600148770280649306958101930,
     4082367875863433681332203403145435568316851327593401208105741076214120093531),
)


# --- G2 affine arithmetic (over Fp2) ---------------------------------------

def g2_add(p1, p2):
    if p1 is None:
        return p2
    if p2 is None:
        return p1
    x1, y1 = p1
    x2, y2 = p2
    if x1 == x2:
        if fp2_add(y1, y2) == (0, 0):
            return None
        lam = fp2_mul(fp2_mul((3, 0), fp2_mul(x1, x1)),
                      fp2_inv(fp2_add(y1, y1)))
    else:
        lam = fp2_mul(fp2_sub(y2, y1), fp2_inv(fp2_sub(x2, x1)))
    x3 = fp2_sub(fp2_sub(fp2_mul(lam, lam), x1), x2)
    y3 = fp2_sub(fp2_mul(lam, fp2_sub(x1, x3)), y1)
    return (x3, y3)


def g2_mul(pt, k):
    acc = None
    add = pt
    k %= R
    while k:
        if k & 1:
            acc = g2_add(acc, add)
        add = g2_add(add, add)
        k >>= 1
    return acc


def g2_neg(pt):
    if pt is None:
        return None
    return (pt[0], fp2_neg(pt[1]))


def g2_is_on_curve(pt) -> bool:
    if pt is None:
        return True
    x, y = pt
    # y^2 = x^3 + 3/xi, xi = 9 + u
    b2 = fp2_mul((3, 0), fp2_inv((9, 1)))
    return fp2_sub(fp2_mul(y, y),
                   fp2_add(fp2_mul(x, fp2_mul(x, x)), b2)) == (0, 0)


# --- Fp12 (dense polynomial basis) -----------------------------------------

# w^12 = 18 w^6 - 82
_MOD_COEFFS = [82, 0, 0, 0, 0, 0, -18, 0, 0, 0, 0, 0]


def fp12_one():
    return (1,) + (0,) * 11


def fp12_mul(a, b):
    t = [0] * 23
    for i in range(12):
        ai = a[i]
        if ai:
            for j in range(12):
                t[i + j] += ai * b[j]
    for k in range(22, 11, -1):
        v = t[k]
        if v:
            t[k] = 0
            t[k - 12] -= v * 82
            t[k - 6] += v * 18
    return tuple(x % P for x in t[:12])


def fp12_inv(a):
    # extended Euclid over Fp[w] against the modulus polynomial
    lm, hm = [1] + [0] * 12, [0] * 13
    low = list(a) + [0]
    high = [-c for c in _MOD_COEFFS] + [1]
    high = [c % P for c in high]

    def deg(p):
        for i in range(len(p) - 1, -1, -1):
            if p[i]:
                return i
        return 0

    def poly_rounded_div(A, B):
        dega, degb = deg(A), deg(B)
        temp = list(A)
        o = [0] * len(A)
        binv = pow(B[degb], P - 2, P)
        for i in range(dega - degb, -1, -1):
            o[i] = (o[i] + temp[degb + i] * binv) % P
            for c in range(degb + 1):
                temp[c + i] = (temp[c + i] - o[c] * 0) % P  # placeholder
        return o

    # standard iterative inverse (py-style)
    while deg(low):
        r_deg = deg(high) - deg(low)
        nm, new = list(hm), list(high)
        linv = pow(low[deg(low)], P - 2, P)
        for i in range(r_deg + 1):
            coeff = (high[deg(low) + i] * linv) % P if deg(low) + i < len(high) else 0
        # long division: high = q*low + rem
        q = [0] * 13
        rem = list(high)
        dl = deg(low)
        for i in range(deg(high) - dl, -1, -1):
            c = (rem[dl + i] * linv) % P
            q[i] = c
            for j in range(dl + 1):
                rem[j + i] = (rem[j + i] - c * low[j]) % P
        # nm = hm - q*lm
        nm = list(hm)
        for i in range(13):
            for j in range(13 - i):
                nm[i + j] = (nm[i + j] - q[i] * lm[j]) % P
        lm, low, hm, high = nm, rem, lm, low
    inv_const = pow(low[0], P - 2, P)
    return tuple((c * inv_const) % P for c in hm[:12])
