"""NTT / ICC erasure-encoding engine over the CRT data plane.

The reference encodes data with an iterative radix-2 NTT over
Z_p (p = 207*2^248+1) while keeping values reduced mod LCM = p*q
(reference porla/Server/Server.hpp:1548-1830 `CRebuild_Cached`,
:1209-1328 `mix`; golden MATLAB model in icc/). Butterfly:

    t = v_j * A[k+m2];  A[k] = (u + t) % LCM;  A[k+m2] = (u - t) % LCM
    with v_j = w^(n*j/m2), w a 2n-th primitive root of unity mod p.

Here a value mod LCM is carried as the CRT residue pair
(x mod p, x mod q) — two 256-bit limb-tensor lanes (see DESIGN.md). Every
butterfly is exact in both lanes; the canonical [0, LCM) representative is
reconstructed only at serialization boundaries (storage/serial.py).

Twiddle tables are precomputed per (n) on the host with batched
doubling and stored in Montgomery form per lane (so a butterfly costs one
mont_mul per lane) plus standard form (the same values feed the EC "MAC
mirror" butterflies as scalars; Server.hpp:1592).
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np

from porla_tpu.fields import constants as C
from porla_tpu.fields import limbs as L
from porla_tpu.fields import mont


class CrtArray(NamedTuple):
    """A batch of Z_LCM values as residue lanes. Shapes (…, 16) each."""
    p: "np.ndarray"
    q: "np.ndarray"

    @property
    def batch_shape(self):
        return self.p.shape[:-1]


def crt_from_ints(values, mod_q: "mont.Modulus", xp=np) -> CrtArray:
    """Python ints (any size) -> CRT lane arrays (N, 16), standard form."""
    vp = [int(v) % C.FFT_PRIME for v in values]
    vq = [int(v) % mod_q.n for v in values]
    return CrtArray(xp.asarray(L.ints_to_limbs(vp)),
                    xp.asarray(L.ints_to_limbs(vq)))


def crt_to_ints(arr: CrtArray, mod_q: "mont.Modulus") -> list[int]:
    """CRT lanes -> canonical representatives in [0, p*q) — exactly NTL's
    always-non-negative `% LCM` (utils.h:33). Host-side (serialization)."""
    ps = L.limbs_to_ints(np.asarray(arr.p).reshape(-1, L.NLIMBS))
    qs = L.limbs_to_ints(np.asarray(arr.q).reshape(-1, L.NLIMBS))
    p = C.FFT_PRIME
    q = mod_q.n
    pinv = pow(p, -1, q)
    return [xp_ + p * (((xq - xp_) * pinv) % q) for xp_, xq in zip(ps, qs)]


def crt_reduce_mod_p(xp, arr: CrtArray, mod_q: mont.Modulus) -> CrtArray:
    """A := A mod p. The p-lane is already the canonical value in [0, p).
    For IPA (q = SECP_N > p) that value is also canonical in the q lane;
    for KZG (BN254_R < p) it must be fully reduced or the q lane carries a
    non-canonical residue that corrupts later align_scalars/sub_mod
    results (advisor r1 high finding). Mirrors align_MAC's
    `A[i] = A[i] % PRIME_MODULUS` (Server.hpp:499-502)."""
    return CrtArray(arr.p, q_lane_from_p(xp, arr.p, mod_q))


def q_lane_from_p(xp, arr_p, mod_q: mont.Modulus):
    """Canonical q-lane residue of a canonical-mod-p (…, 16) value."""
    if mod_q.n > C.FFT_PRIME:
        return arr_p
    return mont.mod_reduce(xp, arr_p, mod_q)


def align_scalars(xp, arr: CrtArray, mod_q: mont.Modulus):
    """(A mod p - A) mod q per element — the correction scalars committed
    by align_MAC (Server.hpp:499-503; NTL `%` semantics make both terms
    canonical). Returns (…, 16) standard-form q-lane values. The p lane
    (a value < p, possibly >= q for KZG) is canonicalized mod q first so
    the single-borrow sub_mod is exact."""
    return mont.sub_mod(xp, q_lane_from_p(xp, arr.p, mod_q), arr.q, mod_q)


class Twiddles(NamedTuple):
    """Twiddle factors for one butterfly length: v_j = w^(n*j/m2)."""
    std: "np.ndarray"     # (m2, 16) standard form (ints < p; EC scalar use)
    mont_p: "np.ndarray"  # (m2, 16) Montgomery form mod p
    mont_q: "np.ndarray"  # (m2, 16) Montgomery form mod q


def reverse_bits(value: int, nbits: int) -> int:
    """Bit-reversal (reference porla/Utils/utils.h:81-91)."""
    out = 0
    for _ in range(nbits):
        out = (out << 1) | (value & 1)
        value >>= 1
    return out


def _batch_powers(base: int, count: int, modulus: int) -> list[int]:
    """[base^0, …, base^(count-1)] mod modulus via doubling (host ints)."""
    pows = [1]
    while len(pows) < count:
        mult = pow(base, len(pows), modulus)
        pows.extend((x * mult) % modulus for x in pows[: count - len(pows)])
    return pows[:count]


class NttContext:
    """Per-(num_blocks, scheme) twiddle and root-of-unity context."""

    def __init__(self, num_blocks: int, scheme: str = "ipa",
                 hardened: bool = False):
        assert num_blocks & (num_blocks - 1) == 0, "n must be a power of two"
        self.n = num_blocks
        self.scheme = scheme
        self.hardened = hardened
        self.height = num_blocks.bit_length()  # log2(n) + 1
        self.mod_p = _MOD_P
        self.mod_q = _MOD_SECP_N if scheme == "ipa" else _MOD_BN254_R
        # w = g^((p-1)/2n) (Client.hpp:141-144). With the reference's g
        # this has order n only (see fields/constants.py — the constant is
        # not a primitive root); hardened mode uses a true generator so w
        # is a genuine 2n-th primitive root and the codeword is MDS.
        gen = C.FFT_TRUE_GENERATOR if hardened else C.FFT_GENERATOR
        self.w = pow(gen, (C.FFT_PRIME - 1) // (2 * num_blocks),
                     C.FFT_PRIME)
        from porla_tpu.curves import instances as _ci
        self.curve_ops = (_ci.secp256k1() if scheme == "ipa"
                          else _ci.bn254())
        self._tw_cache: dict[int, Twiddles] = {}

    def twiddles(self, length: int) -> Twiddles:
        """v_j = w^(n*j/length) for j in [0, length) — the factors for a
        butterfly whose half-width is `length` (mix at level log2(length),
        CRebuild stage with m2 = length)."""
        tw = self._tw_cache.get(length)
        if tw is None:
            v = pow(self.w, self.n // length, C.FFT_PRIME)
            vals = _batch_powers(v, length, C.FFT_PRIME)
            tw = self._make_tw(vals)
            self._tw_cache[length] = tw
        return tw

    def _make_tw(self, vals: list[int]) -> Twiddles:
        std = L.ints_to_limbs(vals)
        mp = L.ints_to_limbs([self.mod_p.to_mont_int(v) for v in vals])
        mq = L.ints_to_limbs([self.mod_q.to_mont_int(v % self.mod_q.n)
                              for v in vals])
        return Twiddles(std, mp, mq)

    def wt_scalar(self, write_step: int) -> Twiddles:
        """w^bitrev(write_step mod n, height-1) — the time-twist applied to
        the Y copy (HAdd at Server.hpp:1391, CRebuild at :1494)."""
        e = reverse_bits(write_step % self.n, self.height - 1)
        return self._make_tw([pow(self.w, e, C.FFT_PRIME)])


_MOD_P = mont.Modulus(C.FFT_PRIME, "fft_p")
_MOD_SECP_N = mont.Modulus(C.SECP_N, "secp_n")
_MOD_BN254_R = mont.Modulus(C.BN254_R, "bn254_r")


def butterfly_lane(xp, a0, a1, tw_mont, mod: mont.Modulus):
    """One lane of the data butterfly: returns (a0 + tw*a1, a0 - tw*a1).

    a0, a1: (…, 16) standard-form values; tw_mont broadcastable (…, 16)
    Montgomery form. Exactly reproduces the reference's
    (u ± v*t) % LCM in this lane (NTL `%` is always non-negative, as are
    canonical residues)."""
    t = mont.mont_mul(xp, a1, tw_mont, mod)
    return mont.add_mod(xp, a0, t, mod), mont.sub_mod(xp, a0, t, mod)


def butterfly(xp, a0: CrtArray, a1: CrtArray, tw: Twiddles,
              mod_q: mont.Modulus) -> tuple[CrtArray, CrtArray]:
    """Full CRT butterfly; tw lanes must broadcast against a0/a1 lanes."""
    s_p, d_p = butterfly_lane(xp, a0.p, a1.p, tw.mont_p, _MOD_P)
    s_q, d_q = butterfly_lane(xp, a0.q, a1.q, tw.mont_q, mod_q)
    return CrtArray(s_p, s_q), CrtArray(d_p, d_q)


def encode_stages(xp, ctx: NttContext, arr: CrtArray) -> CrtArray:
    """Run all CRebuild butterfly stages s = 1..height-1 over an (n, C, 16)
    CRT array — the reference's stage loop (Server.hpp:1548-1687) in
    tensor form. Stage s: pairs (k, k+m2) for k mod m < m2, twiddle v^j
    with j = k mod m2.
    """
    n = ctx.n
    ap, aq = arr.p, arr.q
    chunk_shape = ap.shape[1:-1]  # e.g. (C,)
    for s in range(1, ctx.height):
        m = 1 << s
        m2 = m >> 1
        tw = ctx.twiddles(m2)
        twp = xp.asarray(tw.mont_p).reshape((1, m2) + (1,) * len(chunk_shape)
                                            + (L.NLIMBS,))
        twq = xp.asarray(tw.mont_q).reshape((1, m2) + (1,) * len(chunk_shape)
                                            + (L.NLIMBS,))

        def stage(a, twl, mod):
            a = a.reshape((n // m, m) + chunk_shape + (L.NLIMBS,))
            u, t_in = a[:, :m2], a[:, m2:]
            t = mont.mont_mul(xp, t_in, twl, mod)
            hi = mont.add_mod(xp, u, t, mod)
            lo = mont.sub_mod(xp, u, t, mod)
            out = xp.concatenate([hi, lo], axis=1)
            return out.reshape((n,) + chunk_shape + (L.NLIMBS,))

        ap = stage(ap, twp, _MOD_P)
        aq = stage(aq, twq, ctx.mod_q)
    return CrtArray(ap, aq)
