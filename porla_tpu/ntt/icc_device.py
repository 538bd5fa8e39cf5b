"""Device-side ICC erasure recovery: batched NTT reduction + small solve.

The host path (`icc.recover_level`) solves the full m x m system by
Gaussian elimination over Python ints — O(m^3) bigint work, fine as a
golden model, unusable at the BASELINE config-2 scale (recovery inside
a 2^16-block log, levels up to m = 2^15). This module is the
production path. It exploits the code's structure instead of treating
the generator as a dense matrix:

    X = F(B)            (the level fold — a radix-2 NTT-like network)
    Y = F(W * B)        (W = diag(w^bitrev(t_i)), per-block write times;
                         reference Server.hpp:1391-1425, icc/main.m)

Let u = F(B). Surviving X columns give u directly at their positions.
For the e erased X positions, unknowns delta = u[E] are determined by
surviving Y rows of the operator M = F . W . F^{-1}:

    M(u)[j] = Y[j]   for surviving j

so   A[Sy, E] @ delta = v[Sy] - M(u~)[Sy],  u~ = u with zeros at E.

- Columns of A are M applied to one-hot vectors: ONE batched
  fold/unfold pass over an (m, e) array — O(e * m log m) device
  butterflies, reusing the level-fold stage structure (the encode
  network, Server.hpp:1548-1687) and its inverse.
- The reduced (e + slack) x e system is solved by DIVISION-FREE
  Gauss-Jordan elimination on device (cross-multiplied row updates
  keep everything in canonical residues; no modular inverses inside
  the loop), with the e final pivot inverses done exactly on the host.
- B = F^{-1}(u) finishes the recovery — one more batched inverse fold.

Total: O((e + C) m log m) batched device multiplies plus an
O(e^2 (e + C)) batched elimination — vs O(m^3) for the dense solve.
Works for any modulus lane (mod p and the mod-q CRT lane take the same
code path), so full block values recover by CRT like the encode side.
"""

from __future__ import annotations

from functools import lru_cache

import numpy as np

from porla_tpu.fields import constants as C
from porla_tpu.fields import limbs as L
from porla_tpu.fields import mont
from porla_tpu.ntt import engine, icc


def _stage_twiddles(ctx: engine.NttContext, m: int, mod: mont.Modulus,
                    inverse: bool):
    """Per-stage (length, 16) Montgomery twiddle tables for a size-m
    level fold (stage lengths 1..m/2, v = w^(n/length) — matching
    icc.fold_transform). inverse=True inverts each FORWARD value in
    THIS lane's field: the forward q-lane twiddle is (v^j mod p) mod q
    (engine._make_tw), which is not a power of (v mod q), so the
    inverse table cannot be built from powers of v^-1."""
    tabs = []
    length = 1
    while length < m:
        v = pow(ctx.w, ctx.n // length, C.FFT_PRIME)
        vals = [pow(v, j, C.FFT_PRIME) % mod.n for j in range(length)]
        if inverse:
            if any(x == 0 for x in vals):
                raise ValueError(
                    "a forward twiddle reduces to 0 in this CRT lane — "
                    "the lane fold is not invertible for this (n, mod)")
            vals = [pow(x, -1, mod.n) for x in vals]
        tabs.append(L.ints_to_limbs(
            [mod.to_mont_int(x) for x in vals]).astype(np.uint32))
        length <<= 1
    return tabs


@lru_cache(maxsize=None)
def _inv2_mont(mod: mont.Modulus):
    return L.ints_to_limbs(
        [mod.to_mont_int(pow(2, -1, mod.n))])[0].astype(np.uint32)


def _fold_dev(xp, arr, tabs, mod: mont.Modulus):
    """Forward level fold over axis 0 of (m, ..., 16) standard-form
    values (butterflies exactly as icc.fold_transform)."""
    m = arr.shape[0]
    rest = arr.shape[1:-1]
    length = 1
    si = 0
    while length < m:
        tw = xp.asarray(tabs[si]).reshape(
            (1, length) + (1,) * len(rest) + (L.NLIMBS,))
        a = arr.reshape((m // (2 * length), 2 * length) + rest
                        + (L.NLIMBS,))
        u, t_in = a[:, :length], a[:, length:]
        t = mont.mont_mul(xp, t_in, tw, mod)
        hi = mont.add_mod(xp, u, t, mod)
        lo = mont.sub_mod(xp, u, t, mod)
        arr = xp.concatenate([hi, lo], axis=1).reshape(arr.shape)
        length <<= 1
        si += 1
    return arr


def _unfold_dev(xp, arr, itabs, mod: mont.Modulus):
    """Inverse level fold: reverse stage order, butterflies inverted
    (u = (hi+lo)/2, t_in = (hi-lo)/2 * v^-j)."""
    m = arr.shape[0]
    rest = arr.shape[1:-1]
    inv2 = xp.asarray(_inv2_mont(mod)).reshape(
        (1, 1) + (1,) * len(rest) + (L.NLIMBS,))
    length = m // 2
    si = len(itabs) - 1
    while length >= 1:
        tw = xp.asarray(itabs[si]).reshape(
            (1, length) + (1,) * len(rest) + (L.NLIMBS,))
        a = arr.reshape((m // (2 * length), 2 * length) + rest
                        + (L.NLIMBS,))
        hi, lo = a[:, :length], a[:, length:]
        u = mont.mont_mul(xp, mont.add_mod(xp, hi, lo, mod), inv2, mod)
        t = mont.mont_mul(xp, mont.sub_mod(xp, hi, lo, mod), inv2, mod)
        t_in = mont.mont_mul(xp, t, tw, mod)
        arr = xp.concatenate([u, t_in], axis=1).reshape(arr.shape)
        length //= 2
        si -= 1
    return arr


def _wt_mont(ctx: engine.NttContext, write_times, mod: mont.Modulus):
    vals = [pow(ctx.w,
                engine.reverse_bits(t % ctx.n, ctx.height - 1),
                C.FFT_PRIME) % mod.n
            for t in write_times]
    return L.ints_to_limbs([mod.to_mont_int(v) for v in vals]).astype(
        np.uint32)


def _gauss_jordan_df(xp, A, R, mod: mont.Modulus):
    """Division-free Gauss-Jordan over rows of A (nrows, e, 16) with
    batched RHS R (nrows, B, 16), all canonical standard-form residues.

    Per pivot column k: pick the first still-unused row with a nonzero
    entry, then update every other row r as
        row_r <- a_pk * row_r - a_rk * row_p
    (cross-multiplication — no inverses; previously-pivoted columns
    stay zeroed everywhere but their own pivot row). Returns
    (A', R', pivot_row_index_per_column); a column with no available
    nonzero entry gets pivot index -1 (singular)."""
    nrows, e = A.shape[0], A.shape[1]
    used = xp.zeros((nrows,), np.bool_)
    pivots = []
    for k in range(e):
        col = A[:, k, :]
        nz = ~mont.is_zero(xp, col).reshape(nrows) & ~used
        idx = xp.arange(nrows)
        pr = xp.min(xp.where(nz, idx, nrows))
        ok = pr < nrows
        prc = xp.where(ok, pr, 0)
        a_pk = A[prc, k, :]                     # (16,)
        prow_A, prow_R = A[prc], R[prc]         # (e,16), (B,16)
        a_rk = A[:, k, :]                       # (nrows, 16)
        newA = mont.sub_mod(
            xp,
            mont.mont_mul(xp, A, a_pk[None, None, :], mod),
            mont.mont_mul(xp, prow_A[None], a_rk[:, None, :], mod), mod)
        newR = mont.sub_mod(
            xp,
            mont.mont_mul(xp, R, a_pk[None, None, :], mod),
            mont.mont_mul(xp, prow_R[None], a_rk[:, None, :], mod), mod)
        keep = (idx == prc) | ~ok
        A = xp.where(keep[:, None, None], A, newA)
        R = xp.where(keep[:, None, None], R, newR)
        used = used | (idx == prc) & ok
        pivots.append(xp.where(ok, prc, -1))
    return A, R, xp.stack(pivots)


def recover_level_device(ctx: engine.NttContext, write_times,
                         surviving: dict[int, list[int]],
                         mod: mont.Modulus | None = None,
                         slack: int = 64, xp=None):
    """Device-path recovery of a level's m blocks from surviving
    codeword columns (same contract as icc.recover_level: keys
    0..m-1 = X half, m..2m-1 = Y half; values = chunk residue lists).

    Returns m rows of chunk values (ints mod `mod.n`, default mod p).
    Raises ValueError on singular erasure patterns (same diagnosis as
    the host path — e.g. paired X/Y columns of an epoch-CRebuild
    level under the reference's non-MDS generator)."""
    if mod is None:
        mod = engine._MOD_P
    if xp is None:
        import jax.numpy as jnp
        xp = jnp
    m = len(write_times)
    known_x = {j: surviving[j] for j in surviving if j < m}
    known_y = {j - m: surviving[j] for j in surviving if j >= m}
    E = sorted(set(range(m)) - set(known_x))
    Sy = sorted(known_y)
    e = len(E)
    if e > len(Sy):
        raise ValueError(
            f"unrecoverable: {e} X columns erased but only {len(Sy)} "
            f"Y columns survive (need one Y constraint per X erasure)")
    nchunks = len(next(iter(surviving.values())))

    tabs = _stage_twiddles(ctx, m, mod, inverse=False)
    itabs = _stage_twiddles(ctx, m, mod, inverse=True)
    wt = xp.asarray(_wt_mont(ctx, write_times, mod)).reshape(
        m, 1, L.NLIMBS)

    def M_op(u):
        b = _unfold_dev(xp, u, itabs, mod)
        return _fold_dev(xp, mont.mont_mul(xp, b, wt, mod), tabs, mod)

    # u~: known NTT-domain values, zero at erased positions
    u_np = np.zeros((m, nchunks, L.NLIMBS), np.uint32)
    for j, vals in known_x.items():
        u_np[j] = L.ints_to_limbs([v % mod.n for v in vals])
    u_t = xp.asarray(u_np)

    # operator columns for the erased positions: one batched pass
    basis = np.zeros((m, e, L.NLIMBS), np.uint32)
    for k, j in enumerate(E):
        basis[j, k, 0] = 1
    A_full = M_op(xp.asarray(basis))            # (m, e, 16)
    r_full = M_op(u_t)                          # (m, C, 16)

    # reduced rows: surviving Y rows (random slack keeps the first
    # full-rank subset cheap; retry with all rows if singular)
    v_np = np.zeros((len(Sy), nchunks, L.NLIMBS), np.uint32)
    for i, j in enumerate(Sy):
        v_np[i] = L.ints_to_limbs([v % mod.n for v in known_y[j]])
    if e:
        for rows in (min(len(Sy), e + slack), len(Sy)):
            sel = np.asarray(Sy[:rows])
            A = A_full[xp.asarray(sel)]
            rhs = mont.sub_mod(xp, xp.asarray(v_np[:rows]),
                               r_full[xp.asarray(sel)], mod)
            A2, R2, piv = _gauss_jordan_df(xp, A, rhs, mod)
            piv = np.asarray(piv)
            if (piv >= 0).all():
                break
        else:  # pragma: no cover
            pass
        if (piv < 0).any():
            raise ValueError(
                "surviving column set is singular — this erasure "
                "pattern is unrecoverable (e.g. paired X/Y columns of "
                "an epoch-CRebuild level, which are scalar multiples)")
        # delta_k = rhs[piv_k] / A2[piv_k, k] — exact host inverses
        diag = L.limbs_to_ints(np.asarray(A2[xp.asarray(piv),
                                             xp.asarray(np.arange(e))]))
        num = np.asarray(R2[xp.asarray(piv)])   # (e, C, 16)
        delta = np.zeros((e, nchunks, L.NLIMBS), np.uint32)
        for k in range(e):
            inv = pow(int(diag[k]), -1, mod.n)
            row = L.limbs_to_ints(num[k])
            delta[k] = L.ints_to_limbs(
                [(int(x) * inv) % mod.n for x in row])
        u_np[np.asarray(E)] = delta
        u_t = xp.asarray(u_np)

    blocks = np.asarray(_unfold_dev(xp, u_t, itabs, mod))
    return [list(L.limbs_to_ints(blocks[i])) for i in range(m)]
