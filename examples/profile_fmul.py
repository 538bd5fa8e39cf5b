"""Microbenchmark + exactness check for field-mul kernel variants.

The Pippenger bucket kernel spends ~60% of each 1.25 us field mul in the
byte-digit conv and ~40% in the Montgomery-reduction tail (3 packed-carry
resolves + cond_sub) — profile_msm_kernel.py. Variants measured here:

  conv/cur      current _conv_columns (pad-shift accumulate)
  conv/roll     FMA into a rolled 64-row operand (b64 = pad(b); static
                sublane rotate per tap)
  conv/kara     1-level unsigned Karatsuba-hybrid (columnwise m1-z0-z2
                is term-wise nonnegative, so stays in u32)
  mul/v1        current _f_mul (conv + 3 resolves + cond_sub)
  mul/v2        wide-dot REDC: resolve #1 (and #2 for BN254) replaced by
                lo/hi bf16 dot columns; exactness checked vs host ints

Chained-mul timing (t[k+6] - t[k])/6 like profile_msm_kernel.
"""
from __future__ import annotations

import time
from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from porla_tpu.curves import pallas_curve as pc
from porla_tpu.curves.instances import bn254, secp256k1
from porla_tpu.fields import mont
from porla_tpu.ntt import mxu
from porla_tpu.ntt.mxu import ND
from porla_tpu.ntt.pallas_stage import (_cond_sub, _f32_to_u32, _fold,
                                        _resolve, _u32_to_bf16)

BT = 512
STEPS = 512
_M8 = np.uint32(0xFF)


# --- conv variants -----------------------------------------------------------

def conv_cur(a, b):
    return pc._conv_columns(a, b)


def conv_roll(a, b):
    af = a.astype(jnp.int32).astype(jnp.float32)
    bf = b.astype(jnp.int32).astype(jnp.float32)
    b64 = jnp.pad(bf, ((0, ND), (0, 0)))
    acc = jnp.zeros((2 * ND, a.shape[1]), jnp.float32)
    for i in range(ND):
        acc = acc + af[i:i + 1] * pltpu.roll(b64, i, 0)
    return _f32_to_u32(acc)


def _conv16(af, bf, out_rows=31):
    """16-tap f32 conv: (16, B) x (16, B) -> (out_rows, B)."""
    acc = jnp.zeros((out_rows, af.shape[1]), jnp.float32)
    for i in range(16):
        acc = acc + jnp.pad(af[i:i + 1] * bf, ((i, out_rows - 16 - i),
                                               (0, 0)))
    return acc


def conv_kara(a, b):
    af = a.astype(jnp.int32).astype(jnp.float32)
    bf = b.astype(jnp.int32).astype(jnp.float32)
    a0, a1 = af[:16], af[16:]
    b0, b1 = bf[:16], bf[16:]
    z0 = _conv16(a0, b0)
    z2 = _conv16(a1, b1)
    m1 = _conv16(a0 + a1, b0 + b1)
    mid = m1 - z0 - z2          # term-wise >= 0, exact in f32
    t = jnp.pad(z0, ((0, 33), (0, 0))) \
        + jnp.pad(mid, ((16, 17), (0, 0))) \
        + jnp.pad(z2, ((32, 1), (0, 0)))
    return _f32_to_u32(t)


# --- REDC variants -----------------------------------------------------------

@lru_cache(maxsize=None)
def _v2_tables(mod: mont.Modulus):
    """Widened Toeplitz stacks accepting (lo || hi) 9-bit-folded input:
    columns 32..63 act on the hi flags with an implied x256 (one-digit
    shift), truncated mod R."""
    def wide(val: int, rows: int):
        base = mxu.toeplitz8_mats([val], rows)[0]          # (rows, 32)
        # one-ROW shift (implied x256), not a value shift mod 2^256 —
        # the latter drops the top byte of val from the integer product
        shift = np.zeros_like(base)
        shift[1:, :] = base[:-1, :]
        return np.concatenate([base, shift], axis=1)        # (rows, 64)
    nprime = (-pow(mod.n, -1, 1 << 256)) % (1 << 256)
    return (wide(nprime, ND).astype(np.float32),
            wide(mod.n, 2 * ND).astype(np.float32))


def _split9(v, drop_top_hi: bool):
    """(32,B) values <= 511 -> (64,B) lo||hi bf16 for the wide dots."""
    lo = v & _M8
    hi = v >> np.uint32(8)
    if drop_top_hi:
        rowid = jax.lax.broadcasted_iota(jnp.uint32, (ND, 1), 0)
        hi = jnp.where(rowid == np.uint32(ND - 1), np.uint32(0), hi)
    return _u32_to_bf16(jnp.concatenate([lo, hi], axis=0))


def redc_v2(t256, w_, w, nd, mont_friendly: bool):
    """mont_friendly (2n < R, e.g. BN254): skip resolves #1 AND #2;
    otherwise (secp256k1, n ~ R) skip #1 only and keep m canonical."""
    tl = _fold(t256[:ND], ND)
    m256 = _f32_to_u32(jnp.dot(w_, _split9(tl, True),
                               preferred_element_type=jnp.float32))
    if mont_friendly:
        mf = _fold(m256, ND)
        u256 = _f32_to_u32(jnp.dot(w, _split9(mf, True),
                                   preferred_element_type=jnp.float32))
    else:
        m, _ = _resolve(_fold(m256, ND))
        mh = jnp.concatenate([m, m & np.uint32(0)], axis=0)
        u256 = _f32_to_u32(jnp.dot(w, _u32_to_bf16(mh),
                                   preferred_element_type=jnp.float32))
    sn, _ = _resolve(_fold(u256 + t256, 66))
    return _cond_sub(sn[ND:2 * ND], sn[2 * ND:2 * ND + 1], nd)


def mul_v1(a, b, tabs):
    return pc._f_mul(a, b, tabs)


def mul_v2(conv, mf, a, b, w_, w, nd):
    return redc_v2(conv(a, b), w_, w, nd, mf)


# --- harness -----------------------------------------------------------------

def _mk_call(body, n_in=2):
    spec = pl.BlockSpec((1, ND, BT), lambda k: (k, 0, 0),
                        memory_space=pltpu.VMEM)
    fixed = lambda k: (0, 0)  # noqa: E731
    t1 = pl.BlockSpec((ND, ND), fixed, memory_space=pltpu.VMEM)
    t2 = pl.BlockSpec((2 * ND, ND), fixed, memory_space=pltpu.VMEM)
    t3 = pl.BlockSpec((ND, 64), fixed, memory_space=pltpu.VMEM)
    t4 = pl.BlockSpec((2 * ND, 64), fixed, memory_space=pltpu.VMEM)
    nd_s = pl.BlockSpec((ND, 1), fixed, memory_space=pltpu.VMEM)
    out = jax.ShapeDtypeStruct((STEPS, ND, BT), jnp.uint32)
    return jax.jit(pl.pallas_call(
        body,
        grid=(STEPS,),
        in_specs=[spec] * 2 + [t1, t2, t3, t4, nd_s, nd_s],
        out_specs=spec,
        out_shape=out,
    ))


def _body(fn, nmul, a_ref, b_ref, mN__r, mN_r, w__r, w_r, nd_r, rd_r, o):
    a = a_ref[0]
    b = b_ref[0]
    for _ in range(nmul):
        a = fn(a, b)
    o[0] = a


def timed(fn, args, label):
    def barrier(out):
        _ = np.asarray(out[0, 0, :1])

    barrier(fn(*args))
    t0 = time.perf_counter()
    for _ in range(3):
        barrier(fn(*args))
    dt = (time.perf_counter() - t0) / 3
    print(f"{label:12s} {dt*1e3:8.1f} ms  {dt/STEPS*1e6:7.3f} us/step")
    return dt


def check_exact(name, fn_pair, ops, n_mult=4):
    """Chained-mul exactness vs host ints (Montgomery semantics)."""
    mod = ops.fp
    rng = np.random.default_rng(3)
    B = 256
    av = [int(rng.integers(0, 1 << 62)) * int(rng.integers(0, 1 << 62))
          % mod.n for _ in range(B)]
    bv = [int(rng.integers(0, 1 << 62)) * int(rng.integers(0, 1 << 62))
          % mod.n for _ in range(B)]

    def digs(vals):
        d = np.zeros((ND, B), np.uint32)
        for j, v in enumerate(vals):
            for k in range(ND):
                d[k, j] = (v >> (8 * k)) & 0xFF
        return d

    a, b = digs(av), digs(bv)
    rinv = pow(1 << 256, -1, mod.n)
    want = list(av)
    for _ in range(n_mult):
        want = [(w * bb * rinv) % mod.n for w, bb in zip(want, bv)]

    got = np.asarray(fn_pair(a, b, n_mult))
    gotv = [sum(int(got[k, j]) << (8 * k) for k in range(ND))
            for j in range(B)]
    ok = gotv == want
    print(f"exact[{name}]: {'PASS' if ok else 'FAIL'}")
    if not ok:
        bad = [j for j in range(B) if gotv[j] != want[j]][:4]
        for j in bad:
            print(f"  lane {j}: got {gotv[j]:#x} want {want[j]:#x}")
    return ok


def main():
    for name, ops in (("secp256k1", secp256k1()), ("bn254", bn254())):
        mod = ops.fp
        mf = (2 * mod.n) < (1 << 256)
        print(f"== {name} (mont_friendly={mf})")
        tabs = pc._curve_tables(mod)
        w_, w = _v2_tables(mod)
        rng = np.random.default_rng(0)
        a = jnp.asarray(rng.integers(0, 256, (STEPS, ND, BT), np.uint32))
        b = jnp.asarray(rng.integers(0, 256, (STEPS, ND, BT), np.uint32))
        args = (a, b, jnp.asarray(tabs[0]), jnp.asarray(tabs[1]),
                jnp.asarray(w_), jnp.asarray(w),
                jnp.asarray(tabs[2]), jnp.asarray(tabs[3]))

        def fn_v1(x, y, t=tabs):
            return pc._f_mul(x, y, (jnp.asarray(t[0]), jnp.asarray(t[1]),
                                    jnp.asarray(t[2]), jnp.asarray(t[3])))

        # interpret-mode exactness for v2
        def chain_v2(ad, bd, n):
            spec = pl.BlockSpec(memory_space=pltpu.VMEM)

            def body(a_r, b_r, w__r, w_r, nd_r, o_r):
                x = a_r[:]
                for _ in range(n):
                    x = redc_v2(conv_kara(x, b_r[:]), w__r[:], w_r[:],
                                nd_r[:], mf)
                o_r[:] = x
            call = pl.pallas_call(
                body,
                in_specs=[spec] * 5,
                out_specs=spec,
                out_shape=jax.ShapeDtypeStruct(ad.shape, jnp.uint32),
                interpret=jax.default_backend() != "tpu",
            )
            return call(jnp.asarray(ad), jnp.asarray(bd), jnp.asarray(w_),
                        jnp.asarray(w), jnp.asarray(tabs[2]))

        check_exact(f"{name}/v2+kara", chain_v2, ops)
        # NOTE: chained-mul timing here proved too noisy (a ~48 us/step
        # fixed cost swamps per-mul differences at this grid shape);
        # per-variant timing is measured in the real bucket kernel via
        # profile_msm_kernel.py instead. _ = args silences lints.
        _ = args, timed, _mk_call, _body, mul_v1, mul_v2, partial


if __name__ == "__main__":
    main()
