"""Pedersen vector commitments over secp256k1 (the IPA scheme's MACs).

A block commitment is the 128-point MSM sum_i chunk_i * G_i over the
deterministic generators (reference Client.hpp:374-421 /
Server.hpp:329-361, which split the MSM over 8 threads). Here the whole
thing is one batched TPU kernel: blocks are committed in fixed-size
batches of COMMIT_BATCH so a single executable serves any workload.
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np

from porla_tpu.config import NUM_GENERATORS
from porla_tpu.crypto import testrand
from porla_tpu.curves import kernels
from porla_tpu.curves.instances import secp256k1
from porla_tpu.curves.weierstrass import JacPoint
from porla_tpu.golden import ecc

COMMIT_BATCH = 8  # blocks per kernel invocation (fixed -> one executable)


@lru_cache(maxsize=None)
def ipa_generators(num: int = NUM_GENERATORS):
    """(generators as JacPoint (num,), u point affine, list of affine)."""
    gens, u = testrand.derive_ipa_generators(num)
    ops = secp256k1()
    return ops.from_affine(np, gens), u, gens


@lru_cache(maxsize=None)
def alpha_generators(alpha: int, num: int = NUM_GENERATORS):
    """alpha*G_i (client side; Client.hpp:340-344) as JacPoint (num,)."""
    _, _, gens = ipa_generators(num)
    ops = secp256k1()
    pts = [ecc.mul(ecc.SECP256K1, g, alpha) for g in gens]
    return ops.from_affine(np, pts)


@lru_cache(maxsize=None)
def _commit_fn(nbits: int, ops=None):
    ops = ops or secp256k1()

    @jax.jit
    def f(gx, gy, gz, scalars):
        # scalars: (B, NG, 16); generators broadcast over B
        parts = ops.scalar_mul(jnp, JacPoint(gx[None], gy[None], gz[None]),
                               scalars, nbits)
        # reduce over the generator axis: move it to front
        parts = JacPoint(jnp.moveaxis(parts.x, 1, 0),
                         jnp.moveaxis(parts.y, 1, 0),
                         jnp.moveaxis(parts.z, 1, 0))
        out = ops.tree_sum(jnp, parts, axis=0)
        return out.x[0], out.y[0], out.z[0]

    return f


@lru_cache(maxsize=None)
def _reduce_commit_fn(ops: "object", ng: int):
    @jax.jit
    def f(px, py, pz):
        # (B*NG, 16) parts -> per-block sums over the generator axis
        def rearr(a):
            b = a.shape[0] // ng
            return jnp.moveaxis(a.reshape(b, ng, a.shape[-1]), 1, 0)
        out = ops.tree_sum(jnp, JacPoint(rearr(px), rearr(py), rearr(pz)),
                           axis=0)
        return out.x[0], out.y[0], out.z[0]
    return f


def commit_blocks(generators: JacPoint, scalars, nbits: int = 256,
                  ops=None) -> JacPoint:
    """scalars: (B, NUM_GENERATORS, 16) standard-form chunk values ->
    JacPoint batch (B,) of commitments (sum_i s_i * G_i over any curve).
    Processes in COMMIT_BATCH slices (padding the tail with zero scalars
    -> infinity contributions)."""
    from porla_tpu.curves import pallas_curve
    scalars = np.asarray(scalars, dtype=np.uint32)
    B = scalars.shape[0]
    if pallas_curve.use_pallas():
        ops = ops or secp256k1()
        ng = scalars.shape[1]
        bp = 1 << max(0, B - 1).bit_length()
        if B < bp:
            scalars = np.concatenate(
                [scalars, np.zeros((bp - B,) + scalars.shape[1:],
                                   np.uint32)], 0)
        gens = JacPoint(np.asarray(generators.x)[:ng],
                        np.asarray(generators.y)[:ng],
                        np.asarray(generators.z)[:ng])
        tbl = pallas_curve.fb_table_for(ops, gens, nbits)
        parts = pallas_curve.fb_scalar_mul(tbl,
                                           scalars.reshape(bp * ng, -1))
        out = JacPoint(*_reduce_commit_fn(ops, ng)(parts.x, parts.y,
                                                   parts.z))
        return JacPoint(out.x[:B], out.y[:B], out.z[:B])
    f = _commit_fn(nbits, ops)
    outs = []
    for s in range(0, B, COMMIT_BATCH):
        batch = scalars[s:s + COMMIT_BATCH]
        if batch.shape[0] < COMMIT_BATCH:
            pad = np.zeros((COMMIT_BATCH - batch.shape[0],) + batch.shape[1:],
                           np.uint32)
            batch = np.concatenate([batch, pad], axis=0)
        outs.append(JacPoint(*f(generators.x, generators.y, generators.z,
                                jnp.asarray(batch))))
    out = kernels.concat(outs)
    return JacPoint(out.x[:B], out.y[:B], out.z[:B])
