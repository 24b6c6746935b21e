"""Pallas TPU kernels for the field hot paths.

Tier rationale: the jnp ops (ops.py) keep graphs small via rolled loops,
paying HBM round-trips between fori_loop steps.  These kernels unroll the
full limb algebra (limb_algebra.py) inside one Mosaic body so the 40
product columns live in VMEM/registers, and fuse multi-op pipelines
(bind + message evals) into a single HBM pass.

Layout per block: (NUM_LIMBS, BLOCK_N) uint32 -- limbs on sublanes, batch
on lanes.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import limb_algebra as la
from .params import FR, FieldParams, NUM_LIMBS

BLOCK_N = 4096


def _unstack_ref(ref):
    """Per-limb views.  Refs are (L, S, 128): each limb slice is a proper
    (sublane, lane) 2-D VPU tile."""
    return [ref[i] for i in range(NUM_LIMBS)]


def _store(ref, limbs):
    for i, l in enumerate(limbs):
        ref[i, :] = l


def _mont_mul_kernel(a_ref, b_ref, o_ref):
    out = la.mont_mul(_unstack_ref(a_ref), _unstack_ref(b_ref), FR)
    _store(o_ref, out)


@jax.jit
def mont_mul(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Elementwise Montgomery multiply, Pallas tier.  a, b: (L, N)."""
    L, N = a.shape
    assert N % 128 == 0
    S = N // 128
    bs = min(BLOCK_N // 128, S)
    grid = (S // bs,)
    spec = pl.BlockSpec((L, bs, 128), lambda i: (0, i, 0), memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        _mont_mul_kernel,
        out_shape=jax.ShapeDtypeStruct((L, S, 128), jnp.uint32),
        grid=grid,
        in_specs=[spec, spec],
        out_specs=spec,
    )(a.reshape(L, S, 128), b.reshape(L, S, 128))
    return out.reshape(L, N)


def _round_kernel_deg3(lo0, hi0, lo1, hi1, lo2, hi2, r_ref,
                       msg_ref, b0_ref, b1_ref, b2_ref):
    """Fused product-sumcheck round (degree 3) for one block of index pairs:
    three message evals AND the bound polynomials in a single HBM pass.

    The per-block message contribution is LAZY-accumulated: mont_mul outputs
    are normalized 13-bit limbs, so summing BLOCK_N <= 2^18 of them in raw
    uint32 cannot overflow; msg_ref gets (L, 3) raw column sums per block,
    finished by `ops.reduce_lazy_cols` on the caller side.
    """
    fp = FR
    r = [r_ref[i] for i in range(NUM_LIMBS)]  # (1, 1) tiles broadcast
    acc = None
    for lo_ref, hi_ref, b_ref in ((lo0, hi0, b0_ref), (lo1, hi1, b1_ref),
                                  (lo2, hi2, b2_ref)):
        lo = _unstack_ref(lo_ref)
        hi = _unstack_ref(hi_ref)
        m = la.sub(hi, lo, fp)
        e2 = la.add(hi, m, fp)
        e3 = la.add(e2, m, fp)
        bound = la.add(lo, la.mont_mul(r, m, fp), fp)  # lo + r*(hi-lo)
        _store(b_ref, bound)
        evs = (lo, e2, e3)
        acc = list(evs) if acc is None else [
            la.mont_mul(acc[k], evs[k], fp) for k in range(3)]
    # Mosaic lacks unsigned reductions; block sums are < 2^23 so signed
    # int32 sums are bit-identical.
    sums = jnp.stack([
        jnp.stack([jnp.sum(acc[k][i].astype(jnp.int32)) for k in range(3)])
        for i in range(NUM_LIMBS)])  # (L, 3)
    msg_ref[0] = sums.astype(jnp.uint32)


@jax.jit
def product_round_deg3(p0, p1, p2, r):
    """One fused round for a 3-factor product sumcheck.

    p*: (L, T) MLEs (T even), r: (L, 1).  Returns
    (msg_lazy_cols (L, 3, nblocks) raw uint32 column sums, bound p*
    (L, T/2) each).  Finish with ops.reduce_lazy_cols + host interpolation.
    """
    L, T = p0.shape
    half = T // 2
    assert half % 128 == 0, "need T >= 256"
    S = half // 128
    bs = min(BLOCK_N // 128, S)
    blocks = S // bs
    assert blocks * bs == S
    lo_spec = pl.BlockSpec((L, bs, 128), lambda i: (0, i, 0),
                           memory_space=pltpu.VMEM)
    r_spec = pl.BlockSpec((L, 1, 1), lambda i: (0, 0, 0),
                          memory_space=pltpu.VMEM)
    msg_spec = pl.BlockSpec((1, L, 3), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)
    out_shapes = (
        jax.ShapeDtypeStruct((blocks, L, 3), jnp.uint32),
        jax.ShapeDtypeStruct((L, S, 128), jnp.uint32),
        jax.ShapeDtypeStruct((L, S, 128), jnp.uint32),
        jax.ShapeDtypeStruct((L, S, 128), jnp.uint32),
    )
    args = []
    for p in (p0, p1, p2):
        args.append(p[:, :half].reshape(L, S, 128))
        args.append(p[:, half:].reshape(L, S, 128))
    msg, b0, b1, b2 = pl.pallas_call(
        _round_kernel_deg3,
        out_shape=out_shapes,
        grid=(blocks,),
        in_specs=[lo_spec] * 6 + [r_spec],
        out_specs=(msg_spec, lo_spec, lo_spec, lo_spec),
    )(*args, r.reshape(L, 1, 1))
    return (msg.transpose(1, 2, 0), b0.reshape(L, half),
            b1.reshape(L, half), b2.reshape(L, half))
