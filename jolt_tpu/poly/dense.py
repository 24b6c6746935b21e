"""Dense multilinear polynomials as field limb arrays.

TPU-native analog of the reference's `DensePolynomial`/`MultilinearPolynomial`
(`crates/jolt-prover-legacy/src/poly/dense_mlpoly.rs`,
`crates/jolt-poly/src/dense.rs`).

An n-variable MLE over Fr is an array of shape ``(NUM_LIMBS, 2**n)`` of
evaluations over the boolean hypercube, index bits big-endian: variable 0 is
the MSB of the index (matches `EqPolynomial::evals`' convention,
`poly/eq_poly.rs:116-119`).

Binding orders (dense_mlpoly.rs:71-97):
  * HighToLow ("top"): bind the MSB variable; P'[i] = P[i] + r*(P[i+T/2]-P[i])
  * LowToHigh ("bot"): bind the LSB variable; P'[i] = P[2i] + r*(P[2i+1]-P[2i])
"""

from __future__ import annotations

from functools import partial
from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp

from ..field import FR, FieldParams, ops


@partial(jax.jit, static_argnames=('fp',))
def bind_high(P: jnp.ndarray, r: jnp.ndarray, fp: FieldParams = FR) -> jnp.ndarray:
    """Bind the MSB variable to challenge r (Montgomery scalar (L,1))."""
    half = P.shape[-1] // 2
    lo, hi = P[..., :half], P[..., half:]
    return ops.add(lo, ops.mont_mul(r, ops.sub(hi, lo, fp), fp), fp)


@partial(jax.jit, static_argnames=('fp',))
def bind_low(P: jnp.ndarray, r: jnp.ndarray, fp: FieldParams = FR) -> jnp.ndarray:
    """Bind the LSB variable to challenge r."""
    L = P.shape[0]
    half = P.shape[-1] // 2
    Pr = P.reshape(P.shape[:-1] + (half, 2))
    lo, hi = Pr[..., 0], Pr[..., 1]
    return ops.add(lo, ops.mont_mul(r, ops.sub(hi, lo, fp), fp), fp)


def bind(P: jnp.ndarray, r: jnp.ndarray, order: str, fp: FieldParams = FR) -> jnp.ndarray:
    return (bind_high if order == "high" else bind_low)(P, r, fp)


def evaluate(P: jnp.ndarray, point: Sequence[int], fp: FieldParams = FR) -> int:
    """Evaluate the MLE at a host-side point (list of ints, point[0] = MSB var).

    Host loop of device binds; used for tests and small verifier-side work.
    """
    assert P.shape[-1] == 1 << len(point)
    for r in point:  # bind MSB first -> HighToLow over the whole point
        P = bind_high(P, ops.pack_ints([r], fp), fp)
    return ops.unpack_ints(P, fp)[0]


@partial(jax.jit, static_argnames=('degree', 'fp'))
def sumcheck_eval_points_high(P: jnp.ndarray, degree: int, fp: FieldParams = FR):
    """Per-index univariate evals at X in {0, 2, 3, ..., degree} for the MSB
    variable: returns array (L, degree, T/2) -- limbs-first, eval-point axis
    second; entry [:, 0] is X=0, entry [:, j>=1] is X=j+1.  Matches
    `sumcheck_evals` semantics (dense_mlpoly.rs:552-584): eval(X) =
    lo + X*(hi-lo), computed by repeated addition of the slope.
    """
    half = P.shape[-1] // 2
    lo, hi = P[..., :half], P[..., half:]
    outs = [lo]
    if degree >= 2:
        m = ops.sub(hi, lo, fp)
        cur = ops.add(hi, m, fp)  # X=2
        outs.append(cur)
        for _ in range(3, degree + 1):
            cur = ops.add(cur, m, fp)
            outs.append(cur)
    return jnp.stack(outs, axis=1)


@partial(jax.jit, static_argnames=('degree', 'fp'))
def sumcheck_eval_points_low(P: jnp.ndarray, degree: int, fp: FieldParams = FR):
    half = P.shape[-1] // 2
    Pr = P.reshape(P.shape[:-1] + (half, 2))
    lo, hi = Pr[..., 0], Pr[..., 1]
    outs = [lo]
    if degree >= 2:
        m = ops.sub(hi, lo, fp)
        cur = ops.add(hi, m, fp)
        outs.append(cur)
        for _ in range(3, degree + 1):
            cur = ops.add(cur, m, fp)
            outs.append(cur)
    return jnp.stack(outs, axis=1)


def from_ints(vals: Sequence[int], fp: FieldParams = FR) -> jnp.ndarray:
    return ops.pack_ints(vals, fp)


def from_u64_column(lo: jnp.ndarray, hi: jnp.ndarray, fp: FieldParams = FR) -> jnp.ndarray:
    return ops.from_u64(lo, hi, fp)
