"""Multi-chip sumcheck round kernels (pjit over the cycle mesh).

One full training-step analog for the prover: compute the batched round
message for a product sumcheck AND bind all factor MLEs, on MLEs sharded
over the low index bits (see `parallel/mesh.py`).  The message reduction
over the sharded device axis lowers to an XLA all-reduce over ICI; binds are
device-local.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..field import FR, FieldParams, ops


@partial(jax.jit, static_argnames=("degree", "fp"))
def sharded_round_step(polys: Tuple[jnp.ndarray, ...], r: jnp.ndarray,
                       degree: int, fp: FieldParams = FR):
    """One sumcheck round on sharded MLEs of shape (L, M, D).

    Returns (message_evals (L, degree, 1, 1), bound_polys (L, M/2, D)).
    The HighToLow bind splits axis 1 (the device-local axis); the message sum
    reduces over axes (M, D) -- XLA partitions the D-axis sum into a psum.
    `r` is the previous round's challenge (L, 1, 1); the caller interleaves
    challenge draws (host transcript) with these steps.
    """
    acc = None
    evals_per_poly = []
    for Pk in polys:
        half = Pk.shape[1] // 2
        lo, hi = Pk[:, :half], Pk[:, half:]
        outs = [lo]
        if degree >= 2:
            m = ops.sub(hi, lo, fp)
            cur = ops.add(hi, m, fp)
            outs.append(cur)
            for _ in range(3, degree + 1):
                cur = ops.add(cur, m, fp)
                outs.append(cur)
        e = jnp.stack(outs, axis=1)  # (L, deg, M/2, D)
        acc = e if acc is None else ops.mont_mul(acc, e, fp)
    # reduce the local (M/2) axis first, then the sharded device axis (the
    # latter is the cross-chip collective -- log D modular adds over ICI).
    part = ops.sum_mod(acc.swapaxes(2, 3), fp)      # (L, deg, D, 1)
    msg = ops.sum_mod(part[..., 0], fp)             # (L, deg, 1)
    bound = tuple(
        ops.add(Pk[:, :Pk.shape[1] // 2],
                ops.mont_mul(r, ops.sub(Pk[:, Pk.shape[1] // 2:],
                                        Pk[:, :Pk.shape[1] // 2], fp), fp), fp)
        for Pk in polys)
    return msg, bound
