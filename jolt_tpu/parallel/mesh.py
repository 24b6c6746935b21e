"""Device mesh + sharding layout for the cycle axis.

The reference scales with rayon over the trace/cycle axis (SURVEY.md §2.6
P1); the TPU-native analog shards MLE coefficient vectors over a 1-D
`Mesh(('cycle',))` of chips.

Layout: an MLE of length T on D devices is stored as ``(L, T//D, D)`` with
the LAST axis sharded -- global index g = i*D + d, i.e. each device owns the
subsequence with low bits == d.  Why low bits: HighToLow binding pairs index
g with g + T/2, which has the SAME low bits, so every sumcheck bind stays
device-local; cross-device traffic is only the tiny per-round `psum` of
message evaluations (deg+1 field elements).  The final log D rounds operate
on arrays of length D and fall back to the replicated dense path.

Field ops are exact (mod-p ints), so reduction order cannot change results:
bit-identical proofs across shardings for free (SURVEY.md §5.8).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def cycle_mesh(n_devices: Optional[int] = None) -> Mesh:
    devs = jax.devices()
    n = n_devices or len(devs)
    return Mesh(np.array(devs[:n]), ("cycle",))


# ---------------------------------------------------------------------------
# active-mesh context: shard the REAL prover
#
# Witness arrays created inside `use_mesh(mesh)` (via ops.pack_ints /
# ops.from_u64) are placed with their last (cycle/entry) axis sharded over
# the mesh; jit tracing propagates the shardings and GSPMD inserts the
# collectives (bind halvings -> collective-permutes, message sums -> psum).
# Field ops are exact mod-p ints, so proofs are BYTE-IDENTICAL across
# shardings (SURVEY.md §5.8 / reference invariant 8, "backend-invariant
# proof bytes", specs/clean-slate-prover.md:226-233) -- enforced by
# tests/test_sharded_prove.py.
# ---------------------------------------------------------------------------

_ACTIVE: list = []


def active_mesh() -> Optional[Mesh]:
    return _ACTIVE[-1] if _ACTIVE else None


class use_mesh:
    """Context manager: shard witness-array creation over `mesh`."""

    def __init__(self, mesh: Mesh):
        self.mesh = mesh

    def __enter__(self):
        _ACTIVE.append(self.mesh)
        return self.mesh

    def __exit__(self, *exc):
        _ACTIVE.pop()
        return False


def maybe_shard(arr: jnp.ndarray) -> jnp.ndarray:
    """Shard the last axis over the active mesh when it divides evenly;
    replicate otherwise.  No-op without an active mesh."""
    mesh = active_mesh()
    if mesh is None:
        return arr
    D = mesh.devices.size
    if arr.ndim >= 1 and arr.shape[-1] >= D and arr.shape[-1] % D == 0:
        spec = P(*([None] * (arr.ndim - 1) + ["cycle"]))
    else:
        spec = P(*([None] * arr.ndim))
    return jax.device_put(arr, NamedSharding(mesh, spec))


def shard_mle(mle: jnp.ndarray, mesh: Mesh) -> jnp.ndarray:
    """(L, T) -> (L, T//D, D), last axis sharded over 'cycle' (low index bits)."""
    D = mesh.devices.size
    L, T = mle.shape
    assert T % D == 0, f"T={T} not divisible by D={D}"
    resh = mle.reshape(L, T // D, D)  # [l, i, d] = mle[l, i*D + d]
    return jax.device_put(resh, NamedSharding(mesh, P(None, None, "cycle")))


def unshard_mle(sharded: jnp.ndarray) -> jnp.ndarray:
    L, M, D = sharded.shape
    return jax.device_get(sharded).reshape(L, M * D)
