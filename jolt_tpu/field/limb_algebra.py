"""Unrolled limb algebra on plain lists of per-limb arrays.

The Pallas-tier twin of `ops.py`: inside a Mosaic kernel the whole body is
one compilation unit, so full unrolling (400-term schoolbook, explicit
carry chains) is affordable and keeps every intermediate in registers/VMEM.
Used ONLY inside pallas kernel bodies; the jnp tier stays rolled.

All values are uint32 arrays of identical shape; limbs little-endian,
13 bits each (see params.py for the no-carry column bound).
"""

from __future__ import annotations

from typing import List, Sequence

import jax.numpy as jnp
import numpy as np

from .params import FieldParams, LIMB_BITS, LIMB_MASK

_MASK = np.uint32(LIMB_MASK)
_W = LIMB_BITS


def propagate(cols: List[jnp.ndarray], n: int) -> List[jnp.ndarray]:
    out = []
    carry = None
    for k in range(n):
        v = cols[k] if carry is None else cols[k] + carry
        out.append(v & _MASK)
        carry = v >> _W
    return out


def sub_p_select(limbs: List[jnp.ndarray], fp: FieldParams) -> List[jnp.ndarray]:
    p = fp.p_limbs
    diff = []
    borrow = None
    for k in range(fp.num_limbs):
        d = limbs[k] - np.uint32(p[k]) if borrow is None \
            else limbs[k] - np.uint32(p[k]) - borrow
        diff.append(d & _MASK)
        borrow = d >> np.uint32(31)
    keep = borrow.astype(jnp.bool_)
    return [jnp.where(keep, l, d) for l, d in zip(limbs, diff)]


def add(a: List[jnp.ndarray], b: List[jnp.ndarray], fp: FieldParams) -> List[jnp.ndarray]:
    return sub_p_select(propagate([x + y for x, y in zip(a, b)], fp.num_limbs), fp)


def sub(a: List[jnp.ndarray], b: List[jnp.ndarray], fp: FieldParams) -> List[jnp.ndarray]:
    p = fp.p_limbs
    pb = []
    borrow = None
    for k in range(fp.num_limbs):
        d = np.uint32(p[k]) - b[k] if borrow is None \
            else np.uint32(p[k]) - b[k] - borrow
        pb.append(d & _MASK)
        borrow = d >> np.uint32(31)
    return sub_p_select(propagate([x + y for x, y in zip(a, pb)], fp.num_limbs), fp)


def mont_mul(a: List[jnp.ndarray], b: List[jnp.ndarray],
             fp: FieldParams) -> List[jnp.ndarray]:
    """Fully-unrolled schoolbook + base-2^13 Montgomery reduction."""
    n = fp.num_limbs
    cols: List[jnp.ndarray] = [None] * (2 * n + 1)  # type: ignore
    for i in range(n):
        ai = a[i]
        for j in range(n):
            t = ai * b[j]
            k = i + j
            cols[k] = t if cols[k] is None else cols[k] + t
    zero = jnp.zeros_like(a[0])
    cols = [c if c is not None else zero for c in cols]

    p = [np.uint32(v) for v in fp.p_limbs]
    n0 = np.uint32(fp.n0inv)
    for i in range(n):
        m = (cols[i] * n0) & _MASK
        for j in range(n):
            cols[i + j] = cols[i + j] + m * p[j]
        cols[i + 1] = cols[i + 1] + (cols[i] >> _W)
    return sub_p_select(propagate(cols[n:2 * n], n), fp)
