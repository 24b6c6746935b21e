"""Pallas kernel math vs the jnp tier.

The unrolled limb algebra used inside Mosaic kernel bodies is validated
here directly (the Pallas interpreter is impractically slow for 1300-op
bodies); the pallas_call plumbing itself is validated compiled on the real
TPU by bench.py and the TPU-side correctness probes.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from jolt_tpu.field import FR, ops
from jolt_tpu.field import limb_algebra as la
from jolt_tpu.poly import dense


def rand_limbs(rng, n):
    l = rng.integers(0, 1 << 13, size=(FR.num_limbs, n), dtype=np.uint32)
    l[-1] &= 0x7F
    return jnp.asarray(l)


def test_limb_algebra_matches_ops():
    rng = np.random.default_rng(3)
    a, b = rand_limbs(rng, 64), rand_limbs(rng, 64)
    al = [a[i] for i in range(FR.num_limbs)]
    bl = [b[i] for i in range(FR.num_limbs)]
    got = jnp.stack(la.mont_mul(al, bl, FR))
    want = ops.mont_mul(a, b, FR)
    assert (np.asarray(got) == np.asarray(want)).all()
    got = jnp.stack(la.add(al, bl, FR))
    assert (np.asarray(got) == np.asarray(ops.add(a, b, FR))).all()
    got = jnp.stack(la.sub(al, bl, FR))
    assert (np.asarray(got) == np.asarray(ops.sub(a, b, FR))).all()


def test_lazy_reduction_sum():
    rng = np.random.default_rng(5)
    import random
    pyrng = random.Random(9)
    xs = [pyrng.randrange(FR.modulus) for _ in range(1000)]
    a = ops.pack_ints(xs)
    got = ops.unpack_ints(ops.sum_mod(a, FR))
    assert got == [sum(xs) % FR.modulus]
