"""Field arithmetic vs a pure-Python int oracle.

Mirrors the reference test strategy (SURVEY.md §4.1-4.2): every optimized
kernel is equivalence-tested against a naive twin at harness scale.
"""
import random

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from jolt_tpu.field import FR, FQ, ops
from jolt_tpu.field.params import limbs_to_int


def rand_ints(rng, n, fp):
    return [rng.randrange(fp.modulus) for _ in range(n)]


@pytest.mark.parametrize("fp", [FR, FQ], ids=["Fr", "Fq"])
def test_pack_roundtrip(fp):
    rng = random.Random(1)
    vals = rand_ints(rng, 17, fp) + [0, 1, fp.modulus - 1]
    a = ops.pack_ints(vals, fp)
    assert a.shape == (fp.num_limbs, len(vals))
    assert ops.unpack_ints(a, fp) == vals


@pytest.mark.parametrize("fp", [FR, FQ], ids=["Fr", "Fq"])
def test_add_sub_neg(fp):
    rng = random.Random(2)
    n = 64
    xs, ys = rand_ints(rng, n, fp), rand_ints(rng, n, fp)
    # include edge cases
    xs[0], ys[0] = 0, 0
    xs[1], ys[1] = fp.modulus - 1, fp.modulus - 1
    xs[2], ys[2] = fp.modulus - 1, 1
    a, b = ops.pack_ints(xs, fp), ops.pack_ints(ys, fp)
    assert ops.unpack_ints(ops.add(a, b, fp), fp) == [(x + y) % fp.modulus for x, y in zip(xs, ys)]
    assert ops.unpack_ints(ops.sub(a, b, fp), fp) == [(x - y) % fp.modulus for x, y in zip(xs, ys)]
    assert ops.unpack_ints(ops.neg(a, fp), fp) == [(-x) % fp.modulus for x in xs]


@pytest.mark.parametrize("fp", [FR, FQ], ids=["Fr", "Fq"])
def test_mont_mul(fp):
    rng = random.Random(3)
    n = 64
    xs, ys = rand_ints(rng, n, fp), rand_ints(rng, n, fp)
    xs[0], ys[0] = 0, rng.randrange(fp.modulus)
    xs[1], ys[1] = 1, rng.randrange(fp.modulus)
    xs[2], ys[2] = fp.modulus - 1, fp.modulus - 1
    a, b = ops.pack_ints(xs, fp), ops.pack_ints(ys, fp)
    got = ops.unpack_ints(ops.mont_mul(a, b, fp), fp)
    assert got == [(x * y) % fp.modulus for x, y in zip(xs, ys)]


def test_mont_mul_jit_and_broadcast():
    rng = random.Random(4)
    xs = rand_ints(rng, 32, FR)
    s = rng.randrange(FR.modulus)
    a = ops.pack_ints(xs, FR)
    b = ops.pack_ints([s], FR)  # (20, 1) broadcasts
    f = jax.jit(lambda a, b: ops.mont_mul(a, b, FR))
    got = ops.unpack_ints(f(a, b), FR)
    assert got == [(x * s) % FR.modulus for x in xs]


def test_from_u64_i64_u32():
    rng = random.Random(5)
    vals = [rng.randrange(1 << 64) for _ in range(40)] + [0, 1, (1 << 64) - 1]
    lo = jnp.asarray(np.array([v & 0xFFFFFFFF for v in vals], dtype=np.uint32))
    hi = jnp.asarray(np.array([v >> 32 for v in vals], dtype=np.uint32))
    got = ops.unpack_ints(ops.from_u64(lo, hi, FR), FR)
    assert got == [v % FR.modulus for v in vals]

    ivals = [rng.randrange(-(1 << 63), 1 << 63) for _ in range(40)] + [0, -1, -(1 << 63), (1 << 63) - 1]
    enc = [v & ((1 << 64) - 1) for v in ivals]
    lo = jnp.asarray(np.array([v & 0xFFFFFFFF for v in enc], dtype=np.uint32))
    hi = jnp.asarray(np.array([v >> 32 for v in enc], dtype=np.uint32))
    got = ops.unpack_ints(ops.from_i64(lo, hi, FR), FR)
    assert got == [v % FR.modulus for v in ivals]

    u32s = [rng.randrange(1 << 32) for _ in range(16)]
    got = ops.unpack_ints(ops.from_u32(jnp.asarray(np.array(u32s, dtype=np.uint32)), FR), FR)
    assert got == [v % FR.modulus for v in u32s]


def test_inv_and_pow():
    rng = random.Random(6)
    xs = rand_ints(rng, 8, FR)
    xs[0] = 1
    a = ops.pack_ints(xs, FR)
    got = ops.unpack_ints(ops.inv(a, FR), FR)
    assert got == [pow(x, -1, FR.modulus) for x in xs]
    # inv(0) == 0
    z = ops.pack_ints([0], FR)
    assert ops.unpack_ints(ops.inv(z, FR), FR) == [0]
    # pow
    e = 0xDEADBEEF12345
    got = ops.unpack_ints(ops.pow_const(a, e, FR), FR)
    assert got == [pow(x, e, FR.modulus) for x in xs]


def test_batch_inverse():
    rng = random.Random(7)
    xs = rand_ints(rng, 33, FR)
    xs[5] = 0  # zero passes through as zero
    a = ops.pack_ints(xs, FR)
    got = ops.unpack_ints(ops.batch_inverse(a, FR), FR)
    want = [pow(x, -1, FR.modulus) if x else 0 for x in xs]
    assert got == want


def test_sum_and_dot():
    rng = random.Random(8)
    xs, ys = rand_ints(rng, 37, FR), rand_ints(rng, 37, FR)
    a, b = ops.pack_ints(xs, FR), ops.pack_ints(ys, FR)
    assert ops.unpack_ints(ops.sum_mod(a, FR), FR) == [sum(xs) % FR.modulus]
    assert ops.unpack_ints(ops.dot(a, b, FR), FR) == [
        sum(x * y for x, y in zip(xs, ys)) % FR.modulus]


def test_to_canonical_and_eq():
    rng = random.Random(9)
    xs = rand_ints(rng, 10, FR)
    a = ops.pack_ints(xs, FR)
    canon = ops.to_canonical(a, FR)
    assert [limbs_to_int(np.asarray(canon)[:, i]) for i in range(10)] == xs
    assert bool(ops.eq_mask(a, a).all())
    assert not bool(ops.eq_mask(a, ops.add(a, ops.ones((10,), FR), FR)).any())
