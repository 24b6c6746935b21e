"""Device G1 kernels vs the host affine oracle."""
import random

import jax.numpy as jnp
import numpy as np
import pytest

from jolt_tpu.curve import bn254_host as host
from jolt_tpu.curve import (jacobian_add, jacobian_double, msm, msm_binary,
                            pack_points, tree_sum, unpack_points)


@pytest.fixture(scope="module")
def pts():
    rng = random.Random(42)
    return [host.g1_random(rng) for _ in range(16)]


def test_host_curve_sanity():
    rng = random.Random(1)
    p = host.g1_random(rng)
    assert host.g1_is_on_curve(p)
    assert host.g1_add(p, host.g1_neg(p)) is None
    assert host.g1_mul(host.G1_GEN, 0) is None


def test_pack_unpack_roundtrip(pts):
    P = pack_points(pts + [None])
    assert unpack_points(P) == pts + [None]


def test_double_and_add(pts):
    P = pack_points(pts)
    assert unpack_points(jacobian_double(P)) == [host.g1_double(p) for p in pts]

    shifted = pts[1:] + pts[:1]
    Q = pack_points(shifted)
    got = unpack_points(jacobian_add(P, Q))
    assert got == [host.g1_add(a, b) for a, b in zip(pts, shifted)]


def test_add_edge_cases(pts):
    p = pts[0]
    P = pack_points([p, p, p, None, p, None])
    Q = pack_points([p, host.g1_neg(p), None, p, None, None])
    got = unpack_points(jacobian_add(P, Q))
    assert got == [host.g1_double(p), None, p, p, p, None]


def test_tree_sum(pts):
    P = pack_points(pts)  # 16 points
    got = unpack_points(tree_sum(P))[0]
    want = None
    for p in pts:
        want = host.g1_add(want, p)
    assert got == want
    # non-power-of-two with infinities
    mixed = pts[:5] + [None, pts[6]]
    got = unpack_points(tree_sum(pack_points(mixed)))[0]
    want = None
    for p in mixed:
        want = host.g1_add(want, p)
    assert got == want


def test_msm_binary(pts):
    rng = random.Random(7)
    bits = [rng.randrange(2) for _ in range(len(pts))]
    got = unpack_points(msm_binary(pack_points(pts),
                                   jnp.asarray(np.array(bits, np.uint32))))[0]
    assert got == host.g1_msm(pts, bits)


def test_msm_u16(pts):
    rng = random.Random(8)
    scalars = [rng.randrange(1 << 16) for _ in range(len(pts))]
    got = unpack_points(msm(pack_points(pts),
                            jnp.asarray(np.array(scalars, np.uint32)), 16))[0]
    assert got == host.g1_msm(pts, scalars)
