"""HyperKZG commit/open/verify end-to-end with the device MSM."""
import random

import pytest

from jolt_tpu.field.params import FR
from jolt_tpu.pcs import HyperKZG, KZGSetup
from jolt_tpu.poly import dense
from jolt_tpu.transcript import Blake2bTranscript

P = FR.modulus
ELL = 5
N = 1 << ELL


@pytest.fixture(scope="module")
def scheme():
    return HyperKZG(KZGSetup.generate(N))


@pytest.fixture(scope="module")
def opening(scheme):
    rng = random.Random(99)
    coeffs = [rng.randrange(P) for _ in range(N)]
    point = [rng.randrange(P) for _ in range(ELL)]
    value = dense.evaluate(dense.from_ints(coeffs), point)
    commitment = scheme.commit_ints(coeffs)
    tp = Blake2bTranscript(b"hkzg_test")
    proof = scheme.open(coeffs, point, value, tp)
    return coeffs, point, value, commitment, proof


def test_commit_homomorphic(scheme):
    # C(a) + C(b) == C(a+b) -- additive homomorphism of the MSM commit
    from jolt_tpu.curve import bn254_host as host
    rng = random.Random(5)
    a = [rng.randrange(P) for _ in range(8)]
    b = [rng.randrange(P) for _ in range(8)]
    ca, cb = scheme.commit_ints(a), scheme.commit_ints(b)
    cab = scheme.commit_ints([(x + y) % P for x, y in zip(a, b)])
    assert host.g1_add(ca, cb) == cab


def test_open_verify(scheme, opening):
    coeffs, point, value, commitment, proof = opening
    tv = Blake2bTranscript(b"hkzg_test")
    assert scheme.verify(commitment, point, value, proof, tv)


def test_reject_wrong_value(scheme, opening):
    coeffs, point, value, commitment, proof = opening
    tv = Blake2bTranscript(b"hkzg_test")
    assert not scheme.verify(commitment, point, (value + 1) % P, proof, tv)


def test_reject_wrong_commitment(scheme, opening):
    coeffs, point, value, commitment, proof = opening
    from jolt_tpu.curve import bn254_host as host
    bad = host.g1_add(commitment, host.G1_GEN)
    tv = Blake2bTranscript(b"hkzg_test")
    assert not scheme.verify(bad, point, value, proof, tv)


def test_reject_tampered_witness(scheme, opening):
    coeffs, point, value, commitment, proof = opening
    import copy
    from jolt_tpu.curve import bn254_host as host
    bad = copy.deepcopy(proof)
    bad.witnesses[0] = host.g1_add(bad.witnesses[0], host.G1_GEN)
    tv = Blake2bTranscript(b"hkzg_test")
    assert not scheme.verify(commitment, point, value, bad, tv)
