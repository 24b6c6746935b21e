"""Dory PCS: transparent setup, two-tier GT commit, open/verify, tamper
rejection, additive homomorphism."""

import random

import pytest

from jolt_tpu.curve import bn254_host as host
from jolt_tpu.curve.pairing import g2_mul
from jolt_tpu.field.params import FR_MODULUS as P
from jolt_tpu.pcs.dory import (Dory, DorySetup, gt_exp, gt_mul, hash_to_g1,
                               hash_to_g2)
from jolt_tpu.transcript import Blake2bTranscript

NUM_VARS = 6  # 8 x 8 matrix: keeps the pairing count test-friendly


@pytest.fixture(scope="module")
def setup():
    return DorySetup.generate(NUM_VARS)


@pytest.fixture(scope="module")
def opened(setup):
    rng = random.Random(11)
    coeffs = [rng.randrange(P) for _ in range(1 << NUM_VARS)]
    point = [rng.randrange(P) for _ in range(NUM_VARS)]
    # direct MLE evaluation (big-endian vars)
    cur = list(coeffs)
    for r in point:
        half = len(cur) // 2
        cur = [(cur[i] + r * (cur[i + half] - cur[i])) % P
               for i in range(half)]
    value = cur[0]
    dory = Dory(setup)
    com, hint = dory.commit(coeffs)
    tr = Blake2bTranscript(b"dory-test")
    proof = dory.open(coeffs, hint, point, value, tr)
    return dory, coeffs, point, value, com, proof


def test_generators_valid(setup):
    p1 = hash_to_g1(b"t")
    assert host.g1_is_on_curve(p1)
    p2 = hash_to_g2(b"t")
    from jolt_tpu.field.params import FR_MODULUS
    assert g2_mul(p2, FR_MODULUS) is None  # r-torsion after cofactor clear


def test_commit_open_verify(opened):
    dory, coeffs, point, value, com, proof = opened
    tr = Blake2bTranscript(b"dory-test")
    assert dory.verify(com, point, value, proof, tr)


def test_reject_wrong_value(opened):
    dory, coeffs, point, value, com, proof = opened
    tr = Blake2bTranscript(b"dory-test")
    assert not dory.verify(com, point, (value + 1) % P, proof, tr)


def test_reject_wrong_commitment(opened):
    dory, coeffs, point, value, com, proof = opened
    rng = random.Random(5)
    coeffs2 = list(coeffs)
    coeffs2[7] = (coeffs2[7] + 1) % P
    com2, _ = dory.commit(coeffs2)
    tr = Blake2bTranscript(b"dory-test")
    assert not dory.verify(com2, point, value, proof, tr)


def test_reject_tampered_proof(opened):
    import copy
    dory, coeffs, point, value, com, proof = opened
    bad = copy.deepcopy(proof)
    bad.b_final_s = (bad.b_final_s + 1) % P
    tr = Blake2bTranscript(b"dory-test")
    assert not dory.verify(com, point, value, bad, tr)
    bad2 = copy.deepcopy(proof)
    bad2.e1 = host.g1_mul(bad2.e1, 2)
    tr = Blake2bTranscript(b"dory-test")
    assert not dory.verify(com, point, value, bad2, tr)


def test_additive_homomorphism(setup):
    """RLC of commitments == commitment of RLC polynomial (the stage-8
    batched-opening property; GT group ops)."""
    rng = random.Random(77)
    dory = Dory(setup)
    f = [rng.randrange(P) for _ in range(1 << NUM_VARS)]
    g = [rng.randrange(P) for _ in range(1 << NUM_VARS)]
    mu = rng.randrange(P)
    cf, _ = dory.commit(f)
    cg, _ = dory.commit(g)
    h = [(a + mu * b) % P for a, b in zip(f, g)]
    ch, hint_h = dory.commit(h)
    combined = gt_mul(cf.c, gt_exp(cg.c, mu))
    assert combined == ch.c

    # and the combined commitment opens at a fresh point
    point = [rng.randrange(P) for _ in range(NUM_VARS)]
    cur = list(h)
    for r in point:
        half = len(cur) // 2
        cur = [(cur[i] + r * (cur[i + half] - cur[i])) % P
               for i in range(half)]
    tr = Blake2bTranscript(b"hom")
    proof = dory.open(h, hint_h, point, cur[0], tr)
    tr2 = Blake2bTranscript(b"hom")
    assert dory.verify(ch, point, cur[0], proof, tr2)
