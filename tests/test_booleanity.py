"""Sparse one-hot booleanity + Hamming-weight sumchecks (O(T) formulation)
prove/verify gates, including batching matrices of unequal dimensions."""
import random

import pytest

from jolt_tpu.field.params import FR
from jolt_tpu.relations.booleanity import (Booleanity, BooleanityVerifier,
                                           HammingWeight,
                                           HammingWeightVerifier)
from jolt_tpu.sumcheck.engine import (BatchedSumcheck, OpeningAccumulator,
                                      SumcheckError)
from jolt_tpu.transcript import Blake2bTranscript

P = FR.modulus


def _roundtrip(matrices, tamper=None):
    """matrices: list of (indices, K).  Returns True if verify passes."""
    rng = random.Random(5)
    log_T = (len(matrices[0][0])).bit_length() - 1
    max_log_K = max(K.bit_length() - 1 for _, K in matrices)

    tp = Blake2bTranscript(b"test")
    r_b = tp.challenge_vector(max_log_K + log_T)
    r_h = tp.challenge_vector(log_T)
    insts, vers = [], []
    for i, (idx, K) in enumerate(matrices):
        lk = K.bit_length() - 1
        r_addr = r_b[max_log_K - lk:max_log_K]
        r_cyc = r_b[max_log_K:]
        insts.append(Booleanity(idx, K, r_addr, r_cyc, f"m{i}"))
        insts.append(HammingWeight(idx, K, r_h, f"m{i}"))
    acc = OpeningAccumulator()
    polys, r = BatchedSumcheck.prove(insts, acc, tp)

    if tamper is not None:
        polys = [list(rp) for rp in polys]
        polys[tamper][0] = (polys[tamper][0] + 1) % P

    tv = Blake2bTranscript(b"test")
    r_b2 = tv.challenge_vector(max_log_K + log_T)
    r_h2 = tv.challenge_vector(log_T)
    assert r_b2 == r_b and r_h2 == r_h
    for i, (idx, K) in enumerate(matrices):
        lk = K.bit_length() - 1
        r_addr = r_b[max_log_K - lk:max_log_K]
        r_cyc = r_b[max_log_K:]
        inst = insts[2 * i]
        vers.append(BooleanityVerifier(lk, log_T, r_addr, r_cyc,
                                       inst.final_openings["m"]))
        vers.append(HammingWeightVerifier(lk, log_T, r_h,
                                          insts[2 * i + 1].final_openings["m"]))
    acc2 = OpeningAccumulator()
    try:
        BatchedSumcheck.verify(polys, vers, acc2, tv)
        return True
    except SumcheckError:
        return False


def test_booleanity_hamming_roundtrip():
    rng = random.Random(11)
    T = 16
    m1 = [rng.randrange(128) for _ in range(T)]   # K=128 (registers shape)
    m2 = [rng.randrange(8) for _ in range(T)]     # K=8 (small RAM)
    m3 = [rng.randrange(256) for _ in range(T)]   # K=256 (instr chunk)
    assert _roundtrip([(m1, 128), (m2, 8), (m3, 256)])


def test_booleanity_tamper_rejected():
    rng = random.Random(13)
    T = 16
    m1 = [rng.randrange(64) for _ in range(T)]
    assert not _roundtrip([(m1, 64)], tamper=0)
    assert not _roundtrip([(m1, 64)], tamper=5)
