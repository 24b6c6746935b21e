"""Sparse Twist RAM relations vs direct dense computation.

Validates the sorted-sparse-entry machinery (relations/ram_sparse.py)
against a straightforward host-side dense model of the same K x T
matrices: input claims computed densely, prove/verify roundtrips through
the real engine, terminal openings cross-checked against dense MLE
evaluations at the normalized opening points, and tamper rejection.
"""

import random

import numpy as np
import pytest

from jolt_tpu.field.params import FR
from jolt_tpu.relations.ram_sparse import (
    RamPairSchedule, SparseRamOutputCheck, SparseRamOutputCheckVerifier,
    SparseRamRafEvaluation, SparseRamRafEvaluationVerifier,
    SparseRamReadWriteChecking, SparseRamReadWriteCheckingVerifier,
    SparseRamValEvaluation, SparseRamValEvaluationVerifier)
from jolt_tpu.sumcheck.engine import (BatchedSumcheck, OpeningAccumulator,
                                      SumcheckError)
from jolt_tpu.transcript import Blake2bTranscript

P = FR.modulus
T, LOG_T = 16, 4
K, LOG_K = 8, 3
WB = 0x7FFFF000


def eq_int(a, b):
    acc = 1
    for x, y in zip(a, b):
        acc = acc * ((x * y + (1 - x) * (1 - y)) % P) % P
    return acc


def lt_int(j, point):
    """LT(j, point): MLE of [x < y] at x = bits(j), y = point."""
    n = len(point)
    acc = 0
    eqacc = 1
    for i in range(n):
        xb = (j >> (n - 1 - i)) & 1
        yb = point[i]
        acc = (acc + eqacc * ((1 - xb) * yb % P)) % P
        eqacc = eqacc * ((xb * yb + (1 - xb) * (1 - yb)) % P) % P
    return acc


def eq_table(point):
    tab = [1]
    for r in point:
        tab = [w * v % P for w in tab for v in ((1 - r) % P, r)]
    return tab


def mle_eval(vals, point):
    """Dense MLE evaluation at a host point (big-endian vars)."""
    cur = [v % P for v in vals]
    for r in point:
        half = len(cur) // 2
        cur = [(cur[i] + r * (cur[i + half] - cur[i])) % P
               for i in range(half)]
    return cur[0]


@pytest.fixture(scope="module")
def access_pattern():
    rng = random.Random(42)
    cols = np.zeros(T, dtype=np.int64)
    pre = np.zeros(T, dtype=np.uint64)
    post = np.zeros(T, dtype=np.uint64)
    init_vals = {3: 777, 5: 123456789}
    mem = dict(init_vals)
    inc = [0] * T
    for j in range(T):
        k = rng.choice([0, 0, 1, 2, 3, 5, 6])  # repeats + idle cycles
        cols[j] = k
        if k:
            pre[j] = mem.get(k, 0)
            if rng.random() < 0.6:
                post[j] = rng.randrange(1 << 32)
                mem[k] = int(post[j])
            else:
                post[j] = pre[j]
            inc[j] = (int(post[j]) - int(pre[j])) % P
    return cols, pre, post, inc, init_vals


def dense_model(access):
    """ra[k][j], val[k][j] (value BEFORE cycle j) as python ints."""
    cols, pre, post, inc, init_vals = access
    ra = [[0] * T for _ in range(K)]
    val = [[0] * T for _ in range(K)]
    mem = dict(init_vals)
    for j in range(T):
        for k in range(K):
            val[k][j] = mem.get(k, 0)
        k = int(cols[j])
        ra[k][j] = 1
        if k and post[j] != pre[j]:
            mem[k] = int(post[j])
    return ra, val


def cycle_major(mat):
    """[k][j] -> flat MLE coefficients with vars (cycle, address)."""
    return [mat[k][j] for j in range(T) for k in range(K)]


def test_rw_checking_roundtrip(access_pattern):
    cols, pre, post, inc, init_vals = access_pattern
    ra, val = dense_model(access_pattern)
    rng = random.Random(7)
    r_cycle = [rng.randrange(P) for _ in range(LOG_T)]
    gamma = rng.randrange(P)
    E = eq_table(r_cycle)
    rv = sum(E[j] * val[int(cols[j])][j] for j in range(T)) % P
    wv = sum(E[j] * (val[int(cols[j])][j] + inc[j]) for j in range(T)) % P

    sched = RamPairSchedule(cols, pre, post, K)
    inst = SparseRamReadWriteChecking(sched, LOG_K, init_vals, inc, gamma,
                                      r_cycle, rv, wv)
    acc = OpeningAccumulator()
    tr = Blake2bTranscript(b"t")
    polys, r = BatchedSumcheck.prove([inst], acc, tr)

    # terminal openings match the dense MLEs at the normalized point
    pt = inst.normalize_opening_point(r)
    assert inst.final_openings["ra"] == mle_eval(cycle_major(ra), pt)
    assert inst.final_openings["val"] == mle_eval(cycle_major(val), pt)
    assert inst.final_openings["inc"] == mle_eval(inc, pt[:LOG_T])

    # verifier roundtrip
    ver = SparseRamReadWriteCheckingVerifier(
        LOG_T, LOG_K, gamma, r_cycle, rv, wv, inst.final_openings)
    acc2 = OpeningAccumulator()
    tr2 = Blake2bTranscript(b"t")
    BatchedSumcheck.verify(polys, [ver], acc2, tr2)

    # tamper: wrong rv claim must fail
    bad = SparseRamReadWriteCheckingVerifier(
        LOG_T, LOG_K, gamma, r_cycle, (rv + 1) % P, wv, inst.final_openings)
    with pytest.raises(SumcheckError):
        BatchedSumcheck.verify(polys, [bad], OpeningAccumulator(),
                               Blake2bTranscript(b"t"))


def test_raf_evaluation_roundtrip(access_pattern):
    cols, pre, post, inc, init_vals = access_pattern
    rng = random.Random(8)
    r_cycle = [rng.randrange(P) for _ in range(LOG_T)]
    E = eq_table(r_cycle)
    A = [0] + [WB + 8 * (k - 1) for k in range(1, K)]
    addr_claim = sum(E[j] * A[int(cols[j])] for j in range(T)) % P

    sched = RamPairSchedule(cols, pre, post, K)
    inst = SparseRamRafEvaluation(sched, LOG_K, WB, r_cycle, addr_claim)
    acc = OpeningAccumulator()
    tr = Blake2bTranscript(b"t")
    polys, r = BatchedSumcheck.prove([inst], acc, tr)

    ra, _ = dense_model(access_pattern)
    pt = inst.normalize_opening_point(r)
    assert inst.final_openings["ra"] == mle_eval(cycle_major(ra), pt)

    ver = SparseRamRafEvaluationVerifier(LOG_T, LOG_K, r_cycle, addr_claim,
                                         WB, inst.final_openings)
    BatchedSumcheck.verify(polys, [ver], OpeningAccumulator(),
                           Blake2bTranscript(b"t"))


def test_val_evaluation_roundtrip(access_pattern):
    cols, pre, post, inc, init_vals = access_pattern
    ra, val = dense_model(access_pattern)
    rng = random.Random(9)
    r_addr = [rng.randrange(P) for _ in range(LOG_K)]
    r_cyc = [rng.randrange(P) for _ in range(LOG_T)]
    # claim: Val(r_addr, r_cyc) evaluated densely (address-major MLE vars
    # (addr, cycle) -- match the relation's statement)
    val_am = [val[k][j] for k in range(K) for j in range(T)]
    val_claim = mle_eval(val_am, list(r_addr) + list(r_cyc))

    sched = RamPairSchedule(cols, pre, post, K)
    inst = SparseRamValEvaluation(sched, LOG_K, init_vals, inc, r_addr,
                                  r_cyc, val_claim)
    acc = OpeningAccumulator()
    tr = Blake2bTranscript(b"t")
    polys, r = BatchedSumcheck.prove([inst], acc, tr)

    pt = inst.normalize_opening_point(r)
    assert inst.final_openings["ra"] == mle_eval(cycle_major(ra), pt)

    ver = SparseRamValEvaluationVerifier(LOG_T, LOG_K, r_addr, r_cyc,
                                         val_claim, init_vals,
                                         inst.final_openings)
    BatchedSumcheck.verify(polys, [ver], OpeningAccumulator(),
                           Blake2bTranscript(b"t"))


class _Layout:
    def __init__(self, out_start, out_end, input_start):
        self.output_start = out_start
        self.output_end = out_end
        self.input_start = input_start


def test_output_check_roundtrip(access_pattern):
    cols, pre, post, inc, init_vals = access_pattern
    rng = random.Random(10)
    z = rng.randrange(P)
    # output region = cells 1..2 (two dwords right after witness base)
    layout = _Layout(WB, WB + 16, WB)
    # final values: replay
    mem = dict(init_vals)
    for j in range(T):
        k = int(cols[j])
        if k and post[j] != pre[j]:
            mem[k] = int(post[j])
    outputs = b"".join(int(mem.get(k, 0)).to_bytes(8, "little")
                       for k in (1, 2))

    sched = RamPairSchedule(cols, pre, post, K)
    inst = SparseRamOutputCheck(sched, LOG_K, init_vals, inc, layout, WB, z,
                                outputs)
    polys, r = BatchedSumcheck.prove([inst], OpeningAccumulator(),
                                     Blake2bTranscript(b"t"))
    ver = SparseRamOutputCheckVerifier(LOG_T, LOG_K, z, outputs, layout, WB,
                                       init_vals, inst.final_openings)
    BatchedSumcheck.verify(polys, [ver], OpeningAccumulator(),
                           Blake2bTranscript(b"t"))

    # lying about an output byte must fail
    bad_out = bytes([outputs[0] ^ 1]) + outputs[1:]
    bad = SparseRamOutputCheckVerifier(LOG_T, LOG_K, z, bad_out, layout, WB,
                                       init_vals, inst.final_openings)
    with pytest.raises(SumcheckError):
        BatchedSumcheck.verify(polys, [bad], OpeningAccumulator(),
                               Blake2bTranscript(b"t"))


def test_batched_all_four(access_pattern):
    """All four relations batch in one stage (the prover's usage shape)."""
    cols, pre, post, inc, init_vals = access_pattern
    ra, val = dense_model(access_pattern)
    rng = random.Random(11)
    r_cycle = [rng.randrange(P) for _ in range(LOG_T)]
    gamma = rng.randrange(P)
    E = eq_table(r_cycle)
    rv = sum(E[j] * val[int(cols[j])][j] for j in range(T)) % P
    wv = sum(E[j] * (val[int(cols[j])][j] + inc[j]) for j in range(T)) % P
    A = [0] + [WB + 8 * (k - 1) for k in range(1, K)]
    addr_claim = sum(E[j] * A[int(cols[j])] for j in range(T)) % P

    sched = RamPairSchedule(cols, pre, post, K)
    i1 = SparseRamReadWriteChecking(sched, LOG_K, init_vals, inc, gamma,
                                    r_cycle, rv, wv)
    i2 = SparseRamRafEvaluation(sched, LOG_K, WB, r_cycle, addr_claim)
    acc = OpeningAccumulator()
    tr = Blake2bTranscript(b"t")
    polys, r = BatchedSumcheck.prove([i1, i2], acc, tr)

    v1 = SparseRamReadWriteCheckingVerifier(
        LOG_T, LOG_K, gamma, r_cycle, rv, wv, i1.final_openings)
    v2 = SparseRamRafEvaluationVerifier(LOG_T, LOG_K, r_cycle, addr_claim,
                                        WB, i2.final_openings)
    BatchedSumcheck.verify(polys, [v1, v2], OpeningAccumulator(),
                           Blake2bTranscript(b"t"))
