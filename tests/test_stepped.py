"""Stepped sumcheck driver (one batched dispatch per round): byte-identity.

prove_stepped (sumcheck/stepped.py) is the stage-8 production tier on the
TPU: it reuses the ScanFusedInstance protocol but keeps the transcript on
the host, compiling one small round body per segment.  Proof bytes must
equal the host engine's exactly (same UniPoly recovery + transcript code
paths), including dormant-round claim halving and transitions/shrinks.
"""
import random

import pytest

from jolt_tpu.field.params import FR
from jolt_tpu.poly import eq
from jolt_tpu.relations.grouped_onehot import GroupedOneHot
from jolt_tpu.relations.opening_reduction import (DenseOpening,
                                                  SparseOneHotOpening)
from jolt_tpu.sumcheck.engine import BatchedSumcheck, OpeningAccumulator
from jolt_tpu.sumcheck.stepped import prove_stepped
from jolt_tpu.transcript import Blake2bTranscript

P = FR.modulus


def _run_both(make):
    acc_h = OpeningAccumulator()
    t_h = Blake2bTranscript(b"stepped-test")
    polys_h, r_h = BatchedSumcheck.prove(make(), acc_h, t_h)

    acc_s = OpeningAccumulator()
    t_s = Blake2bTranscript(b"stepped-test")
    polys_s, r_s = prove_stepped(make(), acc_s, t_s)

    assert polys_s == polys_h
    assert r_s == r_h
    assert t_s.state == t_h.state
    assert acc_s.openings == acc_h.openings


def _dense_instances():
    rng = random.Random(21)

    def mk(n, label):
        coeffs = [rng.randrange(P) for _ in range(1 << n)]
        point = [rng.randrange(P) for _ in range(n)]
        return DenseOpening(coeffs, point, rng.randrange(P), label)

    return [mk(5, "a"), mk(3, "b"), mk(5, "c")]


def test_stepped_dense_openings_match_host():
    """Mixed sizes: dormant rounds + shrink segments."""
    _run_both(_dense_instances)


def _stage8_shape_instances():
    """The production stage-8 mix: GroupedOneHot groups over two K values
    + a SparseOneHotOpening + dense singletons."""
    rng = random.Random(8)
    insts = []
    gamma = rng.randrange(P)
    for log_K, nm in ((3, 3), (2, 2)):
        K, log_T = 1 << log_K, 4
        T = 1 << log_T
        q = [rng.randrange(P) for _ in range(log_K + log_T)]
        W = eq.evals([x % P for x in q[log_K:]])
        streams, wts, qas, cls, labs = [], [], [], [], []
        for m in range(nm):
            s = [rng.randrange(K) for _ in range(T)]
            claim = 0
            for j, k in enumerate(s):
                a = 1
                for b, qb in enumerate(q[:log_K]):
                    bit = (k >> (log_K - 1 - b)) & 1
                    a = a * (qb if bit else (1 - qb) % P) % P
                w = 1
                for b, qb in enumerate(q[log_K:]):
                    bit = (j >> (log_T - 1 - b)) & 1
                    w = w * (qb if bit else (1 - qb) % P) % P
                claim = (claim + a * w) % P
            streams.append(s)
            wts.append(W)
            qas.append(q[:log_K])
            cls.append(claim)
            labs.append(f"g{log_K}_{m}")
        insts.append(GroupedOneHot(streams, K, wts, qas, cls, gamma, labs,
                                   booleanity=False,
                                   opening_kind="joint_opening"))
    idx = [rng.randrange(8) for _ in range(16)]
    q2 = [rng.randrange(P) for _ in range(3 + 4)]
    insts.append(SparseOneHotOpening(idx, 8, q2, rng.randrange(P), "soh"))
    coeffs = [rng.randrange(P) for _ in range(1 << 4)]
    insts.append(DenseOpening(coeffs, [rng.randrange(P) for _ in range(4)],
                              rng.randrange(P), "dense"))
    return insts


def test_stepped_stage8_shape_matches_host():
    _run_both(_stage8_shape_instances)


def _sparse_ram_instances():
    import numpy as np

    from jolt_tpu.relations.ram_sparse import (RamPairSchedule,
                                               SparseRamRafEvaluation,
                                               SparseRamReadWriteChecking)

    rng = random.Random(17)
    T, log_K = 16, 4
    K = 1 << log_K
    cols = np.array([rng.randrange(1, K) if rng.random() < 0.7 else 0
                     for _ in range(T)], dtype=np.int64)
    cur = {}
    pre, post = np.zeros(T, np.uint64), np.zeros(T, np.uint64)
    for j, k in enumerate(cols):
        if k == 0:
            continue
        pre[j] = cur.get(int(k), 0)
        post[j] = rng.randrange(1 << 32)
        cur[int(k)] = int(post[j])
    sched = RamPairSchedule(cols, pre, post, K)
    inc = [(int(post[j]) - int(pre[j])) % P for j in range(T)]
    r_cycle = [rng.randrange(P) for _ in range(sched.log_T)]
    rw = SparseRamReadWriteChecking(sched, log_K, {}, inc,
                                    rng.randrange(P), r_cycle,
                                    rng.randrange(P), rng.randrange(P))
    sched2 = RamPairSchedule(cols, pre, post, K)
    raf = SparseRamRafEvaluation(sched2, log_K, 0x100, r_cycle,
                                 rng.randrange(P))
    return [rw, raf]


def test_stepped_sparse_ram_stage_matches_host():
    """Cycle->addr transitions on the pair-schedule relations."""
    _run_both(_sparse_ram_instances)


def test_stepped_full_prove_matches_host_engine():
    """prove() with stage 8 forced onto the stepped tier: proof fields
    byte-equal the host-engine proof, and the proof verifies."""
    import dataclasses
    import os

    from jolt_tpu.prover import prove
    from jolt_tpu.riscv.emulator import MemoryLayout
    from jolt_tpu.tracer import trace_program
    from jolt_tpu.verifier import verify
    from jolt_tpu.verifier.verifier import PublicIO

    L = MemoryLayout(max_input_size=64, max_output_size=64)
    guest = f"""
        li   a1, 5
        li   a2, 9
        add  a3, a1, a2
        xor  a4, a1, a2
        li   t0, {L.output_start}
        sd   a3, 0(t0)
        li   t1, {L.termination}
        li   t2, 1
        sd   t2, 0(t1)
    """
    tr = trace_program(guest, layout=L, min_padded=16)

    host_proof = prove(tr)
    os.environ["JOLT_TPU_S8"] = "stepped"
    try:
        stepped_proof = prove(tr)
    finally:
        del os.environ["JOLT_TPU_S8"]

    hd = dataclasses.asdict(host_proof)
    sd = dataclasses.asdict(stepped_proof)
    assert hd.keys() == sd.keys()
    for k in hd:
        assert hd[k] == sd[k], f"proof field {k} differs between engines"
    assert verify(stepped_proof, PublicIO.from_trace(tr))
