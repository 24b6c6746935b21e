"""Scan-fused sumcheck (lax.scan round loop): byte-identity vs host engine.

prove_scan runs a whole stage under one jit with the round loop re-rolled
as lax.scan over fixed-shape state (pair-order storage + zero-tail
compaction), so compile cost is O(segments) instead of O(rounds).  The
driver replays the host transcript over the fetched round polynomials and
asserts challenge equality, so any algebra divergence fails loudly.
"""
import os
import random

import pytest

from jolt_tpu.field.params import FR
from jolt_tpu.relations.opening_reduction import DenseOpening
from jolt_tpu.sumcheck.engine import BatchedSumcheck, OpeningAccumulator
from jolt_tpu.sumcheck.scan import prove_scan
from jolt_tpu.transcript import Blake2bTranscript

P = FR.modulus


def _dense_instances():
    rng = random.Random(11)

    def mk(n, label):
        coeffs = [rng.randrange(P) for _ in range(1 << n)]
        point = [rng.randrange(P) for _ in range(n)]
        return DenseOpening(coeffs, point, rng.randrange(P), label)

    # mixed sizes exercise front-loaded offsets (dormant rounds)
    return [mk(5, "a"), mk(3, "b"), mk(5, "c")]


def _spartan_instance():
    from jolt_tpu.relations.spartan_outer import SpartanOuterProver
    from jolt_tpu.riscv.emulator import MemoryLayout
    from jolt_tpu.tracer.trace import trace_program
    from jolt_tpu.witness.r1cs_inputs import extract_r1cs_inputs
    from jolt_tpu.r1cs import constraints as C

    L = MemoryLayout(max_input_size=64, max_output_size=64)
    guest = f"""
        li   a1, 7
        li   a2, 3
        add  a3, a1, a2
        li   t0, {L.output_start}
        sd   a3, 0(t0)
        li   t1, {L.termination}
        li   t2, 1
        sd   t2, 0(t1)
    """
    tr = trace_program(guest, layout=L, min_padded=16)
    inputs = extract_r1cs_inputs(tr)
    rng = random.Random(3)
    log_T = inputs.T.bit_length() - 1
    tau = [rng.randrange(P) for _ in range(2 + log_T)]
    from jolt_tpu.relations.spartan_outer import prove_uniskip
    t = Blake2bTranscript(b"uniskip-fixture")
    cols, _coeffs, r0, claim1, l_scale = prove_uniskip(inputs, tau, t)
    return SpartanOuterProver(inputs, tau[1:], r0, claim1, l_scale, cols)


def _run_both(make):
    acc_h = OpeningAccumulator()
    t_h = Blake2bTranscript(b"scan-test")
    polys_h, r_h = BatchedSumcheck.prove(make(), acc_h, t_h)

    os.environ["JOLT_TPU_FUSE"] = "scan"
    try:
        acc_s = OpeningAccumulator()
        t_s = Blake2bTranscript(b"scan-test")
        polys_s, r_s = prove_scan(make(), acc_s, t_s)
    finally:
        os.environ["JOLT_TPU_FUSE"] = "0"

    assert polys_s == polys_h
    assert r_s == r_h
    assert t_s.state == t_h.state
    assert acc_s.openings == acc_h.openings


def test_scan_dense_openings_match_host():
    """Mixed-size DenseOpenings: dormant segments + two active segments."""
    _run_both(_dense_instances)


def _onehot_instances():
    from jolt_tpu.relations.booleanity import Booleanity, HammingWeight
    from jolt_tpu.relations.opening_reduction import SparseOneHotOpening

    rng = random.Random(5)
    insts = []
    for log_K, log_T, lbl in ((3, 4, "m1"), (2, 4, "m2")):
        K, T = 1 << log_K, 1 << log_T
        indices = [rng.randrange(K) for _ in range(T)]
        r_addr = [rng.randrange(P) for _ in range(log_K)]
        r_cyc = [rng.randrange(P) for _ in range(log_T)]
        r_h = [rng.randrange(P) for _ in range(log_T)]
        q = [rng.randrange(P) for _ in range(log_K + log_T)]
        insts.append(Booleanity(indices, K, r_addr, r_cyc, lbl))
        insts.append(HammingWeight(indices, K, r_h, lbl))
        insts.append(SparseOneHotOpening(indices, K, q,
                                         rng.randrange(P), lbl))
    return insts


def test_scan_onehot_stage_matches_host():
    """Booleanity + HammingWeight + SparseOneHotOpening with two distinct
    log_K values: exercises addr->cycle transitions at different rounds."""
    _run_both(_onehot_instances)


def _sparse_ram_instances():
    import numpy as np

    from jolt_tpu.relations.ram_sparse import (RamPairSchedule,
                                               SparseRamRafEvaluation,
                                               SparseRamReadWriteChecking)

    rng = random.Random(7)
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


def test_scan_sparse_ram_stage_matches_host():
    """Pair-schedule cycle phase + dense address phase (stage-4 shape)."""
    _run_both(_sparse_ram_instances)


def test_scan_full_prove_matches_host_engine():
    """Every scan-capable stage fused on a real tiny trace: proof fields
    must agree with the host engine byte for byte, and verify."""
    import dataclasses

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
        mul  a5, a1, a2
        li   t0, {L.output_start}
        sd   a3, 0(t0)
        li   t1, {L.termination}
        li   t2, 1
        sd   t2, 0(t1)
    """
    tr = trace_program(guest, layout=L, min_padded=16)

    os.environ["JOLT_TPU_FUSE"] = "0"
    host_proof = prove(tr)
    os.environ["JOLT_TPU_FUSE"] = "scan"
    try:
        scan_proof = prove(tr)   # raises if device transcript diverges
    finally:
        os.environ["JOLT_TPU_FUSE"] = "0"

    hd = dataclasses.asdict(host_proof)
    sd = dataclasses.asdict(scan_proof)
    assert hd.keys() == sd.keys()
    for k in hd:
        assert hd[k] == sd[k], f"proof field {k} differs between engines"
    assert verify(scan_proof, PublicIO.from_trace(tr))


def test_scan_spartan_outer_matches_host():
    """Stage-1 Spartan outer on a real (tiny) trace."""
    _run_both(lambda: [_spartan_instance()])
