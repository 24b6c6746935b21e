"""Grouped one-hot sumcheck instances: soundness + engine equivalence.

A group of m one-hot matrices (booleanity / Hamming / opening claims with
per-matrix points) folds into ONE sumcheck instance via gamma-RLC; these
tests check the prover against brute-force ground truth, run the verifier
twin, and confirm host-engine vs scan-engine byte identity.
"""
import os
import random

import pytest

from jolt_tpu.field import ops
from jolt_tpu.field.params import FR
from jolt_tpu.poly import eq
from jolt_tpu.relations.grouped_onehot import (GroupedOneHot,
                                               GroupedOneHotVerifier)
from jolt_tpu.sumcheck.engine import BatchedSumcheck, OpeningAccumulator
from jolt_tpu.sumcheck.scan import prove_scan
from jolt_tpu.transcript import Blake2bTranscript

P = FR.modulus


def _eq_int(a, b):
    return eq.eq_int(a, b)


def _brute_claim(stream, K, pt_addr, w_point, T):
    """sum_{k,j} eq(pt_addr,k) * w(j) * M(k,j) by brute force."""
    log_K = K.bit_length() - 1
    log_T = T.bit_length() - 1
    total = 0
    for j, c in enumerate(stream):
        jbits = [(j >> (log_T - 1 - i)) & 1 for i in range(log_T)]
        w = _eq_int(w_point, jbits)
        a = 1
        if pt_addr is not None:
            cbits = [(c >> (log_K - 1 - i)) & 1 for i in range(log_K)]
            a = _eq_int(pt_addr, cbits)
        total = (total + a * w) % P
    return total


def _setup(seed=9, M_pointful=2, M_ham=1, log_K=3, log_T=4):
    rng = random.Random(seed)
    K, T = 1 << log_K, 1 << log_T
    streams, q_addrs, w_tables, w_points, claims = [], [], [], [], []
    for m in range(M_pointful + M_ham):
        stream = [rng.randrange(K) for _ in range(T)]
        wp = [rng.randrange(P) for _ in range(log_T)]
        if m < M_pointful:
            qa = [rng.randrange(2, P - 2) for _ in range(log_K)]
        else:
            qa = None
        streams.append(stream)
        q_addrs.append(qa)
        w_points.append(wp)
        w_tables.append(eq.evals(wp))
        claims.append(_brute_claim(stream, K, qa, wp, T))
    gamma = rng.randrange(P)
    return streams, K, T, q_addrs, w_tables, w_points, claims, gamma


def test_grouped_value_prove_verify():
    (streams, K, T, q_addrs, w_tables, w_points, claims,
     gamma) = _setup()
    labels = [f"m{i}" for i in range(len(streams))]
    inst = GroupedOneHot(streams, K, w_tables, q_addrs, claims, gamma,
                         labels, booleanity=False, opening_kind="grp")
    acc = OpeningAccumulator()
    t = Blake2bTranscript(b"grouped")
    polys, r = BatchedSumcheck.prove([inst], acc, t)

    # openings must equal brute-force M_q(r) (cycle-major normalized)
    log_K = K.bit_length() - 1
    r_addr, r_cyc = r[:log_K], r[log_K:]
    for q, (stream, got) in enumerate(zip(streams, inst.final_openings)):
        want = 0
        log_T = T.bit_length() - 1
        for j, c in enumerate(stream):
            jbits = [(j >> (log_T - 1 - i)) & 1 for i in range(log_T)]
            cbits = [(c >> (log_K - 1 - i)) & 1 for i in range(log_K)]
            want = (want + _eq_int(r_cyc, jbits) * _eq_int(r_addr, cbits)) % P
        assert got == want, f"matrix {q} opening mismatch"

    # verifier twin accepts
    vt = Blake2bTranscript(b"grouped")
    w_evals = [(lambda rc, wp=wp: _eq_int(wp, rc)) for wp in w_points]
    vinst = GroupedOneHotVerifier(len(streams), log_K,
                                  T.bit_length() - 1, w_evals, q_addrs,
                                  claims, gamma, inst.final_openings)
    vacc = OpeningAccumulator()
    rv = BatchedSumcheck.verify(polys, [vinst], vacc, vt)
    assert rv == r

    # tampering any single matrix's opening must be rejected
    bad = list(inst.final_openings)
    bad[1] = (bad[1] + 1) % P
    vbad = GroupedOneHotVerifier(len(streams), log_K, T.bit_length() - 1,
                                 w_evals, q_addrs, claims, gamma, bad)
    from jolt_tpu.sumcheck.engine import SumcheckError
    with pytest.raises(SumcheckError):
        BatchedSumcheck.verify(polys, [vbad], OpeningAccumulator(),
                               Blake2bTranscript(b"grouped"))


def test_grouped_booleanity_prove_verify():
    (streams, K, T, q_addrs, w_tables, w_points, _unused,
     gamma) = _setup(seed=12, M_pointful=3, M_ham=0)
    labels = [f"b{i}" for i in range(len(streams))]
    claims = [0] * len(streams)
    inst = GroupedOneHot(streams, K, w_tables, q_addrs, claims, gamma,
                         labels, booleanity=True, opening_kind="bool")
    acc = OpeningAccumulator()
    t = Blake2bTranscript(b"gbool")
    polys, r = BatchedSumcheck.prove([inst], acc, t)

    log_K = K.bit_length() - 1
    w_evals = [(lambda rc, wp=wp: _eq_int(wp, rc)) for wp in w_points]
    vinst = GroupedOneHotVerifier(len(streams), log_K, T.bit_length() - 1,
                                  w_evals, q_addrs, claims, gamma,
                                  inst.final_openings, booleanity=True)
    rv = BatchedSumcheck.verify(polys, [vinst], OpeningAccumulator(),
                                Blake2bTranscript(b"gbool"))
    assert rv == r


def test_grouped_scan_matches_host():
    def make():
        (streams, K, T, q_addrs, w_tables, w_points, claims,
         gamma) = _setup(seed=21, M_pointful=2, M_ham=2)
        labels = [f"m{i}" for i in range(len(streams))]
        val = GroupedOneHot(streams, K, w_tables, q_addrs, claims, gamma,
                            labels, booleanity=False, opening_kind="g")
        boo = GroupedOneHot(streams, K, w_tables, q_addrs,
                            [0] * len(streams), gamma, labels,
                            booleanity=True, opening_kind="gb")
        return [boo, val]

    acc_h = OpeningAccumulator()
    t_h = Blake2bTranscript(b"gscan")
    polys_h, r_h = BatchedSumcheck.prove(make(), acc_h, t_h)

    os.environ["JOLT_TPU_FUSE"] = "scan"
    try:
        acc_s = OpeningAccumulator()
        t_s = Blake2bTranscript(b"gscan")
        polys_s, r_s = prove_scan(make(), acc_s, t_s)
    finally:
        os.environ["JOLT_TPU_FUSE"] = "0"

    assert polys_s == polys_h
    assert r_s == r_h
    assert t_s.state == t_h.state
    assert acc_s.openings == acc_h.openings
