"""Fused (device-transcript) sumcheck path: byte-identity vs the host engine.

prove_fused runs a stage's whole round loop under one jit dispatch with the
Fiat-Shamir transcript on device, then REPLAYS the host transcript over the
fetched round polynomials and asserts the challenges agree -- so a fused
stage that completes at all is transcript-identical to the host engine.

The fused path is OPT-IN (JOLT_TPU_FUSE=1): XLA compile of the unrolled
round loop costs minutes per stage shape (measured 203 s for one 15-round
instance on XLA:CPU, run time 0.12 s), so these tests use deliberately tiny
shapes.  The full-prove byte-identity run (every stage fused, ~30+ min of
compiles) is gated behind JOLT_TPU_FUSE_E2E=1.
"""
import os
import random

import pytest

from jolt_tpu.field.params import FR
from jolt_tpu.relations.booleanity import Booleanity, HammingWeight
from jolt_tpu.sumcheck.engine import BatchedSumcheck, OpeningAccumulator
from jolt_tpu.sumcheck.fused import prove_fused
from jolt_tpu.transcript import Blake2bTranscript

P = FR.modulus


def _instances():
    rng = random.Random(5)
    log_K, log_T = 3, 4
    K, T = 1 << log_K, 1 << log_T
    indices = [rng.randrange(K) for _ in range(T)]
    r_addr = [rng.randrange(P) for _ in range(log_K)]
    r_cyc = [rng.randrange(P) for _ in range(log_T)]
    r_h = [rng.randrange(P) for _ in range(log_T)]
    return [Booleanity(indices, K, r_addr, r_cyc, "b"),
            HammingWeight(indices, K, r_h, "h")]


def test_fused_stage_matches_host_engine():
    """One small batched stage (Booleanity + HammingWeight, 7 rounds):
    fused output must equal the host engine's byte for byte.  prove_fused
    itself asserts the device transcript's challenges match the host
    replay, so this additionally covers the RLC batching, claim scaling,
    final-state store, and opening-cache plumbing."""
    acc_h = OpeningAccumulator()
    t_h = Blake2bTranscript(b"fused-test")
    polys_h, r_h = BatchedSumcheck.prove(_instances(), acc_h, t_h)

    os.environ["JOLT_TPU_FUSE"] = "1"
    try:
        acc_f = OpeningAccumulator()
        t_f = Blake2bTranscript(b"fused-test")
        polys_f, r_f = prove_fused(_instances(), acc_f, t_f)
    finally:
        os.environ["JOLT_TPU_FUSE"] = "0"

    assert polys_f == polys_h
    assert r_f == r_h
    assert t_f.state == t_h.state
    assert acc_f.openings == acc_h.openings


@pytest.mark.skipif(os.environ.get("JOLT_TPU_FUSE_E2E") != "1",
                    reason="full fused prove compiles for 30+ min; set "
                           "JOLT_TPU_FUSE_E2E=1 to run")
def test_fused_full_prove_matches_host_engine():
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
        li   t0, {L.output_start}
        sd   a3, 0(t0)
        li   t1, {L.termination}
        li   t2, 1
        sd   t2, 0(t1)
    """
    tr = trace_program(guest, layout=L, min_padded=16)

    os.environ["JOLT_TPU_FUSE"] = "0"
    host_proof = prove(tr)
    os.environ["JOLT_TPU_FUSE"] = "1"
    try:
        fused_proof = prove(tr)   # raises if device transcript diverges
    finally:
        os.environ["JOLT_TPU_FUSE"] = "0"

    hd = dataclasses.asdict(host_proof)
    fd = dataclasses.asdict(fused_proof)
    assert hd.keys() == fd.keys()
    for k in hd:
        assert hd[k] == fd[k], f"proof field {k} differs between engines"
    assert verify(fused_proof, PublicIO.from_trace(tr))
