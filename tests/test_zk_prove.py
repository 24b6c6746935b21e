"""prove(zk=True): BlindFold-integrated zero-knowledge mode through the
public API.

Every standard sumcheck stage's round polynomials are Pedersen-committed
(blindfold/zk_sumcheck.py committed-round recorder) and one BlindFold
proof (Nova fold + Spartan over the verifier R1CS) attests every round
check; the verifier replays challenges from the commitments and never
sees a round coefficient.  Ref `zkvm/prover.rs:1564-1610`.

v1 scope note (documented in prove()): the stage-1 uni-skip first-round
polynomial and the opening claims are still sent in clear.
"""
import random

import pytest

from jolt_tpu.field.params import FR
from jolt_tpu.prover import prove
from jolt_tpu.riscv.emulator import MemoryLayout
from jolt_tpu.tracer import trace_program
from jolt_tpu.verifier import VerificationError, verify
from jolt_tpu.verifier.verifier import PublicIO

P = FR.modulus
L = MemoryLayout(max_input_size=64, max_output_size=64)

FIB = f"""
    li   a0, 12
    li   a1, 0
    li   a2, 1
loop:
    beq  a0, zero, done
    add  a3, a1, a2
    mv   a1, a2
    mv   a2, a3
    addi a0, a0, -1
    j    loop
done:
    li   t0, {L.output_start}
    sd   a1, 0(t0)
    li   t1, {L.termination}
    li   t2, 1
    sd   t2, 0(t1)
"""


@pytest.fixture(scope="module")
def zk_proof():
    tr = trace_program(FIB, layout=L, min_padded=32)
    proof = prove(tr, zk=True, zk_rng=random.Random(42))
    return tr, proof


def test_zk_round_trip(zk_proof):
    tr, proof = zk_proof
    # no round coefficients in the proof; commitments for every stage
    for f in ("stage1_polys", "stage2_polys", "stage4_polys",
              "stage7_polys", "stage8_polys", "shift_polys"):
        assert getattr(proof, f) == []
    assert set(proof.zk_commitments) >= {"s1", "s1s", "s2", "s3", "s4",
                                         "s5", "s5i", "s6", "s7", "s8"}
    assert proof.zk_blindfold is not None
    assert verify(proof, PublicIO.from_trace(tr))


def test_zk_serialization_round_trip(zk_proof):
    from jolt_tpu.proof_io import deserialize_proof, serialize_proof
    tr, proof = zk_proof
    blob = serialize_proof(proof, {"outputs": bytes(tr.device.outputs)})
    proof2, _ = deserialize_proof(blob)
    assert proof2.zk_commitments == proof.zk_commitments
    assert verify(proof2, PublicIO.from_trace(tr))


def test_zk_tampered_commitment_rejected(zk_proof):
    import dataclasses
    tr, proof = zk_proof
    comms = {k: list(v) for k, v in proof.zk_commitments.items()}
    # replace one round commitment with another valid point (the first
    # round of a different stage) -- challenges change, BlindFold must
    # catch the inconsistency
    comms["s2"] = list(comms["s2"])
    comms["s2"][0] = proof.zk_commitments["s3"][0]
    bad = dataclasses.replace(proof, zk_commitments=comms)
    with pytest.raises(VerificationError):
        verify(bad, PublicIO.from_trace(tr))


def test_zk_tampered_blindfold_rejected(zk_proof):
    import copy
    import dataclasses
    tr, proof = zk_proof
    bf = copy.deepcopy(proof.zk_blindfold)
    bf.u2 = (bf.u2 + 1) % P
    bad = dataclasses.replace(proof, zk_blindfold=bf)
    with pytest.raises(VerificationError):
        verify(bad, PublicIO.from_trace(tr))


def test_zk_missing_blindfold_rejected(zk_proof):
    import dataclasses
    tr, proof = zk_proof
    bad = dataclasses.replace(proof, zk_blindfold=None)
    with pytest.raises(VerificationError):
        verify(bad, PublicIO.from_trace(tr))


def test_zk_proof_is_statistically_fresh():
    """Two zk proofs of the same statement differ (blinding randomness),
    while clear proofs are deterministic."""
    tr = trace_program(FIB, layout=L, min_padded=32)
    p1 = prove(tr, zk=True, zk_rng=random.Random(1))
    p2 = prove(tr, zk=True, zk_rng=random.Random(2))
    assert p1.zk_commitments["s2"] != p2.zk_commitments["s2"]
    io = PublicIO.from_trace(tr)
    assert verify(p1, io) and verify(p2, io)
