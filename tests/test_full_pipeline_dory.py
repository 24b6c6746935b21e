"""Full pipeline with Dory (the PRODUCTION scheme: transparent setup,
two-tier GT commitments): commit -> 8-stage sumcheck DAG -> one joint
homomorphic GT-RLC opening.

Mirrors tests/test_full_pipeline_pcs.py (HyperKZG) through the
scheme-agnostic seam (pcs/scheme.py); slowest e2e module (host pairings).
"""
import pytest

from jolt_tpu.field.params import FR
from jolt_tpu.pcs import DorySetup
from jolt_tpu.prover import prove
from jolt_tpu.riscv.emulator import MemoryLayout
from jolt_tpu.tracer import trace_program
from jolt_tpu.verifier import VerificationError, verify
from jolt_tpu.verifier.verifier import PublicIO

P = FR.modulus
L = MemoryLayout(max_input_size=64, max_output_size=64)

GUEST = f"""
    li   a1, 21
    li   a2, 34
    add  a3, a1, a2
    xor  a4, a1, a2
    and  a5, a3, a4
    add  a3, a3, a5
    li   t0, {L.output_start}
    sd   a3, 0(t0)
    li   t1, {L.termination}
    li   t2, 1
    sd   t2, 0(t1)
"""


@pytest.fixture(scope="module")
def setup_and_proof():
    tr = trace_program(GUEST, layout=L, min_padded=32)
    # largest committed poly: the 2^8-row instruction ra chunks (K*T)
    n_max = 256 * tr.padded_length
    setup = DorySetup.generate(n_max.bit_length() - 1)
    proof = prove(tr, setup=setup)
    return tr, setup, proof


def test_dory_full_pipeline(setup_and_proof):
    tr, setup, proof = setup_and_proof
    from jolt_tpu.pcs import DoryCommitment
    assert all(isinstance(c, DoryCommitment)
               for c in proof.commitments.values())
    assert verify(proof, PublicIO.from_trace(tr), setup=setup)


def test_dory_rejects_tampered_opening(setup_and_proof):
    tr, setup, proof = setup_and_proof
    import copy
    bad = copy.deepcopy(proof)
    bad.stage8_openings[0] = (bad.stage8_openings[0] + 1) % P
    with pytest.raises(VerificationError):
        verify(bad, PublicIO.from_trace(tr), setup=setup)


def test_dory_rejects_tampered_commitment(setup_and_proof):
    tr, setup, proof = setup_and_proof
    import copy
    from jolt_tpu.pcs import DoryCommitment
    from jolt_tpu.pcs.dory import gt_mul
    bad = copy.deepcopy(proof)
    c = bad.commitments["inc"].c
    bad.commitments["inc"] = DoryCommitment(c=gt_mul(c, c))
    with pytest.raises(VerificationError):
        verify(bad, PublicIO.from_trace(tr), setup=setup)
