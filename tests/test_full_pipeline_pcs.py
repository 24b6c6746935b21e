"""Full pipeline with the commitment layer: commit -> sumcheck -> opening.

Slowest e2e test (device SRS generation for K*T, MSM commits, pairing
verification); exercises the complete trust chain for the inc polynomial.
"""
import pytest

from jolt_tpu.field.params import FR
from jolt_tpu.pcs import KZGSetup
from jolt_tpu.prover import prove
from jolt_tpu.riscv.emulator import MemoryLayout
from jolt_tpu.tracer import trace_program
from jolt_tpu.verifier import VerificationError, verify
from jolt_tpu.verifier.verifier import PublicIO
from jolt_tpu.witness.registers import K

P = FR.modulus
# compact I/O regions keep K_ram small (dense round-1 kernels)
L = MemoryLayout(max_input_size=64, max_output_size=64)

GUEST = f"""
    li   a0, 10
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
def setup_and_proof():
    tr = trace_program(GUEST, layout=L)
    setup = KZGSetup.generate(K * tr.padded_length)
    proof = prove(tr, setup=setup)
    return tr, setup, proof


def test_full_pipeline_with_commitments(setup_and_proof):
    tr, setup, proof = setup_and_proof
    assert set(proof.commitments) == {"wa", "ra1", "ra2", "inc"}
    assert verify(proof, PublicIO.from_trace(tr), setup=setup)


def test_reject_tampered_commitment(setup_and_proof):
    tr, setup, proof = setup_and_proof
    import copy
    from jolt_tpu.curve import bn254_host as host
    bad = copy.deepcopy(proof)
    bad.commitments["inc"] = host.g1_add(bad.commitments["inc"], host.G1_GEN)
    with pytest.raises(VerificationError):
        verify(bad, PublicIO.from_trace(tr), setup=setup)


def test_reject_opening_for_wrong_claim(setup_and_proof):
    tr, setup, proof = setup_and_proof
    import copy
    bad = copy.deepcopy(proof)
    bad.stage3_openings["inc"] = (bad.stage3_openings["inc"] + 1) % P
    with pytest.raises(VerificationError):
        verify(bad, PublicIO.from_trace(tr), setup=setup)
