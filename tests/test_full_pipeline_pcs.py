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
    # small padding floor: full-width CPU MSMs in the joint opening are the
    # test-time bottleneck; the protocol is identical at any power of two
    tr = trace_program(GUEST, layout=L, min_padded=32)
    # largest committed poly: the 2^8-row instruction ra chunks
    setup = KZGSetup.generate(256 * tr.padded_length)
    proof = prove(tr, setup=setup)
    return tr, setup, proof


def test_full_pipeline_with_commitments(setup_and_proof):
    tr, setup, proof = setup_and_proof
    # ram/bytecode access matrices commit as chunk selectors (ra_virtual)
    expected = ({"wa", "ra1", "ra2", "inc", "ram_ra0", "ram_inc", "bc_ra0"}
                | {f"lk_ra{i}" for i in range(16)})
    assert set(proof.commitments) == expected
    assert verify(proof, PublicIO.from_trace(tr), setup=setup)


def test_every_committed_opening_is_bound(setup_and_proof):
    """No accepted-but-unbound openings (round-1 Weak #4): tampering ANY
    stage-8 terminal opening must break the joint PCS check."""
    tr, setup, proof = setup_and_proof
    import copy
    for i in (0, len(proof.stage8_openings) // 2, len(proof.stage8_openings) - 1):
        bad = copy.deepcopy(proof)
        bad.stage8_openings[i] = (bad.stage8_openings[i] + 1) % P
        with pytest.raises(VerificationError):
            verify(bad, PublicIO.from_trace(tr), setup=setup)


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
