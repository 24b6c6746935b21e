"""End-to-end prove/verify over virtual-sequence-expanded guests.

Covers the full RV64IM surface: register/word shifts, MULH*, div/rem
(advice + assert sequences), sub-word memory ops -- all expanded to final
rows (riscv/program.py) and proven through every stage.  Includes the
soundness side: tampering with an assert row's claimed lookup output or
with the bytecode-expansion claims must be rejected.
"""
import copy

import pytest

from jolt_tpu.field.params import FR
from jolt_tpu.prover import prove
from jolt_tpu.riscv.emulator import MemoryLayout
from jolt_tpu.tracer import trace_program
from jolt_tpu.verifier import VerificationError, verify
from jolt_tpu.verifier.verifier import PublicIO

P = FR.modulus
L = MemoryLayout(max_input_size=64, max_output_size=64)

# one of everything that needs expansion, incl. a div-by-zero edge case
GUEST = f"""
    li   t0, -123456789
    li   t1, 37
    sll  t2, t0, t1
    srl  t3, t0, t1
    sra  t4, t0, t1
    mulh t5, t0, t1
    mulhsu t6, t0, t1
    div  a0, t0, t1
    rem  a1, t0, t1
    divu a2, t0, t1
    remu a3, t0, t1
    li   a4, 0
    div  a5, t0, a4
    remw a6, t0, a4
    addw a7, t0, t1
    sllw s2, t0, t1
    sraw s3, t0, t1
    mulw s4, t0, t1
    divw s5, t0, t1
    divuw s6, t0, t1
    addiw s8, t0, 99
    srliw s9, t0, 5
    sraiw s9, t0, 5
    li   s0, 0x80002000
    sb   t0, 3(s0)
    sh   t0, 2(s0)
    sw   t0, 4(s0)
    lb   s1, 3(s0)
    lhu  s1, 2(s0)
    lw   s1, 4(s0)
    li   s10, {L.output_start}
    sd   s1, 0(s10)
    li   s10, {L.termination}
    li   s11, 1
    sd   s11, 0(s10)
"""


@pytest.fixture(scope="module")
def expanded_proof():
    tr = trace_program(GUEST, layout=L)
    proof = prove(tr)
    return tr, proof


def test_expanded_guest_proves_and_verifies(expanded_proof):
    tr, proof = expanded_proof
    assert tr.program.n_rows > tr.length // 4  # sequences actually expanded
    assert verify(proof, PublicIO.from_trace(tr))


def test_reject_tampered_r1cs_pc_opening(expanded_proof):
    """The PC (expanded row index) opening is bound by the bytecode table;
    forging it must fail."""
    tr, proof = expanded_proof
    from jolt_tpu.witness.r1cs_inputs import V_PC
    bad = copy.deepcopy(proof)
    bad.r1cs_input_openings[V_PC] = (bad.r1cs_input_openings[V_PC] + 1) % P
    with pytest.raises(VerificationError):
        verify(bad, PublicIO.from_trace(tr))


def test_reject_tampered_unexpanded_pc_opening(expanded_proof):
    tr, proof = expanded_proof
    from jolt_tpu.witness.r1cs_inputs import V_UNEXPANDED_PC
    bad = copy.deepcopy(proof)
    bad.r1cs_input_openings[V_UNEXPANDED_PC] = \
        (bad.r1cs_input_openings[V_UNEXPANDED_PC] + 1) % P
    with pytest.raises(VerificationError):
        verify(bad, PublicIO.from_trace(tr))


def test_reject_tampered_assert_flag_claim(expanded_proof):
    """The Assert circuit-flag column is proven against the public expanded
    bytecode; flipping its opening must be rejected."""
    tr, proof = expanded_proof
    from jolt_tpu.witness.r1cs_inputs import V_FLAG_BASE
    from jolt_tpu.witness.flags import CIRCUIT_FLAGS
    idx = V_FLAG_BASE + CIRCUIT_FLAGS.index("Assert")
    bad = copy.deepcopy(proof)
    bad.r1cs_input_openings[idx] = (bad.r1cs_input_openings[idx] + 1) % P
    with pytest.raises(VerificationError):
        verify(bad, PublicIO.from_trace(tr))


def test_reject_wrong_program(expanded_proof):
    """Verifying against a different program image must fail (the expansion
    and its table are derived from the public code)."""
    tr, proof = expanded_proof
    io = PublicIO.from_trace(tr)
    io2 = copy.deepcopy(io)
    code = bytearray(io2.code)
    code[8] ^= 0x10  # perturb one instruction word
    io2.code = bytes(code)
    with pytest.raises(VerificationError):
        verify(proof, io2)
