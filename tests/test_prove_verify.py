"""End-to-end: trace a real guest, prove stage 1, verify.

The round-1 vertical slice: RISC-V execution -> R1CS witness -> Spartan
outer sumcheck over the real constraints -> verification from public IO +
proof only (openings validated against the constraint matrices)."""
import pytest

from jolt_tpu.field.params import FR
from jolt_tpu.prover import prove
from jolt_tpu.riscv.emulator import MemoryLayout
from jolt_tpu.tracer import trace_program
from jolt_tpu.verifier import VerificationError, verify
from jolt_tpu.verifier.verifier import PublicIO

P = FR.modulus
# compact I/O regions keep K_ram small (dense round-1 kernels)
L = MemoryLayout(max_input_size=64, max_output_size=64)

FIB = f"""
    li   a0, 20
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
def fib_proof():
    tr = trace_program(FIB, layout=L)
    proof = prove(tr)
    return tr, proof


def test_prove_verify_roundtrip(fib_proof):
    tr, proof = fib_proof
    assert verify(proof, PublicIO.from_trace(tr))


def test_reject_tampered_round_poly(fib_proof):
    tr, proof = fib_proof
    import copy
    bad = copy.deepcopy(proof)
    bad.stage1_polys[2][0] = (bad.stage1_polys[2][0] + 1) % P
    with pytest.raises(VerificationError):
        verify(bad, PublicIO.from_trace(tr))


def test_reject_tampered_opening(fib_proof):
    tr, proof = fib_proof
    import copy
    bad = copy.deepcopy(proof)
    bad.r1cs_input_openings[9] = (bad.r1cs_input_openings[9] + 1) % P
    with pytest.raises(VerificationError):
        verify(bad, PublicIO.from_trace(tr))


def test_reject_tampered_register_val(fib_proof):
    tr, proof = fib_proof
    import copy
    bad = copy.deepcopy(proof)
    bad.stage2_openings["val"] = (bad.stage2_openings["val"] + 1) % P
    with pytest.raises(VerificationError):
        verify(bad, PublicIO.from_trace(tr))


def test_reject_tampered_val_eval_inc(fib_proof):
    tr, proof = fib_proof
    import copy
    bad = copy.deepcopy(proof)
    bad.stage3_openings["inc"] = (bad.stage3_openings["inc"] + 1) % P
    with pytest.raises(VerificationError):
        verify(bad, PublicIO.from_trace(tr))


def test_reject_tampered_booleanity_opening(fib_proof):
    tr, proof = fib_proof
    import copy
    bad = copy.deepcopy(proof)
    bad.stage7_openings["bool_reg_wa"] = (bad.stage7_openings["bool_reg_wa"] + 1) % P
    with pytest.raises(VerificationError):
        verify(bad, PublicIO.from_trace(tr))


def test_reject_wrong_public_io(fib_proof):
    tr, proof = fib_proof
    io = PublicIO.from_trace(tr)
    io.outputs = bytes([io.outputs[0] ^ 1]) + io.outputs[1:]
    with pytest.raises(VerificationError):
        verify(proof, io)
