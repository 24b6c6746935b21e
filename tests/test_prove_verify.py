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


def test_reject_tampered_uniskip_poly(fib_proof):
    """Tampering any uni-skip first-round coefficient must trip either the
    base-window-sum check or the remaining sumcheck's claim chain."""
    tr, proof = fib_proof
    import copy
    for idx in (0, 7, 30):
        bad = copy.deepcopy(proof)
        bad.stage1_uniskip[idx] = (bad.stage1_uniskip[idx] + 1) % P
        with pytest.raises(VerificationError):
            verify(bad, PublicIO.from_trace(tr))


def test_reject_overlong_uniskip_poly(fib_proof):
    """Degree bound: more than 31 coefficients is rejected outright."""
    tr, proof = fib_proof
    import copy
    bad = copy.deepcopy(proof)
    bad.stage1_uniskip = bad.stage1_uniskip + [1]
    with pytest.raises(VerificationError):
        verify(bad, PublicIO.from_trace(tr))


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


def test_reject_tampered_lookup_output(fib_proof):
    """Lying about an ALU result: the LookupOutput opening is now bound to
    the table MLEs by the stage-5i read-raf (the round-1 soundness hole)."""
    tr, proof = fib_proof
    import copy
    from jolt_tpu.witness.r1cs_inputs import V_LOOKUP_OUTPUT
    bad = copy.deepcopy(proof)
    bad.r1cs_input_openings[V_LOOKUP_OUTPUT] = (
        bad.r1cs_input_openings[V_LOOKUP_OUTPUT] + 1) % P
    with pytest.raises(VerificationError):
        verify(bad, PublicIO.from_trace(tr))


def test_reject_tampered_instr_ra_opening(fib_proof):
    tr, proof = fib_proof
    import copy
    bad = copy.deepcopy(proof)
    bad.stage5i_openings["ra7"] = (bad.stage5i_openings["ra7"] + 1) % P
    with pytest.raises(VerificationError):
        verify(bad, PublicIO.from_trace(tr))


def test_reject_tampered_table_flag(fib_proof):
    """A forged table-flag claim must be caught by the stage-6 bytecode
    flags instance (flags are decoded from the public program)."""
    tr, proof = fib_proof
    import copy
    bad = copy.deepcopy(proof)
    bad.stage5i_openings["flag_And"] = (bad.stage5i_openings["flag_And"] + 1) % P
    with pytest.raises(VerificationError):
        verify(bad, PublicIO.from_trace(tr))


def test_reject_tampered_raf_flag(fib_proof):
    tr, proof = fib_proof
    import copy
    bad = copy.deepcopy(proof)
    bad.stage5i_openings["raf_flag"] = (bad.stage5i_openings["raf_flag"] + 1) % P
    with pytest.raises(VerificationError):
        verify(bad, PublicIO.from_trace(tr))


def test_reject_tampered_instr_round_poly(fib_proof):
    tr, proof = fib_proof
    import copy
    for rnd in (0, 64, 128):
        bad = copy.deepcopy(proof)
        bad.stage5i_polys[rnd][0] = (bad.stage5i_polys[rnd][0] + 1) % P
        with pytest.raises(VerificationError):
            verify(bad, PublicIO.from_trace(tr))


def test_reject_overlong_round_poly(fib_proof):
    """Degree-bound check: padding a round poly with extra coefficients
    must be rejected (proof malleability)."""
    tr, proof = fib_proof
    import copy
    bad = copy.deepcopy(proof)
    bad.stage2_polys[0] = list(bad.stage2_polys[0]) + [0, 0, 0]
    with pytest.raises(VerificationError):
        verify(bad, PublicIO.from_trace(tr))


ALU = f"""
    li   a0, 0x1234
    li   a1, 0x0ff0
    and  a2, a0, a1
    or   a3, a0, a1
    xor  a4, a0, a1
    add  a5, a3, a4
    sub  a6, a3, a2
    slt  s0, a0, a1
    sltu s1, a1, a0
    mul  s2, a0, a1
    mulhu s3, a5, a6
    slli s4, a0, 7
    srli s5, a0, 3
    srai s6, a6, 2
    andi s7, a0, 0xff
    add  s8, zero, a2
    add  s8, s8, a3
    add  s8, s8, a4
    add  s8, s8, a5
    add  s8, s8, a6
    add  s8, s8, s0
    add  s8, s8, s1
    add  s8, s8, s2
    add  s8, s8, s3
    add  s8, s8, s4
    add  s8, s8, s5
    add  s8, s8, s6
    add  s8, s8, s7
    li   t0, {L.output_start}
    sd   s8, 0(t0)
    li   t1, {L.termination}
    li   t2, 1
    sd   t2, 0(t1)
"""


def test_alu_mix_proves_and_verifies():
    """The VERDICT done-criterion: a guest mixing and/or/xor/slt/shift/mul
    ops proves and verifies end-to-end, with instruction semantics bound by
    the read-raf Shout."""
    tr = trace_program(ALU, layout=L)
    proof = prove(tr)
    assert verify(proof, PublicIO.from_trace(tr))
