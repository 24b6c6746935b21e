"""R1CS witness extraction + constraint satisfaction on real traces."""
import pytest

from jolt_tpu.r1cs import check_satisfied
from jolt_tpu.riscv.emulator import MemoryLayout
from jolt_tpu.tracer import trace_program
from jolt_tpu.witness import extract_r1cs_inputs

L = MemoryLayout()

FIB = f"""
    li   a0, 30
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

MIXED = f"""
    li   a0, 123
    li   a1, 456
    mul  a2, a0, a1
    mulhu a3, a0, a1
    sub  a4, a1, a0
    xor  a5, a0, a1
    slt  a6, a0, a1
    sltu a7, a1, a0
    slli s2, a0, 9
    srli s3, a1, 2
    srai s6, a0, 1
    lui  s4, 0xABCDE
    auipc s5, 1
    and  s7, a1, a0
    li   t0, 0x80200000
    sd   a2, 0(t0)
    ld   s8, 0(t0)
    jal  s9, next
next:
    li   t1, {L.termination}
    li   t2, 1
    sd   t2, 0(t1)
"""


@pytest.mark.parametrize("src", [FIB, MIXED], ids=["fib", "mixed"])
def test_r1cs_satisfied(src):
    tr = trace_program(src)
    inputs = extract_r1cs_inputs(tr)
    bad = check_satisfied(inputs)
    assert bad == [], f"violations: {bad[:10]}"


def test_r1cs_catches_bad_witness():
    tr = trace_program(FIB)
    inputs = extract_r1cs_inputs(tr)
    import jolt_tpu.witness.r1cs_inputs as W
    inputs.columns[W.V_RD_WRITE_VALUE][1] += 1  # corrupt an addi's rd write
    bad = check_satisfied(inputs)
    assert bad, "tampered witness must violate some constraint"
