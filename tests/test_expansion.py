"""Bytecode expansion (virtual sequences) gates.

Methodology mirrors the reference's expansion fixtures
(`crates/jolt-program/src/expand/tests.rs` + tracer differential tests):

  1. differential execution -- the row emulator over the EXPANDED program
     must produce the same architectural registers x1..x31 and memory/IO
     as the direct semantic emulator, across the full RV64IM surface and
     the division edge cases;
  2. provability -- every expanded row is a final kind with a lookup
     table, the R1CS is satisfied, and the lookup witness self-check
     (LookupOutput == table entry at the index) passes;
  3. the expansion is a pure function of the program image (prover and
     verifier derive identical tables).
"""

import random

import pytest

from jolt_tpu.r1cs.constraints import check_satisfied
from jolt_tpu.riscv.assembler import assemble
from jolt_tpu.riscv.emulator import Emulator, JoltDevice, MemoryLayout, RowEmulator
from jolt_tpu.riscv.program import expand_program
from jolt_tpu.tracer.trace import trace_program
from jolt_tpu.witness.flags import PROVABLE_KINDS
from jolt_tpu.witness.instruction_lookups import extract_instruction_lookup_witness
from jolt_tpu.witness.r1cs_inputs import extract_r1cs_inputs

ENTRY = 0x80000000

R_OPS = ["add", "sub", "sll", "slt", "sltu", "xor", "srl", "sra", "or",
         "and", "addw", "subw", "sllw", "srlw", "sraw",
         "mul", "mulh", "mulhsu", "mulhu", "mulw",
         "div", "divu", "rem", "remu", "divw", "divuw", "remw", "remuw"]
I_OPS = ["addi", "slti", "sltiu", "xori", "ori", "andi", "addiw"]
SHIFT_I_OPS = ["slli", "srli", "srai", "slliw", "srliw", "sraiw"]
LOADS = ["lb", "lh", "lw", "ld", "lbu", "lhu", "lwu"]
STORES = ["sb", "sh", "sw", "sd"]


def _epilogue(layout, result_reg="s1"):
    return f"""
    li   s10, {layout.output_start}
    sd   {result_reg}, 0(s10)
    li   s10, {layout.termination}
    li   s11, 1
    sd   s11, 0(s10)
"""


def _differential(source: str, layout=None):
    """Run expanded-row and direct emulators; compare registers + outputs."""
    layout = layout or MemoryLayout()
    code = assemble(source, base=ENTRY)

    dev_d = JoltDevice(layout, b"")
    direct = Emulator(dev_d, entry=ENTRY)
    direct.load_bytes(ENTRY, code)
    direct.run(record_trace=False)

    dev_r = JoltDevice(layout, b"")
    rower = RowEmulator(dev_r, expand_program(code, ENTRY))
    rower.run(record_trace=False)

    assert rower.regs[:32] == direct.regs[:32]
    assert bytes(dev_r.outputs) == bytes(dev_d.outputs)
    assert dev_r.panic == dev_d.panic
    return rower


def _provable(source: str, layout=None):
    """Trace + extract witnesses: PROVABLE_KINDS / R1CS / lookup gates."""
    layout = layout or MemoryLayout()
    tr = trace_program(source, layout=layout, min_padded=16)
    from jolt_tpu.riscv import isa
    for k in tr.col("kind").tolist():
        assert isa.KINDS[k] in PROVABLE_KINDS
    inputs = extract_r1cs_inputs(tr)
    assert check_satisfied(inputs) == []
    extract_instruction_lookup_witness(tr, inputs)  # raises on any mismatch
    return tr


def _random_alu_source(seed: int, n: int = 60) -> str:
    rng = random.Random(seed)
    regs = [f"t{i}" for i in range(7)] + [f"a{i}" for i in range(8)]
    lines = ["    li   t0, 0x9e3779b97f4a7c15", "    li   t1, -37",
             "    li   t2, 0x8000000000000000", "    li   t3, -1"]
    for _ in range(n):
        op = rng.choice(R_OPS + I_OPS + SHIFT_I_OPS)
        rd = rng.choice(regs)
        r1 = rng.choice(regs)
        if op in R_OPS:
            lines.append(f"    {op} {rd}, {r1}, {rng.choice(regs)}")
        elif op in SHIFT_I_OPS:
            sh = rng.randrange(32 if op.endswith('w') else 64)
            lines.append(f"    {op} {rd}, {r1}, {sh}")
        else:
            lines.append(f"    {op} {rd}, {r1}, {rng.randrange(-2048, 2048)}")
    return "\n".join(lines)


@pytest.mark.parametrize("seed", [1, 2, 3])
def test_differential_random_alu(seed):
    layout = MemoryLayout()
    src = _random_alu_source(seed) + _epilogue(layout)
    _differential(src, layout)


def test_differential_memory():
    layout = MemoryLayout()
    rng = random.Random(7)
    lines = ["    li   s0, 0x80003000", "    li   t0, 0xdeadbeefcafe1234"]
    for i in range(40):
        st = rng.choice(STORES)
        size = {"sb": 1, "sh": 2, "sw": 4, "sd": 8}[st]
        off = rng.randrange(0, 64 // size) * size
        lines.append(f"    {st} t0, {off}(s0)")
        ld = rng.choice([l for l in LOADS
                         if {"lb": 1, "lbu": 1, "lh": 2, "lhu": 2, "lw": 4,
                             "lwu": 4, "ld": 8}[l] <= size])
        lsize = {"lb": 1, "lbu": 1, "lh": 2, "lhu": 2, "lw": 4, "lwu": 4,
                 "ld": 8}[ld]
        loff = rng.randrange(0, 64 // lsize) * lsize
        lines.append(f"    {ld} s1, {loff}(s0)")
        lines.append(f"    xor t0, t0, s1")
        lines.append(f"    addi t0, t0, {i + 1}")
    src = "\n".join(lines) + _epilogue(layout)
    _differential(src, layout)
    _provable(src, layout)


DIV_EDGE_CASES = [
    # (dividend, divisor): RISC-V division edge semantics
    (10, 0), (-10, 0), (0, 0),
    (-(1 << 63), -1),            # signed 64 overflow
    (-(1 << 31) & ((1 << 64) - 1), -1),  # word MIN as 64-bit value
    (123456789, -37), (-123456789, 37), (-5, -3), (7, 7),
    ((1 << 63) - 1, 2), (1, -(1 << 63)),
]


@pytest.mark.parametrize("case", range(0, len(DIV_EDGE_CASES), 3))
def test_div_edge_cases_prove_shape(case):
    layout = MemoryLayout()
    lines = []
    for a, b in DIV_EDGE_CASES[case:case + 3]:
        lines += [f"    li  t0, {a}", f"    li  t1, {b}"]
        for op in ("div", "divu", "rem", "remu", "divw", "divuw", "remw",
                   "remuw"):
            lines.append(f"    {op} s1, t0, t1")
            lines.append("    add s2, s2, s1")
    src = "\n".join(lines) + _epilogue(layout, "s2")
    _differential(src, layout)
    _provable(src, layout)


def test_full_isa_provable():
    """Every RV64IM instruction class in one trace: expanded, R1CS-clean,
    lookup-consistent."""
    layout = MemoryLayout()
    src = f"""
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
    addw a4, t0, t1
    subw a5, t0, t1
    sllw a6, t0, t1
    srlw a7, t0, t1
    sraw s2, t0, t1
    mulw s3, t0, t1
    divw s4, t0, t1
    remw s5, t0, t1
    divuw s6, t0, t1
    remuw s7, t0, t1
    addiw s8, t0, 99
    slliw s9, t0, 5
    srliw s9, t0, 5
    sraiw s9, t0, 5
    li   s0, 0x80002000
    sb   t0, 3(s0)
    sh   t0, 2(s0)
    sw   t0, 4(s0)
    lb   s1, 3(s0)
    lbu  s1, 3(s0)
    lh   s1, 2(s0)
    lhu  s1, 2(s0)
    lw   s1, 4(s0)
    lwu  s1, 4(s0)
    ld   s1, 0(s0)
""" + _epilogue(layout)
    _differential(src, layout)
    tr = _provable(src, layout)
    # sequence-flag sanity on the expanded program
    virt = [r for r in tr.program.rows if r.virtual]
    assert virt, "expected virtual sequences"
    for r in tr.program.rows:
        if not r.virtual:
            assert not r.first and not r.last


def test_x0_destination_noops():
    """rd=x0 arithmetic (including expanded kinds) is a NOOP row; jumps
    keep the x32 rewrite."""
    layout = MemoryLayout()
    src = """
    li   t0, 77
    li   t1, 3
    div  x0, t0, t1
    add  x0, t0, t1
    sll  x0, t0, t1
""" + _epilogue(layout, "t0")
    emu = _differential(src, layout)
    prog = emu.program
    # each rd=x0 source op became one `addi x32, x0, 0` row
    sinks = [r for r in prog.rows
             if r.kind == "ADDI" and r.rd == 32 and r.rs1 == 0 and r.imm == 0]
    assert len(sinks) >= 3
    _provable(src, layout)


def test_expansion_is_deterministic():
    code = assemble(_random_alu_source(9), base=ENTRY)
    p1 = expand_program(code, ENTRY)
    p2 = expand_program(code, ENTRY)
    assert [dataclass_tuple(r) for r in p1.rows] == \
        [dataclass_tuple(r) for r in p2.rows]
    assert p1.addr2row == p2.addr2row


def dataclass_tuple(r):
    return (r.kind, r.address, r.rd, r.rs1, r.rs2, r.imm, r.virtual,
            r.first, r.last, r.advice)
