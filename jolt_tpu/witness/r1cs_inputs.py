"""Trace -> per-cycle R1CS witness variables (the 38-column z vector).

Mirrors `crates/jolt-prover-legacy/src/zkvm/r1cs/inputs.rs` +
`crates/jolt-witness/src/witnesses/operands.rs`:

  * instruction inputs: left = rs1 | PC | 0, right = rs2 | imm-masked | 0
    (all masked to unsigned 64-bit -- operand signedness is handled by the
    lookup tables, `instructions/riscv/addi.rs:10-19`)
  * Product = left * right as an exact integer (`operands.rs:122-133`)
  * lookup operands per the Add/Sub/Mul shaping flags
    (`instructions/riscv/{add,sub,mul}.rs` to_lookup_operands)
  * Imm enters the field *signed* (`operands.rs:135-139`)

Values are exact Python ints (possibly >64-bit, possibly negative) reduced
mod p at field packing time.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List

import numpy as np

from ..field.params import FR
from ..lookups import tables as LT
from ..riscv import isa
from ..tracer.trace import Trace
from . import flags as F

P = FR.modulus
M64 = (1 << 64) - 1

# Variable indices (crates/jolt-r1cs/src/constraints/rv64.rs:22-64)
V_CONST = 0
V_LEFT_INSTRUCTION_INPUT = 1
V_RIGHT_INSTRUCTION_INPUT = 2
V_PRODUCT = 3
V_SHOULD_BRANCH = 4
V_PC = 5
V_UNEXPANDED_PC = 6
V_IMM = 7
V_RAM_ADDRESS = 8
V_RS1_VALUE = 9
V_RS2_VALUE = 10
V_RD_WRITE_VALUE = 11
V_RAM_READ_VALUE = 12
V_RAM_WRITE_VALUE = 13
V_LEFT_LOOKUP_OPERAND = 14
V_RIGHT_LOOKUP_OPERAND = 15
V_NEXT_UNEXPANDED_PC = 16
V_NEXT_PC = 17
V_NEXT_IS_VIRTUAL = 18
V_NEXT_IS_FIRST_IN_SEQUENCE = 19
V_LOOKUP_OUTPUT = 20
V_SHOULD_JUMP = 21
V_FLAG_BASE = 22           # 14 circuit flags in CIRCUIT_FLAGS order
V_BRANCH = 36
V_NEXT_IS_NOOP = 37
NUM_VARS = 38

VAR_NAMES = (
    ["const", "left_input", "right_input", "product", "should_branch", "pc",
     "unexpanded_pc", "imm", "ram_address", "rs1_value", "rs2_value",
     "rd_write_value", "ram_read_value", "ram_write_value",
     "left_lookup_operand", "right_lookup_operand", "next_unexpanded_pc",
     "next_pc", "next_is_virtual", "next_is_first_in_sequence",
     "lookup_output", "should_jump"]
    + [f"flag_{name}" for name in F.CIRCUIT_FLAGS]
    + ["branch", "next_is_noop"]
)


def _s64(x: int) -> int:
    return x - (1 << 64) if x >> 63 else x


def _lookup_output(kind: str, rs1: int, rs2: int, imm: int, pc: int,
                   rd_post: int) -> int:
    """Per-kind lookup output (jolt-lookup-tables/src/instructions/riscv/*).

    For WriteLookupOutputToRD instructions the output equals the value
    written to rd; branches produce the comparison bit; jumps the target;
    asserts are 1 on any honest trace (the extractor's table self-check
    rejects a violating trace before proving)."""
    if F.circuit_flag(kind, "Assert"):
        return 1
    if F.circuit_flag(kind, "WriteLookupOutputToRD"):
        return rd_post
    if F.instruction_flag(kind, "Branch"):
        a, b = rs1, rs2
        return {
            "BEQ": a == b, "BNE": a != b,
            "BLT": _s64(a) < _s64(b), "BGE": _s64(a) >= _s64(b),
            "BLTU": a < b, "BGEU": a >= b,
        }[kind] and 1 or 0
    if kind == "JAL":
        return (pc + imm) & M64
    if kind == "JALR":
        return (rs1 + imm) & M64 & ~1
    return 0


@dataclasses.dataclass
class R1CSCycleInputs:
    """All 38 columns as exact-int lists of padded-trace length."""

    columns: List[List[int]]   # [NUM_VARS][T]
    T: int

    def col(self, idx: int) -> List[int]:
        return self.columns[idx]


def row_circuit_flags(row) -> frozenset:
    """Kind flags + per-row sequence flags (VirtualInstruction,
    IsFirst/IsLastInSequence, and DoNotUpdateUnexpandedPC on every
    non-final sequence row)."""
    cf = set(F.FLAGS[row.kind][0])
    if row.virtual:
        cf.add("VirtualInstruction")
        if row.first:
            cf.add("IsFirstInSequence")
        if row.last:
            cf.add("IsLastInSequence")
        else:
            cf.add("DoNotUpdateUnexpandedPC")
    return frozenset(cf)


_HALT_ROW = None


def halt_row():
    """The one-past-the-end bytecode row (NOOP); trace padding rows point
    here, as do cycles that fall off the end of the program."""
    global _HALT_ROW
    if _HALT_ROW is None:
        from ..riscv.program import Row
        _HALT_ROW = Row(kind="NOOP", address=0)
    return _HALT_ROW


def extract_r1cs_inputs(trace: Trace, strict: bool = True) -> R1CSCycleInputs:
    T = trace.padded_length
    kinds = trace.col("kind")
    names = [isa.KINDS[k] for k in kinds.tolist()]
    program = trace.program

    def u64(name):
        lo, hi = trace.u64_col(name)
        return (lo.astype(np.uint64) | (hi.astype(np.uint64) << np.uint64(32))).tolist()

    pc = u64("pc")
    pc_idx = u64("pc_idx")
    rs1v = u64("rs1_val")
    rs2v = u64("rs2_val")
    rd_post = u64("rd_post")
    ram_pre = u64("ram_pre")
    ram_post = u64("ram_post")

    cols: List[List[int]] = [[0] * T for _ in range(NUM_VARS)]
    rows = []   # per-cycle bytecode row (static source of imm/flags)

    for j in range(T):
        kind = names[j]
        if strict and kind not in F.PROVABLE_KINDS:
            raise ValueError(
                f"{kind} at cycle {j} is not a final bytecode row "
                f"(expansion bug)")
        k_idx = int(pc_idx[j])
        row = (program.rows[k_idx] if program is not None
               and k_idx < program.n_rows else halt_row())
        if program is not None and row.kind != kind and kind != "NOOP":
            raise ValueError(
                f"trace kind {kind} at cycle {j} disagrees with bytecode "
                f"row {k_idx} ({row.kind})")
        rows.append(row)
        cf = row_circuit_flags(row)
        inf = F.FLAGS[kind][1]
        imm_s = row.imm if kind != "NOOP" else 0
        eff = LT.effective_imm(kind, imm_s)
        if eff is not None:
            imm_s = eff   # 1:1 virtual rewrite (2^shift / shift bitmask)

        left = rs1v[j] if "LeftOperandIsRs1Value" in inf else (
            pc[j] if "LeftOperandIsPC" in inf else 0)
        right = rs2v[j] if "RightOperandIsRs2Value" in inf else (
            (imm_s & M64) if "RightOperandIsImm" in inf else 0)
        product = left * right
        lookup_out = _lookup_output(kind, rs1v[j], rs2v[j], imm_s, pc[j], rd_post[j])

        add_f = "AddOperands" in cf
        sub_f = "SubtractOperands" in cf
        mul_f = "MultiplyOperands" in cf
        load_f = "Load" in cf
        store_f = "Store" in cf
        advice_f = "Advice" in cf

        if advice_f:
            # the advice value IS the lookup index (RangeCheck-bound)
            left_lookup = 0
            right_lookup = rd_post[j]
        elif add_f or sub_f or mul_f:
            left_lookup = 0
            right_lookup = (left + right) if add_f else (
                (left - right + (1 << 64)) if sub_f else product)
        else:
            left_lookup = left
            right_lookup = right

        c = lambda idx, v: cols[idx].__setitem__(j, v)
        c(V_CONST, 1)
        c(V_LEFT_INSTRUCTION_INPUT, left)
        c(V_RIGHT_INSTRUCTION_INPUT, right)
        c(V_PRODUCT, product)
        c(V_PC, k_idx)
        c(V_UNEXPANDED_PC, pc[j])
        c(V_IMM, imm_s)
        c(V_RAM_ADDRESS, (rs1v[j] + imm_s) if (load_f or store_f) else 0)
        c(V_RS1_VALUE, rs1v[j])
        c(V_RS2_VALUE, rs2v[j])
        c(V_RD_WRITE_VALUE, rd_post[j])
        c(V_RAM_READ_VALUE, ram_pre[j] if (load_f or store_f) else 0)
        c(V_RAM_WRITE_VALUE, ram_post[j] if (load_f or store_f) else 0)
        c(V_LEFT_LOOKUP_OPERAND, left_lookup)
        c(V_RIGHT_LOOKUP_OPERAND, right_lookup)
        c(V_LOOKUP_OUTPUT, lookup_out)
        c(V_BRANCH, 1 if "Branch" in inf else 0)
        for fi, fname in enumerate(F.CIRCUIT_FLAGS):
            c(V_FLAG_BASE + fi, 1 if fname in cf else 0)

    # next-row-dependent columns
    for j in range(T):
        nxt = j + 1 if j + 1 < T else j  # padding rows self-repeat
        next_is_noop = 1 if (j + 1 >= T or names[j + 1] == "NOOP") else 0
        cols[V_NEXT_UNEXPANDED_PC][j] = cols[V_UNEXPANDED_PC][nxt] if j + 1 < T \
            else cols[V_UNEXPANDED_PC][j]
        cols[V_NEXT_PC][j] = cols[V_PC][nxt] if j + 1 < T else cols[V_PC][j]
        nrow = rows[nxt] if j + 1 < T else halt_row()
        cols[V_NEXT_IS_VIRTUAL][j] = 1 if nrow.virtual else 0
        cols[V_NEXT_IS_FIRST_IN_SEQUENCE][j] = 1 if nrow.first else 0
        cols[V_NEXT_IS_NOOP][j] = next_is_noop
        jump_f = cols[V_FLAG_BASE + F.CIRCUIT_FLAGS.index("Jump")][j]
        cols[V_SHOULD_JUMP][j] = jump_f * (1 - next_is_noop)
        cols[V_SHOULD_BRANCH][j] = cols[V_LOOKUP_OUTPUT][j] * cols[V_BRANCH][j]

    return R1CSCycleInputs(columns=cols, T=T)
