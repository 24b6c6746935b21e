"""Instruction-lookup witness: per-cycle lookup indices, table choices,
and the d-chunked one-hot address decomposition.

Reference: `crates/jolt-prover-legacy/src/zkvm/instruction_lookups/mod.rs`
(LOG_K = 128), `zkvm/witness.rs:24-74` (CommittedPolynomial::InstructionRa(i)),
`zkvm/config.rs:175-210` (OneHotParams: log_k_chunk=8 -> d=16 committed
one-hot chunk selectors ra_i(k_i, j), each over 2^8 rows).

The lookup index is derived from the SAME shaped operands the R1CS
constrains (`witness/r1cs_inputs.py` left/right lookup operand columns), so
the read-raf sumcheck closes the loop: R1CS shapes operands ->  raf ties the
one-hot index to the operands -> read ties LookupOutput to the table MLE at
the index -> R1CS routes LookupOutput into rd/branch/jump semantics.
"""

from __future__ import annotations

import dataclasses
from typing import List

import numpy as np

from ..field.params import FR
from ..lookups import tables as LT
from ..riscv import isa
from ..tracer.trace import Trace
from . import flags as F
from .r1cs_inputs import (R1CSCycleInputs, V_LEFT_LOOKUP_OPERAND,
                          V_LOOKUP_OUTPUT, V_RIGHT_LOOKUP_OPERAND)

P = FR.modulus

# OneHotParams: log_k_chunk = 8, d = LOG_K / log_k_chunk = 16
LOG_M = 8
M = 1 << LOG_M
D = LT.LOG_K // LOG_M  # 16


@dataclasses.dataclass
class InstructionLookupWitness:
    indices: List[int]       # [T] 128-bit lookup indices (exact ints)
    table_ids: List[int]     # [T] index into LT.TABLE_NAMES, or -1
    interleaved: List[int]   # [T] 1 = interleaved-operand instruction
    chunks: np.ndarray       # [D, T] uint32: chunk c of each index,
    #                          chunk 0 = most-significant LOG_M bits
    T: int

    def onehot_chunk(self, i: int) -> List[int]:
        """Committed InstructionRa(i): cycle-major one-hot [M*T]."""
        out = [0] * (M * self.T)
        col = self.chunks[i]
        for j in range(self.T):
            out[j * M + int(col[j])] = 1
        return out


def extract_instruction_lookup_witness(
        trace: Trace, inputs: R1CSCycleInputs) -> InstructionLookupWitness:
    T = inputs.T
    kinds = [isa.KINDS[k] for k in trace.col("kind").tolist()]
    left_col = inputs.col(V_LEFT_LOOKUP_OPERAND)
    right_col = inputs.col(V_RIGHT_LOOKUP_OPERAND)
    out_col = inputs.col(V_LOOKUP_OUTPUT)

    indices: List[int] = [0] * T
    table_ids: List[int] = [-1] * T
    interleaved: List[int] = [0] * T
    chunks = np.zeros((D, T), dtype=np.uint32)

    for j in range(T):
        kind = kinds[j]
        cf = F.FLAGS[kind][0]
        inter = not ({"AddOperands", "SubtractOperands", "MultiplyOperands",
                      "Advice"} & set(cf))
        interleaved[j] = 1 if inter else 0
        idx = LT.lookup_index(inter, left_col[j], right_col[j])
        indices[j] = idx
        tname = LT.KIND_TABLE.get(kind)
        if tname is not None:
            table_ids[j] = LT.TABLE_INDEX[tname]
            # prover self-check: the R1CS LookupOutput column must equal
            # the table entry at the index (zkvm/prover.rs:539 analog)
            want = LT.table_entry(tname, idx)
            if out_col[j] % P != want % P:
                raise ValueError(
                    f"lookup output mismatch at cycle {j} ({kind}): "
                    f"column {out_col[j]} vs table {want}")
        elif out_col[j] % P != 0:
            raise ValueError(f"nonzero LookupOutput for no-table {kind}@{j}")
        for i in range(D):
            chunks[i, j] = (idx >> (LT.LOG_K - LOG_M * (i + 1))) & (M - 1)

    return InstructionLookupWitness(indices=indices, table_ids=table_ids,
                                    interleaved=interleaved, chunks=chunks,
                                    T=T)
