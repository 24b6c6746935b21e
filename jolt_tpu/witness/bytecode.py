"""Bytecode witness: the Shout one-hot read argument over the program.

Reference: `zkvm/bytecode/read_raf_checking.rs` + `BytecodePreprocessing`.

Each cycle reads one bytecode row: ra_bc(k, j) is one-hot at
k = (pc(j) - entry)/4.  The public bytecode table holds, per row k, the
decoded fields the R1CS consumed as witness columns: unexpanded pc (affine
in k), imm, the 14 circuit flags, and the Branch instruction flag.
Out-of-program rows decode as NOOP (flags: DoNotUpdateUnexpandedPC), which
makes trace padding rows -- whose pc is one past the final instruction --
consistent with the table with no special-casing.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List

from ..field.params import FR
from ..lookups import tables as LT
from ..riscv import isa
from ..tracer.trace import Trace
from . import flags as F

P = FR.modulus

# ordered public table columns; each proves one stage-1 opening (register
# index columns prove the register-raf virtual claims; lk_* columns prove
# the instruction read-raf's lookup-table / raf flag claims)
TABLE_COLUMNS = (
    ["imm", "branch"] + [f"flag_{name}" for name in F.CIRCUIT_FLAGS]
    + ["rd_idx", "rs1_idx", "rs2_idx"]
    + [f"lk_{name}" for name in LT.TABLE_NAMES] + ["lk_raf"]
)

_NO_RD_KINDS = frozenset(
    ["NOOP", "SB", "SH", "SW", "SD", "BEQ", "BNE", "BLT", "BGE", "BLTU",
     "BGEU", "FENCE", "ECALL", "EBREAK"])


@dataclasses.dataclass
class BytecodeWitness:
    ra: List[int]                     # [K*T] one-hot, cycle-major
    pc_idx: List[int]                 # [T] per-cycle bytecode row index
    table: Dict[str, List[int]]       # public: column -> [K] values (mod p)
    K: int
    log_K: int
    T: int
    entry: int


def decode_table(code: bytes, entry: int, K: int) -> Dict[str, List[int]]:
    """Public decoded-program table, padded with NOOP rows."""
    noop_cf, noop_if = F.FLAGS["NOOP"]
    table: Dict[str, List[int]] = {c: [0] * K for c in TABLE_COLUMNS}
    n = len(code) // 4
    for k in range(K):
        kind, imm, rd, rs1, rs2 = "NOOP", 0, 0, 0, 0
        if k < n:
            word = int.from_bytes(code[4 * k:4 * k + 4], "little")
            try:
                dec = isa.decode(word)
                kind, imm = dec.kind, dec.imm
                rd, rs1, rs2 = dec.rd, dec.rs1, dec.rs2
                if rd == 0 and kind in ("JAL", "JALR"):
                    rd = 32  # the x0-jump virtual-register rewrite (emulator.py)
                if kind in _NO_RD_KINDS:
                    rd = 0
            except isa.DecodeError:
                pass
        cf, inf = F.FLAGS[kind]
        eff = LT.effective_imm(kind, imm)
        if eff is not None:
            imm = eff
        table["imm"][k] = imm % P
        table["branch"][k] = 1 if "Branch" in inf else 0
        for name in F.CIRCUIT_FLAGS:
            table[f"flag_{name}"][k] = 1 if name in cf else 0
        table["rd_idx"][k] = rd
        table["rs1_idx"][k] = rs1
        table["rs2_idx"][k] = rs2
        lk = LT.KIND_TABLE.get(kind)
        if lk is not None:
            table[f"lk_{lk}"][k] = 1
        interleaved = not ({"AddOperands", "SubtractOperands",
                            "MultiplyOperands", "Advice"} & set(cf))
        table["lk_raf"][k] = 0 if interleaved else 1
    return table


def extract_bytecode_witness(trace: Trace, code: bytes, entry: int) -> BytecodeWitness:
    T = trace.padded_length
    import numpy as np
    lo, hi = trace.u64_col("pc")
    pcs = (lo.astype(np.uint64) | (hi.astype(np.uint64) << np.uint64(32))).tolist()

    n = len(code) // 4
    K = 1
    while K < n + 2:  # +1 for the one-past-the-end halt row
        K *= 2
    log_K = K.bit_length() - 1

    ra = [0] * (K * T)
    pc_idx = [0] * T
    for j in range(T):
        k = (pcs[j] - entry) // 4
        assert 0 <= k < K, f"pc out of bytecode range at cycle {j}"
        ra[j * K + k] = 1
        pc_idx[j] = k

    return BytecodeWitness(ra=ra, pc_idx=pc_idx,
                           table=decode_table(code, entry, K),
                           K=K, log_K=log_K, T=T, entry=entry)
