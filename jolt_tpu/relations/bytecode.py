"""Bytecode read-raf Shout: decoded-field openings vs the public program.

Reference: `zkvm/bytecode/read_raf_checking.rs` (stage 6a/6b).

Relation (all decoded columns batched under gamma powers):
    sum_{k,j} eq(r_cycle, j) * ra_bc(k,j) * TAB(k) = sum_c gamma^c * claim_c
where TAB = sum_c gamma^c * C_c and C_c are the PUBLIC decoded-program
columns (pc affine, imm, circuit flags, branch flag).  The verifier
evaluates TAB(r_addr) itself from the program -- the prover cannot lie
about decoding.  Missing (gap): ra_bc booleanity/Hamming-weight sumchecks.
"""

from __future__ import annotations

from functools import partial
from typing import Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp

from ..field import FR, ops
from ..poly import dense, eq
from ..poly.univariate import UniPoly
from ..sumcheck.engine import OpeningAccumulator, SumcheckInstance
from ..witness.bytecode import TABLE_COLUMNS, BytecodeWitness, decode_table

P = FR.modulus

# opening name in stage-1 id space -> table column (pc and unexpanded_pc
# both read the affine pc column)
CLAIM_COLUMNS: List = [("pc", "pc"), ("unexpanded_pc", "pc"), ("imm", "imm"),
                       ("branch", "branch")] + [
    (f"flag_{n}", f"flag_{n}")
    for n in ("AddOperands", "SubtractOperands", "MultiplyOperands", "Load",
              "Store", "Jump", "WriteLookupOutputToRD", "VirtualInstruction",
              "Assert", "DoNotUpdateUnexpandedPC", "Advice", "IsCompressed",
              "IsFirstInSequence", "IsLastInSequence")] + [
    ("_virtual_rd_idx", "rd_idx"), ("_virtual_rs1_idx", "rs1_idx"),
    ("_virtual_rs2_idx", "rs2_idx")]


def _pc_column(entry: int, K: int) -> List[int]:
    return [(entry + 4 * k) % P for k in range(K)]


def combined_table(table: Dict[str, List[int]], entry: int, K: int,
                   gamma: int, columns=None) -> List[int]:
    cols = dict(table)
    cols["pc"] = _pc_column(entry, K)
    out = [0] * K
    g = 1
    for _, col_name in (columns or CLAIM_COLUMNS):
        col = cols[col_name]
        for k in range(K):
            out[k] = (out[k] + g * col[k]) % P
        g = g * gamma % P
    return out


def combined_table_eval(code: bytes, entry: int, K: int, gamma: int,
                        r_addr: Sequence[int], columns=None) -> int:
    """Verifier-side: MLE of the combined public table at r_addr."""
    tab = combined_table(decode_table(code, entry, K), entry, K, gamma,
                         columns)
    n = len(r_addr)
    assert K == 1 << n
    # chi weights via iterative halving (O(K) muls)
    vals = [v % P for v in tab]
    for rb in reversed(r_addr):  # bind LSB var first
        vals = [(vals[2 * i] + rb * (vals[2 * i + 1] - vals[2 * i])) % P
                for i in range(len(vals) // 2)]
    return vals[0]


@partial(jax.jit, static_argnames=('fp',))
def _bc_message_kernel(E, RA, TAB, fp=FR):
    e = dense.sumcheck_eval_points_high(E, 3, fp)
    ra = dense.sumcheck_eval_points_high(RA, 3, fp)
    t = dense.sumcheck_eval_points_high(TAB, 3, fp)
    return ops.sum_mod(ops.mont_mul(e, ops.mont_mul(ra, t, fp), fp), fp)


class BytecodeReadRaf(SumcheckInstance):
    def __init__(self, wit: BytecodeWitness, gamma: int,
                 r_cycle: Sequence[int], claims: Sequence[int],
                 columns=None, label: str = "bytecode"):
        self.wit = wit
        self.T, self.K = wit.T, wit.K
        self.log_T = self.T.bit_length() - 1
        self.gamma = gamma
        self.r_cycle = list(r_cycle)
        self.claims = list(claims)
        self.label = label
        L = FR.num_limbs
        tab = combined_table(wit.table, wit.entry, self.K, gamma, columns)
        tab_dev = ops.pack_ints(tab)
        self.TAB = jnp.broadcast_to(tab_dev[:, None, :],
                                    (L, self.T, self.K)).reshape(L, -1)
        self.RA = ops.pack_ints(wit.ra)
        E = eq.evals(self.r_cycle)
        self.E = jnp.broadcast_to(E[:, :, None],
                                  (L, self.T, self.K)).reshape(L, -1)
        self.final_openings: Optional[dict] = None

    @property
    def num_rounds(self) -> int:
        return self.log_T + self.wit.log_K

    def input_claim(self, accumulator: OpeningAccumulator) -> int:
        acc, g = 0, 1
        for c in self.claims:
            acc = (acc + g * c) % P
            g = g * self.gamma % P
        return acc

    def compute_message(self, round: int, previous_claim: int) -> UniPoly:
        evals = ops.unpack_ints(_bc_message_kernel(self.E, self.RA, self.TAB))
        return UniPoly.from_evals_and_hint(previous_claim, evals, P)

    def ingest_challenge(self, r: int, round: int) -> None:
        r_dev = ops.pack_ints([r])
        b = partial(dense.bind_high, fp=FR)
        self.E, self.RA, self.TAB = (b(self.E, r_dev), b(self.RA, r_dev),
                                     b(self.TAB, r_dev))

    def finalize(self) -> None:
        self.final_openings = {"ra": ops.unpack_ints(self.RA)[0]}

    def cache_openings(self, accumulator: OpeningAccumulator,
                       r_slice: Sequence[int]) -> None:
        accumulator.insert((self.label, "ra"), list(r_slice),
                           self.final_openings["ra"])

    def expected_output_claim(self, accumulator, r):  # pragma: no cover
        raise NotImplementedError


class BytecodeReadRafVerifier(SumcheckInstance):
    def __init__(self, log_T: int, log_K: int, gamma: int,
                 r_cycle: Sequence[int], claims: Sequence[int],
                 code: bytes, entry: int, openings: dict, columns=None):
        self.log_T, self.log_K = log_T, log_K
        self.gamma = gamma
        self.r_cycle = list(r_cycle)
        self.claims = list(claims)
        self.code, self.entry = code, entry
        self.openings = openings
        self.columns = columns

    @property
    def num_rounds(self) -> int:
        return self.log_T + self.log_K

    def input_claim(self, accumulator: OpeningAccumulator) -> int:
        acc, g = 0, 1
        for c in self.claims:
            acc = (acc + g * c) % P
            g = g * self.gamma % P
        return acc

    def compute_message(self, round, prev):  # pragma: no cover
        raise NotImplementedError("verifier instance")

    def ingest_challenge(self, r, round):  # pragma: no cover
        raise NotImplementedError("verifier instance")

    def expected_output_claim(self, accumulator: OpeningAccumulator,
                              r: Sequence[int]) -> int:
        r_cyc = list(r[:self.log_T])
        r_addr = list(r[self.log_T:])
        tab_eval = combined_table_eval(self.code, self.entry, 1 << self.log_K,
                                       self.gamma, r_addr, self.columns)
        return (eq.eq_int(self.r_cycle, r_cyc) * self.openings["ra"] % P
                * tab_eval % P)
