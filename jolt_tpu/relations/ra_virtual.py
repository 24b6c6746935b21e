"""ra virtualization: tie a full one-hot access matrix's opening to its
d committed 8-bit chunk sub-selectors.

Reference: `zkvm/ram/ra_virtual.rs` / `zkvm/instruction_lookups/
ra_virtual.rs` and the committed id space `RamRa(i)` / `BytecodeRa(i)`
(`zkvm/witness.rs:24-74`) -- the reference NEVER commits a one-hot wider
than 256 rows (`poly/one_hot_polynomial.rs:107` asserts K <= 256); wide
address spaces (RAM, bytecode) are committed as d = ceil(log K / 8) chunk
selectors and the full ra is a VIRTUAL polynomial tied to them by this
sumcheck:

    ra(r_addr, r_cycle) = sum_j eq(r_cycle, j) * prod_i ra_i(b_i(r_addr), j)

where b_i splits r_addr into blocks (block 0 carries log K - 8(d-1) vars,
the rest 8), using eq(r_addr, k) = prod_i eq(b_i(r_addr), chunk_i(k)).
The bound per-factor values ARE the committed chunk matrices' openings at
(r_cycle', block point) -- each chunk matrix is committed at its natural
width 2^w_i, so opening points are the bare block slices.

One instance per accumulated full-ra claim; instances across matrices and
claim points batch into one stage.  Structure mirrors the instruction
Shout cycle phase: a stacked (L, d+1, T) device array, degree-(d+1)
messages, pair-order scan binding.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

import jax.numpy as jnp
import numpy as np

from ..field import FR, ops
from ..poly import eq
from ..poly.univariate import UniPoly
from ..sumcheck import scan
from ..sumcheck.engine import OpeningAccumulator, SumcheckInstance

P = FR.modulus


def d_chunks(log_K: int) -> int:
    """Number of committed 8-bit chunk selectors for a log_K-bit space."""
    return max(1, (log_K + 7) // 8)


def block_widths(log_K: int) -> List[int]:
    """Variable counts per chunk block (block 0 may be narrower)."""
    d = d_chunks(log_K)
    return [log_K - 8 * (d - 1)] + [8] * (d - 1)


def chunk_streams(indices: np.ndarray, log_K: int) -> List[np.ndarray]:
    """Per-chunk index streams from the full index stream; chunk 0 holds
    the most-significant block (committed 2^w_i rows each; block 0 may be narrower)."""
    idx = np.asarray(indices, np.int64)
    d = d_chunks(log_K)
    return [((idx >> (8 * (d - 1 - i))) & 0xFF).astype(np.int64)
            for i in range(d)]


def block_point(r_addr: Sequence[int], log_K: int, i: int) -> List[int]:
    """Block i's address coordinates: the committed chunk matrix is exactly
    2^w_i rows wide (block 0 may be narrower than 8), so the opening point
    is the bare block slice -- no zero padding (literal-0/1 coordinates
    would break the grouped reduction's division trick)."""
    ws = block_widths(log_K)
    start = sum(ws[:i])
    return [x % P for x in r_addr[start:start + ws[i]]]


class RaVirtual(scan.ScanFusedInstance):
    """One full-ra claim -> d chunk openings (prover side)."""

    def __init__(self, chunks: List[np.ndarray], log_K: int,
                 r_cycle: Sequence[int], r_addr: Sequence[int], claim: int,
                 tag: Tuple[str, int]):
        self.log_K = log_K
        self.d = len(chunks)
        self.degree = self.d + 1
        self.T = len(chunks[0])
        self.log_T = self.T.bit_length() - 1
        self.r_cycle = [x % P for x in r_cycle]
        self.r_addr = [x % P for x in r_addr]
        self._claim = claim % P
        self.tag = tag            # (commit-name prefix, claim index)
        arrays = [eq.evals(self.r_cycle)]
        ws = block_widths(log_K)
        off = 0
        for i in range(self.d):
            blk = self.r_addr[off:off + ws[i]]
            off += ws[i]
            v_tab = eq.evals(blk)                     # (L, 2^w)
            col = jnp.asarray(np.asarray(chunks[i], np.int32))
            arrays.append(jnp.take(v_tab, col, axis=1))
        self.S = jnp.stack(arrays, axis=1)            # (L, d+1, T)
        self.final_openings: Optional[List[int]] = None

    @property
    def num_rounds(self) -> int:
        return self.log_T

    def input_claim(self, accumulator: OpeningAccumulator) -> int:
        return self._claim

    # ---- host-engine protocol -------------------------------------------

    def message_evals_dev(self, round: int):
        from .instruction_read_raf import _cycle_message_kernel
        return _cycle_message_kernel(self.S, self.degree), None

    def compute_message(self, round: int, previous_claim: int) -> UniPoly:
        from .instruction_read_raf import _cycle_message_kernel
        evals = ops.unpack_ints(_cycle_message_kernel(self.S, self.degree))
        return UniPoly.from_evals_and_hint(previous_claim, evals, P)

    def ingest_challenge(self, r: int, round: int) -> None:
        from ..poly import dense
        r_dev = ops.pack_ints([r])[:, :, None]
        self.S = dense.bind_high(self.S, r_dev, FR)

    # ---- scan protocol ----------------------------------------------------

    def scan_plan(self):
        return [("main", self.num_rounds)]

    def scan_state0(self):
        return (scan.to_pair_order(self.S),)

    def scan_message(self, mode, bc, x, st):
        (S,) = st
        evs = scan.pair_eval_points(S, self.degree)   # (L, deg, d+1, T/2)
        acc = evs[:, :, 0]
        for f in range(1, self.degree):
            acc = ops.mont_mul(acc, evs[:, :, f], FR)
        return ops.sum_mod(acc, FR)

    def scan_bind(self, mode, bc, x, st, r):
        # state is 3-D (L, d+1, T): broadcast the challenge over factors
        return (scan.pair_bind(st[0], r[:, :, None]),)

    def scan_shrink_plan(self, mode, n_rounds):
        return scan.default_shrink_plan(n_rounds, self.T)

    def scan_shrink(self, mode, s, bc, st):
        n = 1 << (self.num_rounds - s)
        return (st[0][..., :n],)

    def scan_finals(self, st):
        return (st[0][..., :1],)

    def fused_store(self, finals) -> None:
        self.S = finals[0]

    def finalize(self) -> None:
        vals = ops.unpack_ints(self.S)                # d+1 ints
        self.final_openings = vals[1:]

    def cache_openings(self, accumulator: OpeningAccumulator,
                       r_slice: Sequence[int]) -> None:
        prefix, t = self.tag
        r_cyc2 = list(r_slice)
        for i in range(self.d):
            pt = r_cyc2 + block_point(self.r_addr, self.log_K, i)
            accumulator.insert((f"{prefix}_virt", (t, i)), pt,
                               self.final_openings[i])

    def expected_output_claim(self, accumulator, r):  # pragma: no cover
        raise NotImplementedError


class RaVirtualVerifier(SumcheckInstance):
    def __init__(self, log_T: int, log_K: int, r_cycle: Sequence[int],
                 claim: int, chunk_openings: Sequence[int]):
        self.log_T = log_T
        self.log_K = log_K
        self.d = d_chunks(log_K)
        self.degree = self.d + 1
        self.r_cycle = [x % P for x in r_cycle]
        self._claim = claim % P
        self.chunk_openings = [x % P for x in chunk_openings]

    @property
    def num_rounds(self) -> int:
        return self.log_T

    def input_claim(self, accumulator: OpeningAccumulator) -> int:
        return self._claim

    def compute_message(self, round, prev):  # pragma: no cover
        raise NotImplementedError("verifier instance")

    def ingest_challenge(self, r, round):  # pragma: no cover
        raise NotImplementedError("verifier instance")

    def expected_output_claim(self, accumulator: OpeningAccumulator,
                              r: Sequence[int]) -> int:
        acc = eq.eq_int(self.r_cycle, [x % P for x in r])
        for o in self.chunk_openings:
            acc = acc * o % P
        return acc
