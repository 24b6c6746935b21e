"""Spartan outer sumcheck over the uniform RV64 R1CS.

Proves  0 = sum_{k,j} eq(tau, (k,j)) * (Az(k,j)*Bz(k,j) - Cz(k,j))
over the padded constraint axis (k in [32]) and cycle axis (j in [T]).

Reference: `crates/jolt-prover-legacy/src/zkvm/spartan/outer.rs` (stage 1).
Round-1 simplification: a plain dense degree-3 sumcheck over all
log(32) + log(T) variables (HighToLow: constraint bits first).  The
reference's univariate-skip first round (`r1cs/constraints.rs:413-422`) is a
later optimization; the protocol is sound either way, and our verifier
performs the same final check as the reference's stage-1 verifier:
it reconstructs Az/Bz/Cz(r) from the 38 R1CS input openings via the sparse
constraint rows (the verifier-side matrix evaluation,
`jolt-verifier/src/stages/stage1`), so the prover cannot lie about the
matrices -- only the input openings remain to be proven in later stages.

Device work: Az/Bz/Cz/eq table construction and every round's
message+bind.  Host work: transcript, round polys, verifier algebra.
"""

from __future__ import annotations

from functools import partial
from typing import Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp

from ..field import FR, ops
from ..poly import dense, eq
from ..poly.univariate import UniPoly
from ..r1cs import constraints as C
from ..sumcheck import scan
from ..sumcheck.engine import OpeningAccumulator, SumcheckInstance
from ..sumcheck.scan import ScanFusedInstance
from ..witness.r1cs_inputs import NUM_VARS, R1CSCycleInputs, VAR_NAMES

P = FR.modulus


@partial(jax.jit, static_argnames=('fp',))
def _outer_message_kernel(E, AZ, BZ, CZ, fp=FR):
    """Round evals at X in {0,2,3} of sum eq*(Az*Bz - Cz).  (L, 3, 1)."""
    e = dense.sumcheck_eval_points_high(E, 3, fp)
    a = dense.sumcheck_eval_points_high(AZ, 3, fp)
    b = dense.sumcheck_eval_points_high(BZ, 3, fp)
    c = dense.sumcheck_eval_points_high(CZ, 3, fp)
    inner = ops.sub(ops.mont_mul(a, b, fp), c, fp)
    return ops.sum_mod(ops.mont_mul(e, inner, fp), fp)


@partial(jax.jit, static_argnames=('fp',))
def _bind4(E, AZ, BZ, CZ, r, fp=FR):
    return (dense.bind_high(E, r, fp), dense.bind_high(AZ, r, fp),
            dense.bind_high(BZ, r, fp), dense.bind_high(CZ, r, fp))


def materialize_az_bz_cz(inputs: R1CSCycleInputs):
    """Host-int materialization of the three (32*T)-long MLEs, index =
    k*T + j (constraint-major => constraint bits are the index MSBs).

    TODO(perf): move to device (linear combos of the 38 var MLEs).
    """
    Az, Bz, Cz = C.eval_az_bz_cz_int(inputs)
    T = inputs.T
    zeros = [0] * T
    rows_a, rows_b, rows_c = [], [], []
    for k in range(C.PADDED_CONSTRAINTS):
        rows_a += Az[k] if k < C.NUM_CONSTRAINTS else zeros
        rows_b += Bz[k] if k < C.NUM_CONSTRAINTS else zeros
        rows_c += Cz[k] if k < C.NUM_CONSTRAINTS else zeros
    return (ops.pack_ints(rows_a), ops.pack_ints(rows_b), ops.pack_ints(rows_c))


class SpartanOuterProver(ScanFusedInstance):
    def __init__(self, inputs: R1CSCycleInputs, tau: Sequence[int]):
        self.inputs = inputs
        T = inputs.T
        self.log_T = T.bit_length() - 1
        self._num_rounds = C.LOG_PADDED_CONSTRAINTS + self.log_T
        assert len(tau) == self._num_rounds
        self.AZ, self.BZ, self.CZ = materialize_az_bz_cz(inputs)
        self.E = eq.evals(list(tau))
        self.final_az = self.final_bz = self.final_cz = None
        self.input_openings: Optional[List[int]] = None

    @property
    def num_rounds(self) -> int:
        return self._num_rounds

    def input_claim(self, accumulator: OpeningAccumulator) -> int:
        return 0

    def message_evals_dev(self, round: int):
        return _outer_message_kernel(self.E, self.AZ, self.BZ, self.CZ), None

    def ingest_challenge(self, r: int, round: int) -> None:
        r_dev = ops.pack_ints([r])
        self.E, self.AZ, self.BZ, self.CZ = _bind4(
            self.E, self.AZ, self.BZ, self.CZ, r_dev)

    # ---- fused (device-transcript) protocol -----------------------------

    degree = 3

    def fused_state(self):
        return (self.E, self.AZ, self.BZ, self.CZ)

    def fused_message(self, consts, st, round: int):
        return _outer_message_kernel(*st)

    def fused_bind(self, consts, st, r_mont, round: int):
        return _bind4(*st, r_mont)

    def fused_store(self, finals) -> None:
        self.E, self.AZ, self.BZ, self.CZ = finals

    # ---- scan-fused protocol --------------------------------------------

    def scan_plan(self):
        return [("main", self.num_rounds)]

    def scan_state0(self):
        return tuple(scan.to_pair_order(X)
                     for X in (self.E, self.AZ, self.BZ, self.CZ))

    def scan_message(self, mode, bc, x, st):
        E, AZ, BZ, CZ = st
        e = scan.pair_eval_points(E, 3)
        a = scan.pair_eval_points(AZ, 3)
        b = scan.pair_eval_points(BZ, 3)
        c = scan.pair_eval_points(CZ, 3)
        inner = ops.sub(ops.mont_mul(a, b, FR), c, FR)
        return ops.sum_mod(ops.mont_mul(e, inner, FR), FR)

    def scan_bind(self, mode, bc, x, st, r):
        return tuple(scan.pair_bind(X, r) for X in st)

    def scan_shrink_plan(self, mode, n_rounds):
        return scan.default_shrink_plan(n_rounds, 1 << self.num_rounds)

    def scan_shrink(self, mode, s, bc, st):
        n = 1 << (self.num_rounds - s)
        return tuple(X[..., :n] for X in st)

    def scan_finals(self, st):
        return tuple(X[:, :1] for X in st)

    def finalize(self) -> None:
        self.final_az = ops.unpack_ints(self.AZ)[0]
        self.final_bz = ops.unpack_ints(self.BZ)[0]
        self.final_cz = ops.unpack_ints(self.CZ)[0]

    def cache_openings(self, accumulator: OpeningAccumulator,
                       r_slice: Sequence[int]) -> None:
        """Evaluate all 38 R1CS input MLEs at r_cycle and cache the claims
        (these feed later stages / the PCS opening)."""
        r_cycle = list(r_slice[C.LOG_PADDED_CONSTRAINTS:])
        Ecyc = eq.evals(r_cycle)
        openings = []
        for v in range(NUM_VARS):
            col = ops.pack_ints([x % P for x in self.inputs.col(v)])
            val = ops.unpack_ints(ops.dot(Ecyc, col))[0]
            openings.append(val)
            accumulator.insert(("r1cs_input", VAR_NAMES[v]), r_cycle, val)
        self.input_openings = openings

    def expected_output_claim(self, accumulator, r):  # prover-side unused
        raise NotImplementedError


class SpartanOuterVerifier(SumcheckInstance):
    """Verifier half: recomputes Az/Bz/Cz(r) from the 38 input openings."""

    def __init__(self, num_rounds: int, tau: Sequence[int],
                 input_openings: Sequence[int]):
        self._num_rounds = num_rounds
        self.tau = list(tau)
        self.z = list(input_openings)
        assert len(self.z) == NUM_VARS

    @property
    def num_rounds(self) -> int:
        return self._num_rounds

    def input_claim(self, accumulator: OpeningAccumulator) -> int:
        return 0

    def compute_message(self, round, prev):  # pragma: no cover
        raise NotImplementedError("verifier instance")

    def ingest_challenge(self, r, round):  # pragma: no cover
        raise NotImplementedError("verifier instance")

    def expected_output_claim(self, accumulator: OpeningAccumulator,
                              r: Sequence[int]) -> int:
        r = list(r)
        r_con = r[:C.LOG_PADDED_CONSTRAINTS]
        # chi_k(r_con) for k in [32]: small host loop
        chi = [1] * C.PADDED_CONSTRAINTS
        for bit_idx, rb in enumerate(r_con):
            for k in range(C.PADDED_CONSTRAINTS):
                bit = (k >> (C.LOG_PADDED_CONSTRAINTS - 1 - bit_idx)) & 1
                chi[k] = chi[k] * (rb if bit else (1 - rb)) % P
        rows = C.all_rows()
        az = bz = cz = 0
        for k, (a, b, c) in enumerate(rows):
            az = (az + chi[k] * self._eval_lc(a)) % P
            bz = (bz + chi[k] * self._eval_lc(b)) % P
            cz = (cz + chi[k] * self._eval_lc(c)) % P
        # Note: z[0] (the const column) opens to eq-sum = 1 only over the
        # cycle axis; its MLE at r_cycle is exactly 1, and the prover's
        # opening must match -- checked by the caller against proof data.
        eq_tau_r = eq.eq_int(self.tau, r)
        return eq_tau_r * ((az * bz - cz) % P) % P

    def _eval_lc(self, lc) -> int:
        return sum(coeff * self.z[v] for v, coeff in lc) % P
