"""Booleanity + Hamming-weight sumchecks for one-hot access matrices.

Reference: `zkvm/ram/hamming_booleanity.rs`, `subprotocols/booleanity.rs`,
the HammingWeight claim reductions (stages 6b/7).

For each access matrix M over (cycle, address) -- registers wa/ra1/ra2,
RAM ra, bytecode ra -- two relations together prove every row of M is
EXACTLY one-hot:

  * booleanity:  0 = sum_{k,j} eq(r_b, (j,k)) * (M(j,k)^2 - M(j,k))
                 (entries are bits, checked at a fresh random point)
  * hamming weight: 1 = sum_{k,j} eq(r_h, j) * M(j,k)
                 (each cycle's row sums to one; the x0 / k=0 sink rows in
                 the witness make this hold for every cycle)

All matrices batch into ONE BatchedSumcheck stage (unequal rounds).
"""

from __future__ import annotations

from functools import partial
from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp

from ..field import FR, ops
from ..poly import dense, eq
from ..poly.univariate import UniPoly
from ..sumcheck.engine import OpeningAccumulator, SumcheckInstance

P = FR.modulus


@partial(jax.jit, static_argnames=('fp',))
def _bool_message_kernel(E, M, fp=FR):
    """Evals at {0,2,3} of sum E*(M^2 - M)."""
    e = dense.sumcheck_eval_points_high(E, 3, fp)
    m = dense.sumcheck_eval_points_high(M, 3, fp)
    mm = ops.sub(ops.mont_mul(m, m, fp), m, fp)
    return ops.sum_mod(ops.mont_mul(e, mm, fp), fp)


@partial(jax.jit, static_argnames=('fp',))
def _hamming_message_kernel(E, M, fp=FR):
    """Evals at {0, 2} of sum E*M (degree 2)."""
    e = dense.sumcheck_eval_points_high(E, 2, fp)
    m = dense.sumcheck_eval_points_high(M, 2, fp)
    return ops.sum_mod(ops.mont_mul(e, m, fp), fp)


class Booleanity(SumcheckInstance):
    """0 = sum eq(r_b, .) * (M^2 - M) over the full (j,k) index space."""

    def __init__(self, onehot: List[int], K: int, r_point: Sequence[int],
                 label: str):
        self.K = K
        self.T = len(onehot) // K
        self.nv = (self.T * K).bit_length() - 1
        assert 1 << self.nv == self.T * K
        self.r_point = list(r_point)
        assert len(self.r_point) == self.nv
        self.label = label
        self.M = ops.pack_ints(onehot)
        self.E = eq.evals(self.r_point)
        self.final_openings: Optional[dict] = None

    @property
    def num_rounds(self) -> int:
        return self.nv

    def input_claim(self, accumulator: OpeningAccumulator) -> int:
        return 0

    def compute_message(self, round: int, previous_claim: int) -> UniPoly:
        evals = ops.unpack_ints(_bool_message_kernel(self.E, self.M))
        return UniPoly.from_evals_and_hint(previous_claim, evals, P)

    def ingest_challenge(self, r: int, round: int) -> None:
        r_dev = ops.pack_ints([r])
        self.M = dense.bind_high(self.M, r_dev, FR)
        self.E = dense.bind_high(self.E, r_dev, FR)

    def finalize(self) -> None:
        self.final_openings = {"m": ops.unpack_ints(self.M)[0]}

    def cache_openings(self, accumulator: OpeningAccumulator,
                       r_slice: Sequence[int]) -> None:
        accumulator.insert(("booleanity", self.label), list(r_slice),
                           self.final_openings["m"])

    def expected_output_claim(self, accumulator, r):  # pragma: no cover
        raise NotImplementedError


class BooleanityVerifier(SumcheckInstance):
    def __init__(self, num_vars: int, r_point: Sequence[int], m_opening: int):
        self.nv = num_vars
        self.r_point = list(r_point)
        self.m_opening = m_opening % P

    @property
    def num_rounds(self) -> int:
        return self.nv

    def input_claim(self, accumulator: OpeningAccumulator) -> int:
        return 0

    def compute_message(self, round, prev):  # pragma: no cover
        raise NotImplementedError("verifier instance")

    def ingest_challenge(self, r, round):  # pragma: no cover
        raise NotImplementedError("verifier instance")

    def expected_output_claim(self, accumulator: OpeningAccumulator,
                              r: Sequence[int]) -> int:
        m = self.m_opening
        return eq.eq_int(self.r_point, list(r)) * ((m * m - m) % P) % P


class HammingWeight(SumcheckInstance):
    """1 = sum_{k,j} eq(r_h, j) * M(j,k)  (cycle-major, j = index MSBs)."""

    def __init__(self, onehot: List[int], K: int, r_cycle: Sequence[int],
                 label: str):
        self.K = K
        self.T = len(onehot) // K
        self.log_T = self.T.bit_length() - 1
        self.nv = self.log_T + (K.bit_length() - 1)
        self.r_cycle = list(r_cycle)
        assert len(self.r_cycle) == self.log_T
        self.label = label
        L = FR.num_limbs
        self.M = ops.pack_ints(onehot)
        E = eq.evals(self.r_cycle)
        self.E = jnp.broadcast_to(E[:, :, None],
                                  (L, self.T, K)).reshape(L, -1)
        self.final_openings: Optional[dict] = None

    @property
    def num_rounds(self) -> int:
        return self.nv

    def input_claim(self, accumulator: OpeningAccumulator) -> int:
        return 1

    def compute_message(self, round: int, previous_claim: int) -> UniPoly:
        evals = ops.unpack_ints(_hamming_message_kernel(self.E, self.M))
        return UniPoly.from_evals_and_hint(previous_claim, evals, P)

    def ingest_challenge(self, r: int, round: int) -> None:
        r_dev = ops.pack_ints([r])
        self.M = dense.bind_high(self.M, r_dev, FR)
        self.E = dense.bind_high(self.E, r_dev, FR)

    def finalize(self) -> None:
        self.final_openings = {"m": ops.unpack_ints(self.M)[0]}

    def cache_openings(self, accumulator: OpeningAccumulator,
                       r_slice: Sequence[int]) -> None:
        accumulator.insert(("hamming", self.label), list(r_slice),
                           self.final_openings["m"])

    def expected_output_claim(self, accumulator, r):  # pragma: no cover
        raise NotImplementedError


class HammingWeightVerifier(SumcheckInstance):
    def __init__(self, log_T: int, log_K: int, r_cycle: Sequence[int],
                 m_opening: int):
        self.log_T, self.log_K = log_T, log_K
        self.r_cycle = list(r_cycle)
        self.m_opening = m_opening % P

    @property
    def num_rounds(self) -> int:
        return self.log_T + self.log_K

    def input_claim(self, accumulator: OpeningAccumulator) -> int:
        return 1

    def compute_message(self, round, prev):  # pragma: no cover
        raise NotImplementedError("verifier instance")

    def ingest_challenge(self, r, round):  # pragma: no cover
        raise NotImplementedError("verifier instance")

    def expected_output_claim(self, accumulator: OpeningAccumulator,
                              r: Sequence[int]) -> int:
        r_cyc = list(r[:self.log_T])
        return eq.eq_int(self.r_cycle, r_cyc) * self.m_opening % P
