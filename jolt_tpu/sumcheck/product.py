"""Generic product sumcheck instance: claim = sum_x prod_k P_k(x).

The reference's `mles_product_sum.rs` analog and the engine's test vehicle;
also the building block for eq-weighted relations (pass the eq table as one
of the factors).  Binding order: HighToLow.
"""

from __future__ import annotations

from functools import partial
from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp

from ..field import FR, FieldParams, ops
from ..poly import dense
from ..poly.univariate import UniPoly
from .engine import OpeningAccumulator, SumcheckInstance

P = FR.modulus


@partial(jax.jit, static_argnames=('degree', 'fp'))
def _product_message_kernel(polys, degree: int, fp: FieldParams = FR):
    """Round-message evals at X in {0, 2, .., degree} for a product of MLEs.

    polys: tuple of (L, T) limb arrays (T even).  Returns (L, degree, 1):
    evals[:, j] = sum_i prod_k P_k,X_j[i].
    """
    acc = None
    for Pk in polys:
        e = dense.sumcheck_eval_points_high(Pk, degree, fp)  # (L, deg, T/2)
        acc = e if acc is None else ops.mont_mul(acc, e, fp)
    return ops.sum_mod(acc, fp)


@partial(jax.jit, static_argnames=('fp',))
def _product_claim_kernel(polys, fp: FieldParams = FR):
    acc = None
    for Pk in polys:
        acc = Pk if acc is None else ops.mont_mul(acc, Pk, fp)
    return ops.sum_mod(acc, fp)


class ProductSumcheck(SumcheckInstance):
    """Prover instance for sum_x prod_k P_k(x) over the full hypercube."""

    def __init__(self, polys: List[jnp.ndarray], fp: FieldParams = FR):
        T = polys[0].shape[-1]
        assert all(p.shape[-1] == T for p in polys)
        self.fp = fp
        self.polys = list(polys)
        self._num_rounds = T.bit_length() - 1
        assert 1 << self._num_rounds == T
        self._input_claim: Optional[int] = None
        self.final_claims: Optional[List[int]] = None

    # -- prover ----------------------------------------------------------

    @property
    def num_rounds(self) -> int:
        return self._num_rounds

    @property
    def degree(self) -> int:
        return len(self.polys)

    def input_claim(self, accumulator: OpeningAccumulator) -> int:
        if self._input_claim is None:
            out = _product_claim_kernel(tuple(self.polys), self.fp)
            self._input_claim = ops.unpack_ints(out, self.fp)[0]
        return self._input_claim

    def compute_message(self, round: int, previous_claim: int) -> UniPoly:
        evals_dev = _product_message_kernel(tuple(self.polys), self.degree, self.fp)
        evals = ops.unpack_ints(evals_dev, self.fp)
        return UniPoly.from_evals_and_hint(previous_claim, evals, P)

    def ingest_challenge(self, r: int, round: int) -> None:
        r_dev = ops.pack_ints([r], self.fp)
        self.polys = [dense.bind_high(Pk, r_dev, self.fp) for Pk in self.polys]

    def finalize(self) -> None:
        self.final_claims = [ops.unpack_ints(Pk, self.fp)[0] for Pk in self.polys]

    def cache_openings(self, accumulator: OpeningAccumulator,
                       r_slice: Sequence[int]) -> None:
        if self.final_claims is None:
            self.finalize()
        for k, claim in enumerate(self.final_claims):
            accumulator.insert(("product_poly", id(self), k), r_slice, claim)

    # -- verifier --------------------------------------------------------

    def expected_output_claim(self, accumulator: OpeningAccumulator,
                              r: Sequence[int]) -> int:
        acc = 1
        for claim in self.final_claims:
            acc = acc * claim % P
        return acc


class VerifierProductSumcheck(SumcheckInstance):
    """Verifier-side twin: consumes per-factor opening claims from the proof."""

    def __init__(self, num_rounds: int, input_claim: int, factor_claims: List[int]):
        self._num_rounds = num_rounds
        self._input_claim = input_claim
        self.factor_claims = factor_claims

    @property
    def num_rounds(self) -> int:
        return self._num_rounds

    def input_claim(self, accumulator: OpeningAccumulator) -> int:
        return self._input_claim

    def compute_message(self, round, previous_claim):  # pragma: no cover
        raise NotImplementedError("verifier instance")

    def ingest_challenge(self, r, round):  # pragma: no cover
        raise NotImplementedError("verifier instance")

    def expected_output_claim(self, accumulator: OpeningAccumulator,
                              r: Sequence[int]) -> int:
        acc = 1
        for claim in self.factor_claims:
            acc = acc * claim % P
        return acc
