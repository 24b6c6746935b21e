"""Batched sumcheck engine: host driver + device round kernels.

Faithful port of the reference protocol flow
(`crates/jolt-prover-legacy/src/subprotocols/sumcheck.rs:34-185` prove,
`:413` verify), with the TPU split: the transcript and round-poly algebra
stay on the host (tiny, sequential); `compute_message`/`ingest_challenge`
of each instance run as jitted device kernels over the bound MLE tables.

Protocol (prove):
  1. absorb every instance's input claim (label "sumcheck_claim")
  2. draw batching coefficients (128-bit BE challenge scalars)
  3. scale claim_i by 2^(max_rounds - rounds_i)   [front-loaded batching]
  4. per round: active instances emit degree-d univariates; inactive emit
     the constant claim/2; RLC-combine; compress (drop linear coeff);
     absorb ("sumcheck_poly"); draw r_j = challenge_scalar_optimized
     (125-bit); update claims; active instances bind.
  5. finalize; cache openings per instance on the accumulator's id space;
     flush pending opening claims to the transcript ("opening_claim").
"""

from __future__ import annotations

import abc
from typing import Dict, List, Optional, Sequence, Tuple

from ..field import ops
from ..field.params import FR
from ..poly.univariate import UniPoly
from ..transcript import Blake2bTranscript

P = FR.modulus


class SumcheckError(Exception):
    pass


class OpeningAccumulator:
    """Host-side opening-claim DAG edge manager.

    Analog of `ProverOpeningAccumulator` (`poly/opening_proof.rs:226-240`):
    maps OpeningId -> (opening_point, claim); sumchecks insert output claims
    (`cache_openings`), later sumchecks consume them as input claims;
    committed-polynomial claims flow to the stage-8 batched opening.
    """

    def __init__(self):
        self.openings: Dict[object, Tuple[Tuple[int, ...], int]] = {}
        self.pending_claims: List[int] = []

    def insert(self, opening_id, point: Sequence[int], claim: int) -> None:
        self.openings[opening_id] = (tuple(point), claim % P)
        self.pending_claims.append(claim % P)

    def get_claim(self, opening_id) -> int:
        return self.openings[opening_id][1]

    def get_point(self, opening_id) -> Tuple[int, ...]:
        return self.openings[opening_id][0]

    def flush_to_transcript(self, transcript: Blake2bTranscript) -> None:
        # opening_proof.rs:656-661
        for claim in self.pending_claims:
            transcript.append_scalar(b"opening_claim", claim)
        self.pending_claims = []


class SumcheckInstance(abc.ABC):
    """One sumcheck instance (prover side), `SumcheckInstanceProver` analog
    (`subprotocols/sumcheck_prover.rs:10-64`)."""

    @property
    @abc.abstractmethod
    def num_rounds(self) -> int: ...

    def round_offset(self, max_num_rounds: int) -> int:
        # default: active only in the last num_rounds rounds
        return max_num_rounds - self.num_rounds

    @abc.abstractmethod
    def input_claim(self, accumulator: OpeningAccumulator) -> int: ...

    def message_evals_dev(self, round: int):
        """Device path for the round message: return (device_array, post)
        where the array holds the message's Montgomery-limb evaluations and
        `post` (optional) maps the fetched int list to the final evals.
        Returning None selects the host `compute_message` path.

        The engine fetches ALL instances' arrays with ONE blocking
        device_get per round -- per-instance kernel dispatches stay async,
        so a batch of N instances costs one device round-trip instead of N
        (the prover is dispatch-latency-bound on the TPU relay)."""
        return None

    def compute_message(self, round: int, previous_claim: int) -> UniPoly:
        md = self.message_evals_dev(round)
        if md is None:
            raise NotImplementedError(
                f"{type(self).__name__} implements neither compute_message "
                f"nor message_evals_dev")
        arr, post = md
        evals = ops.unpack_ints(arr)
        if post is not None:
            evals = post(evals)
        return UniPoly.from_evals_and_hint(previous_claim, evals, P)

    @abc.abstractmethod
    def ingest_challenge(self, r: int, round: int) -> None: ...

    def finalize(self) -> None:
        pass

    def cache_openings(self, accumulator: OpeningAccumulator,
                       r_slice: Sequence[int]) -> None:
        pass

    # ---- verifier half -------------------------------------------------

    @abc.abstractmethod
    def expected_output_claim(self, accumulator: OpeningAccumulator,
                              r: Sequence[int]) -> int:
        """Verifier: the value the final bound claim must equal, computed
        from opening claims / direct evaluation at the challenge point."""

    def normalize_opening_point(self, r: Sequence[int]) -> Sequence[int]:
        return r


class BatchedSumcheck:
    """`BatchedSumcheck::{prove, verify}`."""

    @staticmethod
    def prove(instances: Sequence[SumcheckInstance],
              accumulator: OpeningAccumulator,
              transcript: Blake2bTranscript,
              ) -> Tuple[List[List[int]], List[int]]:
        max_rounds = max(i.num_rounds for i in instances)

        for inst in instances:
            transcript.append_scalar(b"sumcheck_claim", inst.input_claim(accumulator))
        coeffs = transcript.challenge_vector(len(instances))

        claims = [
            (inst.input_claim(accumulator) << (max_rounds - inst.num_rounds)) % P
            for inst in instances
        ]

        two_inv = pow(2, -1, P)
        r_sumcheck: List[int] = []
        compressed_polys: List[List[int]] = []

        for rnd in range(max_rounds):
            # 1: launch every active instance's message kernel (async),
            # 2: ONE blocking device_get for the whole batch,
            # 3: host fallback / postprocess / RLC.
            polys: List[Optional[UniPoly]] = [None] * len(instances)
            dev_batch: List[Tuple[int, object]] = []
            dev_arrays = []
            for i, (inst, claim) in enumerate(zip(instances, claims)):
                off = inst.round_offset(max_rounds)
                if off <= rnd < off + inst.num_rounds:
                    md = inst.message_evals_dev(rnd - off)
                    if md is not None:
                        dev_batch.append((i, md[1]))
                        dev_arrays.append(md[0])
                    else:
                        polys[i] = inst.compute_message(rnd - off, claim)
                else:
                    polys[i] = UniPoly([claim * two_inv % P])
            if dev_arrays:
                import jax as _jax
                fetched = _jax.device_get(dev_arrays)
                for (i, post), arr in zip(dev_batch, fetched):
                    evals = ops.np_unpack_ints(arr)
                    if post is not None:
                        evals = post(evals)
                    polys[i] = UniPoly.from_evals_and_hint(
                        claims[i], evals, P)

            batched = UniPoly([0])
            for poly, c in zip(polys, coeffs):
                batched = batched.add(poly.scale(c))

            compressed = batched.compress()
            transcript.append_scalars(b"sumcheck_poly", compressed)
            r_j = transcript.challenge_scalar_optimized()
            r_sumcheck.append(r_j)

            claims = [poly.evaluate(r_j) for poly in polys]

            for inst in instances:
                off = inst.round_offset(max_rounds)
                if off <= rnd < off + inst.num_rounds:
                    inst.ingest_challenge(r_j, rnd - off)

            compressed_polys.append(compressed)

        for inst in instances:
            inst.finalize()
        for inst in instances:
            off = inst.round_offset(max_rounds)
            inst.cache_openings(accumulator, r_sumcheck[off:off + inst.num_rounds])
        accumulator.flush_to_transcript(transcript)

        return compressed_polys, r_sumcheck

    @staticmethod
    def verify(compressed_polys: List[List[int]],
               instances: Sequence[SumcheckInstance],
               accumulator: OpeningAccumulator,
               transcript: Blake2bTranscript,
               ) -> List[int]:
        """Replays the transcript, checks every round's claim equation and the
        final output claim of each instance.  Returns the challenge vector."""
        max_rounds = max(i.num_rounds for i in instances)
        if len(compressed_polys) != max_rounds:
            raise SumcheckError("wrong number of round polynomials")
        # degree bound (sumcheck.rs:596-601): a compressed degree-d poly has
        # d coefficients; reject empty or over-degree rounds so proofs are
        # not malleable by padding
        max_degree = max(getattr(i, "degree", 3) for i in instances)
        for rnd, compressed in enumerate(compressed_polys):
            if len(compressed) == 0 or len(compressed) > max_degree:
                raise SumcheckError(
                    f"round {rnd}: degree {len(compressed)} out of bounds "
                    f"(max {max_degree})")

        input_claims = [inst.input_claim(accumulator) for inst in instances]
        for claim in input_claims:
            transcript.append_scalar(b"sumcheck_claim", claim)
        coeffs = transcript.challenge_vector(len(instances))

        # batched running claim (the verifier tracks only the RLC combination)
        claim = sum(
            c * ((ic << (max_rounds - inst.num_rounds)) % P)
            for c, ic, inst in zip(coeffs, input_claims, instances)
        ) % P

        r_sumcheck: List[int] = []
        for rnd in range(max_rounds):
            compressed = compressed_polys[rnd]
            poly = UniPoly.decompress(compressed, claim)  # enforces s(0)+s(1)=claim
            transcript.append_scalars(b"sumcheck_poly", compressed)
            r_j = transcript.challenge_scalar_optimized()
            r_sumcheck.append(r_j)
            claim = poly.evaluate(r_j)

        # final check: sum over instances of coeff * expected_output * dummy
        # scaling. An instance inactive before round `off` contributed
        # claim-halving in dummy rounds; after its activation the claim tracks
        # its own polynomial exactly, so its terminal value is its output
        # claim evaluated at its slice of challenges.
        expected = 0
        for inst, c in zip(instances, coeffs):
            off = inst.round_offset(max_rounds)
            r_slice = r_sumcheck[off:off + inst.num_rounds]
            expected = (expected + c * inst.expected_output_claim(accumulator, r_slice)) % P

        if expected != claim:
            raise SumcheckError(
                f"sumcheck output claim mismatch: expected {expected}, got {claim}")
        return r_sumcheck
