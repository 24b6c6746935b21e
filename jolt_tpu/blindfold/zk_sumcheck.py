"""ZK sumcheck: rounds commit their coefficients instead of revealing them.

Phase 1 of BlindFold (`book/src/how/blindfold.md`, `crates/jolt-blindfold`
prove.rs): the prover runs the standard batched sumcheck, but each round's
compressed coefficient vector (c_0, c_2, .., c_d) goes into the Fiat-Shamir
transcript as a Pedersen COMMITMENT; the verifier derives identical
challenges from the commitments but never sees a coefficient.  All round
checks (sum consistency, Horner chaining, final output binding) are
deferred to the BlindFold verifier R1CS (r1cs.py).

The recorded `ZkStageData` holds everything the later phases need:
coefficients + blindings (witness), commitments (public), challenges and
batching coefficients (public, baked into the R1CS), and the claim chain.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import List, Optional, Sequence, Tuple

from ..field.params import FR
from ..sumcheck.engine import OpeningAccumulator, SumcheckInstance
from ..poly.univariate import UniPoly
from ..transcript import Blake2bTranscript
from .pedersen import PedersenBasis, pedersen_commit, point_bytes

P = FR.modulus


@dataclass
class ZkStageData:
    """Everything BlindFold needs from one ZK sumcheck stage."""

    label: str
    max_rounds: int
    max_degree: int
    input_claim0: int                 # batched scaled input claim (public)
    round_coeffs: List[List[int]]     # per round: compressed (c0,c2..cd)
    blinds: List[int]                 # per round Pedersen blinding (witness)
    commitments: List[object]         # per round G1 point (public)
    challenges: List[int]             # r_j (public, derived from comms)
    claims: List[int]                 # claim_0 .. claim_R (witness chain)
    final_expected: Optional[int] = None  # bound at chain end (public v1)


def zk_prove_stage(instances: Sequence[SumcheckInstance],
                   accumulator: OpeningAccumulator,
                   transcript: Blake2bTranscript,
                   basis: PedersenBasis,
                   rng, label: str) -> Tuple[ZkStageData, List[int]]:
    """BatchedSumcheck.prove with committed round messages.

    Differences from the plain engine: the transcript absorbs
    point_bytes(commitment) under "zk_sumcheck_comm" instead of the
    coefficients; coefficients/blindings accumulate in ZkStageData."""
    max_rounds = max(i.num_rounds for i in instances)
    for inst in instances:
        transcript.append_scalar(b"sumcheck_claim",
                                 inst.input_claim(accumulator))
    coeffs = transcript.challenge_vector(len(instances))
    claims = [
        (inst.input_claim(accumulator) << (max_rounds - inst.num_rounds)) % P
        for inst in instances
    ]
    claim0 = sum(c * cl for c, cl in zip(coeffs, claims)) % P
    max_degree = max(getattr(i, "degree", 3) for i in instances)
    basis.extend(max_degree)

    two_inv = pow(2, -1, P)
    data = ZkStageData(label=label, max_rounds=max_rounds,
                       max_degree=max_degree, input_claim0=claim0,
                       round_coeffs=[], blinds=[], commitments=[],
                       challenges=[], claims=[claim0])
    r_sumcheck: List[int] = []

    for rnd in range(max_rounds):
        # device message path first (the production instances' per-round
        # kernels, mirroring BatchedSumcheck.prove); compute_message is
        # the host fallback
        polys: List[Optional[UniPoly]] = [None] * len(instances)
        dev_batch = []
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

            from ..field import ops as _ops
            fetched = _jax.device_get(dev_arrays)
            for (i, post), arr in zip(dev_batch, fetched):
                evals = _ops.np_unpack_ints(arr)
                if post is not None:
                    evals = post(evals)
                polys[i] = UniPoly.from_evals_and_hint(claims[i], evals, P)
        batched = UniPoly([0])
        for poly, c in zip(polys, coeffs):
            batched = batched.add(poly.scale(c))
        compressed = batched.compress()
        padded = list(compressed) + [0] * (max_degree - len(compressed))

        rho = rng.randrange(P)
        comm = pedersen_commit(basis, padded, rho)
        transcript.append_bytes(b"zk_sumcheck_comm", point_bytes(comm))
        r_j = transcript.challenge_scalar_optimized()
        r_sumcheck.append(r_j)

        claims = [poly.evaluate(r_j) for poly in polys]
        for inst in instances:
            off = inst.round_offset(max_rounds)
            if off <= rnd < off + inst.num_rounds:
                inst.ingest_challenge(r_j, rnd - off)

        data.round_coeffs.append(padded)
        data.blinds.append(rho)
        data.commitments.append(comm)
        data.challenges.append(r_j)
        data.claims.append(sum(c * cl for c, cl in
                               zip(coeffs, claims)) % P)

    for inst in instances:
        inst.finalize()
    for inst in instances:
        off = inst.round_offset(max_rounds)
        inst.cache_openings(accumulator,
                            r_sumcheck[off:off + inst.num_rounds])
    accumulator.flush_to_transcript(transcript)

    return data, r_sumcheck


def zk_replay_challenges(commit_bytes: Sequence[bytes],
                         input_claims: Sequence[int],
                         n_inst: int,
                         transcript: Blake2bTranscript) -> Tuple[List[int], List[int]]:
    """Verifier side of phase 1: replay the transcript over the round
    COMMITMENTS, returning (batching coeffs, challenges)."""
    for claim in input_claims:
        transcript.append_scalar(b"sumcheck_claim", claim)
    coeffs = transcript.challenge_vector(n_inst)
    rs = []
    for cb in commit_bytes:
        transcript.append_bytes(b"zk_sumcheck_comm", cb)
        rs.append(transcript.challenge_scalar_optimized())
    return coeffs, rs
