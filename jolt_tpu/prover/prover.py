"""The Jolt prover pipeline (round 1: stage 1 -- Spartan outer).

Mirrors the stage structure of
`crates/jolt-prover-legacy/src/zkvm/prover.rs:449-607` (prove_parts):
Fiat-Shamir preamble, then the staged sumcheck DAG.  Stages 2-8 (memory
checking, lookups, bytecode, opening proof) land in subsequent rounds; the
proof container carries per-stage slots from day one.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional

from ..field.params import FR
from ..r1cs import constraints as C
from ..relations.spartan_outer import SpartanOuterProver
from ..sumcheck.engine import BatchedSumcheck, OpeningAccumulator
from ..tracer.trace import Trace
from ..transcript import Blake2bTranscript
from ..witness.r1cs_inputs import extract_r1cs_inputs

P = FR.modulus


@dataclasses.dataclass
class JoltProof:
    """Wire-format proof parts (`JoltProofParts`, zkvm/prover.rs:561-583)."""

    trace_length: int          # unpadded
    padded_length: int
    stage1_polys: List[List[int]]      # compressed round polys
    r1cs_input_openings: List[int]     # 38 openings at r_cycle
    # later stages: stage2..7 sumchecks, commitments, joint opening proof


def fiat_shamir_preamble(transcript: Blake2bTranscript, trace: Trace) -> None:
    """Simplified preamble binding the public statement
    (`zkvm/mod.rs:257` fiat_shamir_preamble: io device, T, ram_K, entry).

    TODO(parity): byte-match the reference's exact absorb sequence.
    """
    transcript.append_u64(b"T", trace.length)
    transcript.append_u64(b"padded_T", trace.padded_length)
    transcript.append_bytes(b"inputs", bytes(trace.device.inputs))
    transcript.append_bytes(b"outputs", bytes(trace.device.outputs))
    transcript.append_u64(b"panic", 1 if trace.device.panic else 0)


def prove(trace: Trace) -> JoltProof:
    transcript = Blake2bTranscript(b"Jolt")
    fiat_shamir_preamble(transcript, trace)

    inputs = extract_r1cs_inputs(trace)
    accumulator = OpeningAccumulator()

    # Stage 1: Spartan outer
    num_rounds = C.LOG_PADDED_CONSTRAINTS + trace.log_T
    tau = transcript.challenge_vector(num_rounds)
    outer = SpartanOuterProver(inputs, tau)
    stage1_polys, _r = BatchedSumcheck.prove([outer], accumulator, transcript)

    return JoltProof(
        trace_length=trace.length,
        padded_length=trace.padded_length,
        stage1_polys=stage1_polys,
        r1cs_input_openings=list(outer.input_openings),
    )
