"""The Jolt verifier (round 1: stage 1 -- Spartan outer).

Mirrors `crates/jolt-verifier/src/verifier.rs:176-230` (clear-mode verify):
replay the preamble, then check each stage's sumcheck, threading opening
claims through the accumulator.  The R1CS input openings are validated
against the constraint matrices inside the Spartan verifier; proving the
openings themselves (PCS + later-stage sumchecks) lands with stages 2-8.
"""

from __future__ import annotations

from typing import List

from ..field.params import FR
from ..prover.prover import JoltProof, fiat_shamir_preamble
from ..r1cs import constraints as C
from ..relations.spartan_outer import SpartanOuterVerifier
from ..sumcheck.engine import BatchedSumcheck, OpeningAccumulator, SumcheckError
from ..tracer.trace import Trace
from ..transcript import Blake2bTranscript
from ..witness.r1cs_inputs import NUM_VARS, VAR_NAMES

P = FR.modulus


class VerificationError(Exception):
    pass


class PublicIO:
    """The public statement: what the verifier actually gets (no trace)."""

    def __init__(self, trace_length: int, padded_length: int,
                 inputs: bytes, outputs: bytes, panic: bool):
        self.trace_length = trace_length
        self.padded_length = padded_length
        self.inputs = inputs
        self.outputs = outputs
        self.panic = panic

    @classmethod
    def from_trace(cls, trace: Trace) -> "PublicIO":
        return cls(trace.length, trace.padded_length,
                   bytes(trace.device.inputs), bytes(trace.device.outputs),
                   trace.device.panic)


def verify(proof: JoltProof, io: PublicIO) -> bool:
    transcript = Blake2bTranscript(b"Jolt")
    transcript.append_u64(b"T", io.trace_length)
    transcript.append_u64(b"padded_T", io.padded_length)
    transcript.append_bytes(b"inputs", io.inputs)
    transcript.append_bytes(b"outputs", io.outputs)
    transcript.append_u64(b"panic", 1 if io.panic else 0)

    log_T = io.padded_length.bit_length() - 1
    num_rounds = C.LOG_PADDED_CONSTRAINTS + log_T
    tau = transcript.challenge_vector(num_rounds)

    if len(proof.r1cs_input_openings) != NUM_VARS:
        raise VerificationError("wrong number of R1CS input openings")
    # The constant column's MLE is identically 1.
    if proof.r1cs_input_openings[0] != 1:
        raise VerificationError("const-column opening must be 1")

    inst = SpartanOuterVerifier(num_rounds, tau, proof.r1cs_input_openings)
    accumulator = OpeningAccumulator()
    try:
        r = BatchedSumcheck.verify(proof.stage1_polys, [inst], accumulator, transcript)
    except SumcheckError as e:
        raise VerificationError(str(e)) from e

    # Replay the prover's opening-claim absorbs to keep transcripts in sync
    # for subsequent stages (prover side: cache_openings + flush).
    r_cycle = r[C.LOG_PADDED_CONSTRAINTS:]
    for v in range(NUM_VARS):
        accumulator.insert(("r1cs_input", VAR_NAMES[v]), r_cycle,
                           proof.r1cs_input_openings[v])
    accumulator.flush_to_transcript(transcript)
    return True
