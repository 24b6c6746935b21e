"""The Jolt verifier (round 1: stages 1-3).

Mirrors `crates/jolt-verifier/src/verifier.rs:176-230` (clear-mode verify):
replay the preamble, then check each stage's sumcheck sequentially,
threading typed stage outputs through the accumulator.

Trust status after round 1: the R1CS input openings are validated against
the constraint matrices (stage 1); the rd/rs1/rs2 openings are further
validated against register-file semantics (stages 2-3, Twist); the
remaining leaf claims (wa/ra/inc openings) await commitments + the batched
opening proof (later rounds).
"""

from __future__ import annotations

from typing import List

from ..field.params import FR
from ..pcs import HyperKZG, KZGSetup
from ..pcs.hyperkzg import _absorb_point
from ..prover.prover import JoltProof
from ..r1cs import constraints as C
from ..relations.booleanity import BooleanityVerifier, HammingWeightVerifier
from ..relations.bytecode import CLAIM_COLUMNS, BytecodeReadRafVerifier
from ..relations.ram import (RamOutputCheckVerifier, RamRafEvaluationVerifier,
                             RamReadWriteCheckingVerifier,
                             RamValEvaluationVerifier)
from ..relations.registers_rw import (RegistersRafVerifier,
                                      RegistersReadWriteCheckingVerifier,
                                      RegistersValEvaluationVerifier)
from ..relations.spartan_outer import SpartanOuterVerifier
from ..sumcheck.engine import BatchedSumcheck, OpeningAccumulator, SumcheckError
from ..tracer.trace import Trace
from ..transcript import Blake2bTranscript
from ..witness.r1cs_inputs import NUM_VARS, VAR_NAMES
from ..witness.r1cs_inputs import (V_RAM_ADDRESS, V_RAM_READ_VALUE,
                                   V_RAM_WRITE_VALUE, V_RD_WRITE_VALUE,
                                   V_RS1_VALUE, V_RS2_VALUE)
from ..witness.ram import input_init_vals

P = FR.modulus


class VerificationError(Exception):
    pass


class PublicIO:
    """The public statement: what the verifier actually gets (no trace)."""

    def __init__(self, trace_length: int, padded_length: int,
                 inputs: bytes, outputs: bytes, panic: bool,
                 memory_layout=None, code: bytes = b"", entry: int = 0):
        from ..riscv.emulator import MemoryLayout
        self.trace_length = trace_length
        self.padded_length = padded_length
        self.inputs = inputs
        self.outputs = outputs
        self.panic = panic
        self.memory_layout = memory_layout or MemoryLayout()
        self.code = code
        self.entry = entry

    @classmethod
    def from_trace(cls, trace: Trace) -> "PublicIO":
        return cls(trace.length, trace.padded_length,
                   bytes(trace.device.inputs), bytes(trace.device.outputs),
                   trace.device.panic, trace.memory_layout,
                   trace.code, trace.entry)


def verify(proof: JoltProof, io: PublicIO, setup: "KZGSetup" = None) -> bool:
    transcript = Blake2bTranscript(b"Jolt")
    transcript.append_u64(b"T", io.trace_length)
    transcript.append_u64(b"padded_T", io.padded_length)
    transcript.append_bytes(b"inputs", io.inputs)
    transcript.append_bytes(b"outputs", io.outputs)
    transcript.append_u64(b"panic", 1 if io.panic else 0)

    pcs = HyperKZG(setup) if setup is not None else None
    if pcs is not None:
        for name in ("wa", "ra1", "ra2", "inc"):
            if name not in proof.commitments:
                raise VerificationError(f"missing commitment {name}")
            _absorb_point(transcript, b"commitment", proof.commitments[name])

    log_T = io.padded_length.bit_length() - 1
    accumulator = OpeningAccumulator()

    # ---- Stage 1: Spartan outer ----------------------------------------
    num_rounds = C.LOG_PADDED_CONSTRAINTS + log_T
    tau = transcript.challenge_vector(num_rounds)

    if len(proof.r1cs_input_openings) != NUM_VARS:
        raise VerificationError("wrong number of R1CS input openings")
    if proof.r1cs_input_openings[0] != 1:
        raise VerificationError("const-column opening must be 1")

    inst1 = SpartanOuterVerifier(num_rounds, tau, proof.r1cs_input_openings)
    try:
        r1 = BatchedSumcheck.verify(proof.stage1_polys, [inst1], accumulator,
                                    transcript)
    except SumcheckError as e:
        raise VerificationError(f"stage1: {e}") from e

    r_cycle = r1[C.LOG_PADDED_CONSTRAINTS:]
    for v in range(NUM_VARS):
        accumulator.insert(("r1cs_input", VAR_NAMES[v]), r_cycle,
                           proof.r1cs_input_openings[v])
    accumulator.flush_to_transcript(transcript)

    # ---- Stage 2: registers read/write checking ------------------------
    gamma = transcript.challenge_scalar()
    claims = [proof.r1cs_input_openings[V_RD_WRITE_VALUE],
              proof.r1cs_input_openings[V_RS1_VALUE],
              proof.r1cs_input_openings[V_RS2_VALUE]]
    inst2 = RegistersReadWriteCheckingVerifier(
        log_T, gamma, r_cycle, claims, proof.stage2_openings)
    try:
        r2 = BatchedSumcheck.verify(proof.stage2_polys, [inst2], accumulator,
                                    transcript)
    except SumcheckError as e:
        raise VerificationError(f"stage2: {e}") from e
    r2_cyc, r2_addr = r2[:log_T], r2[log_T:]
    for name in ("wa", "ra1", "ra2", "val"):
        accumulator.insert(("registers", name), r2,
                           proof.stage2_openings[name])
    accumulator.insert(("registers", "inc"), r2_cyc,
                       proof.stage2_openings["inc"])
    accumulator.flush_to_transcript(transcript)

    # ---- Stage 3: registers Val evaluation -----------------------------
    val_claim = proof.stage2_openings["val"]
    inst3 = RegistersValEvaluationVerifier(
        log_T, r2_addr, r2_cyc, val_claim, proof.stage3_openings)
    try:
        r3 = BatchedSumcheck.verify(proof.stage3_polys, [inst3], accumulator,
                                    transcript)
    except SumcheckError as e:
        raise VerificationError(f"stage3: {e}") from e
    r3_cyc = r3[:log_T]
    accumulator.insert(("registers_val_eval", "wa"), r3,
                       proof.stage3_openings["wa"])
    accumulator.insert(("registers_val_eval", "inc"), r3_cyc,
                       proof.stage3_openings["inc"])
    accumulator.flush_to_transcript(transcript)

    # ---- Stage 4: RAM read/write checking + raf evaluation (batched) ----
    gamma_ram = transcript.challenge_scalar()
    rv_claim = proof.r1cs_input_openings[V_RAM_READ_VALUE]
    wv_claim = proof.r1cs_input_openings[V_RAM_WRITE_VALUE]
    addr_claim = proof.r1cs_input_openings[V_RAM_ADDRESS]
    o4 = proof.stage4_openings
    inst4a = RamReadWriteCheckingVerifier(
        log_T, proof.ram_log_K, gamma_ram, r_cycle, rv_claim, wv_claim,
        {"ra": o4["rw_ra"], "val": o4["rw_val"], "inc": o4["rw_inc"]})
    inst4b = RamRafEvaluationVerifier(
        log_T, proof.ram_log_K, r_cycle, addr_claim,
        io.memory_layout.input_start, {"ra": o4["raf_ra"]})
    try:
        r4 = BatchedSumcheck.verify(proof.stage4_polys, [inst4a, inst4b],
                                    accumulator, transcript)
    except SumcheckError as e:
        raise VerificationError(f"stage4: {e}") from e
    r4_cyc, r4_addr = r4[:log_T], r4[log_T:]
    for name in ("ra", "val"):
        accumulator.insert(("ram", name), r4, o4[f"rw_{name}"])
    accumulator.insert(("ram", "inc"), r4_cyc, o4["rw_inc"])
    accumulator.insert(("ram_raf", "ra"), r4, o4["raf_ra"])
    accumulator.flush_to_transcript(transcript)

    # ---- Stage 5: RAM Val evaluation ------------------------------------
    init_vals = input_init_vals(io.inputs, io.memory_layout)
    o5 = proof.stage5_openings
    inst5 = RamValEvaluationVerifier(
        log_T, proof.ram_log_K, r4_addr, r4_cyc, o4["rw_val"], init_vals,
        {"ra": o5["ra"], "inc": o5["inc"]})
    z_out = transcript.challenge_scalar()
    inst5b = RamOutputCheckVerifier(
        log_T, proof.ram_log_K, z_out, io.outputs, io.memory_layout,
        io.memory_layout.input_start, init_vals,
        {"ra": o5["oc_ra"], "inc": o5["oc_inc"]})
    try:
        r5 = BatchedSumcheck.verify(proof.stage5_polys, [inst5, inst5b],
                                    accumulator, transcript)
    except SumcheckError as e:
        raise VerificationError(f"stage5: {e}") from e
    accumulator.insert(("ram_val_eval", "ra"), r5, o5["ra"])
    accumulator.insert(("ram_val_eval", "inc"), r5[:log_T], o5["inc"])
    accumulator.insert(("ram_output", "ra"), r5, o5["oc_ra"])
    accumulator.insert(("ram_output", "inc"), r5[:log_T], o5["oc_inc"])
    accumulator.flush_to_transcript(transcript)

    # ---- Stage 6: bytecode read-raf (decoded fields vs public program) --
    gamma_bc = transcript.challenge_scalar()
    name_to_idx = {n: i for i, n in enumerate(VAR_NAMES)}
    idx_claims = list(proof.stage6_claims)
    bc_claims = [proof.r1cs_input_openings[name_to_idx[name]]
                 for name, _ in CLAIM_COLUMNS[:-3]] + idx_claims
    o6 = proof.stage6_openings
    inst6 = BytecodeReadRafVerifier(
        log_T, proof.bytecode_log_K, gamma_bc, r_cycle, bc_claims,
        io.code, io.entry, {"ra": o6["ra"]})
    raf_insts = [RegistersRafVerifier(log_T, r_cycle, idx_claims[i],
                                      o6[f"raf_{n}"])
                 for i, n in enumerate(("wa", "ra1", "ra2"))]
    try:
        r6 = BatchedSumcheck.verify(proof.stage6_polys,
                                    [inst6] + raf_insts, accumulator,
                                    transcript)
    except SumcheckError as e:
        raise VerificationError(f"stage6: {e}") from e
    max6 = max(i.num_rounds for i in [inst6] + raf_insts)
    accumulator.insert(("bytecode", "ra"),
                       r6[max6 - inst6.num_rounds:], o6["ra"])
    for i, n in enumerate(("wa", "ra1", "ra2")):
        off = max6 - raf_insts[i].num_rounds
        accumulator.insert(("registers_raf", n), r6[off:], o6[f"raf_{n}"])
    accumulator.flush_to_transcript(transcript)

    # ---- Stage 7: one-hot booleanity + Hamming weight --------------------
    from ..witness.registers import LOG_K as REG_LOG_K
    ram_lk = proof.ram_log_K
    bc_lk = proof.bytecode_log_K
    mat_dims = [("reg_wa", 7), ("reg_ra1", 7), ("reg_ra2", 7),
                ("ram_ra", ram_lk), ("bc_ra", bc_lk)]
    max_nv = log_T + max(lk for _, lk in mat_dims)
    r_b = transcript.challenge_vector(max_nv)
    r_h = transcript.challenge_vector(log_T)
    o7 = proof.stage7_openings
    insts7 = []
    for label, lk in mat_dims:
        nv = log_T + lk
        insts7.append(BooleanityVerifier(nv, r_b[max_nv - nv:],
                                         o7[f"bool_{label}"]))
        insts7.append(HammingWeightVerifier(log_T, lk, r_h, o7[f"ham_{label}"]))
    try:
        r7 = BatchedSumcheck.verify(proof.stage7_polys, insts7, accumulator,
                                    transcript)
    except SumcheckError as e:
        raise VerificationError(f"stage7: {e}") from e
    max7 = max(i.num_rounds for i in insts7)
    idx = 0
    for label, lk in mat_dims:
        for kind7 in ("bool", "ham"):
            inst = insts7[idx]
            off = max7 - inst.num_rounds
            accumulator.insert((("booleanity" if kind7 == "bool" else
                                 "hamming"), label), r7[off:],
                               o7[f"{kind7}_{label}"])
            idx += 1
    accumulator.flush_to_transcript(transcript)

    # ---- Stage 8 (minimal): verify the terminal committed-poly opening --
    if pcs is not None:
        op = proof.opening_proofs.get("inc@ve")
        if op is None:
            raise VerificationError("missing inc@ve opening proof")
        ok = pcs.verify(proof.commitments["inc"], r3_cyc,
                        proof.stage3_openings["inc"], op, transcript)
        if not ok:
            raise VerificationError("inc@ve opening proof invalid")

    return True
