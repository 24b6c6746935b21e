"""The Jolt prover pipeline (round 1: stages 1-3).

Mirrors the stage structure of
`crates/jolt-prover-legacy/src/zkvm/prover.rs:449-607` (prove_parts):
Fiat-Shamir preamble, then the staged sumcheck DAG:

  stage 1: Spartan outer (R1CS)           [reference stage 1]
  stage 2: registers read/write checking  [reference stage 4 instance]
  stage 3: registers Val evaluation       [reference stage 5 instance]

RAM Twist, instruction/bytecode Shout, claim reductions, commitments and
the batched opening proof land in subsequent rounds; the proof container
carries per-stage slots from day one.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional

from ..field.params import FR
from ..pcs import HyperKZG, HyperKZGProof, KZGSetup
from ..pcs.hyperkzg import _absorb_point
from ..r1cs import constraints as C
from ..relations.booleanity import Booleanity, HammingWeight
from ..relations.bytecode import CLAIM_COLUMNS, BytecodeReadRaf
from ..relations.ram import (RamOutputCheck, RamRafEvaluation,
                             RamReadWriteChecking, RamValEvaluation)
from ..relations.registers_rw import (RegistersRaf,
                                      RegistersReadWriteChecking,
                                      RegistersValEvaluation)
from ..relations.spartan_outer import SpartanOuterProver
from ..sumcheck.engine import BatchedSumcheck, OpeningAccumulator
from ..tracer.trace import Trace
from ..transcript import Blake2bTranscript
from ..witness.r1cs_inputs import extract_r1cs_inputs
from ..witness.r1cs_inputs import (V_RAM_ADDRESS, V_RAM_READ_VALUE,
                                   V_RAM_WRITE_VALUE)
from ..witness.bytecode import extract_bytecode_witness
from ..witness.ram import extract_ram_witness
from ..witness.registers import LOG_K, extract_register_witness

P = FR.modulus


@dataclasses.dataclass
class JoltProof:
    """Wire-format proof parts (`JoltProofParts`, zkvm/prover.rs:561-583)."""

    trace_length: int          # unpadded
    padded_length: int
    stage1_polys: List[List[int]]      # compressed round polys
    r1cs_input_openings: List[int]     # 38 openings at r_cycle
    stage2_polys: List[List[int]]      # registers read/write checking
    stage2_openings: Dict[str, int]    # wa/ra1/ra2/val/inc at bound point
    stage3_polys: List[List[int]]      # registers Val evaluation
    stage3_openings: Dict[str, int]    # wa/inc at new bound point
    stage4_polys: List[List[int]]      # RAM rw-checking + raf (batched)
    stage4_openings: Dict[str, int]    # ra/val/inc (rw) + ra (raf)
    stage5_polys: List[List[int]]      # RAM Val evaluation
    stage5_openings: Dict[str, int]    # ra/inc at new bound point
    ram_log_K: int
    stage6_polys: List[List[int]]      # bytecode read-raf + register rafs
    stage6_openings: Dict[str, int]    # bytecode ra + register one-hot opens
    stage6_claims: List[int]           # virtual rd/rs1/rs2 index claims
    bytecode_log_K: int
    stage7_polys: List[List[int]]      # booleanity + hamming (all one-hots)
    stage7_openings: Dict[str, int]    # per-matrix bound openings
    commitments: Dict[str, object]     # committed register polys (G1 points)
    opening_proofs: Dict[str, object]  # (name, stage) -> HyperKZGProof


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


def prove(trace: Trace, setup: "KZGSetup" = None) -> JoltProof:
    """Prove the trace.  `setup` enables the commitment layer; without it the
    proof carries bare opening claims (sumcheck-only mode for tests)."""
    import os as _os
    import time as _time
    _t0 = [_time.time()]
    _dbg = _os.environ.get("JOLT_TPU_STAGE_TIMING")

    def _mark(label):
        if _dbg:
            now = _time.time()
            print(f"[prove] {label}: {now - _t0[0]:.1f}s", flush=True)
            _t0[0] = now

    transcript = Blake2bTranscript(b"Jolt")
    fiat_shamir_preamble(transcript, trace)

    inputs = extract_r1cs_inputs(trace)
    accumulator = OpeningAccumulator()
    log_T = trace.log_T

    # ---- Stage 0: commit the register witness polynomials ---------------
    # (zkvm/prover.rs:689-800 generate_and_commit_witness_polynomials --
    # commitments absorb BEFORE any challenge so they bind the witness.)
    reg_wit = extract_register_witness(trace)
    commitments: Dict[str, object] = {}
    pcs = HyperKZG(setup) if setup is not None else None
    committed_cols = {}
    if pcs is not None:
        # pay-per-bit commits (msm/mod.rs:16-80): one-hot access matrices
        # are binary (1 subset-sum).  Increments are SIGNED (negative deltas
        # wrap mod p), so until the signed small-scalar MSM lands they take
        # the full-width path (cheap: length T).
        committed_cols = {"wa": (reg_wit.wa, 1), "ra1": (reg_wit.ra1, 1),
                          "ra2": (reg_wit.ra2, 1), "inc": (reg_wit.inc, 254)}
        for name, (coeffs, bits) in committed_cols.items():
            commitments[name] = pcs.commit_ints(coeffs, bits=bits)
            _absorb_point(transcript, b"commitment", commitments[name])

    _mark("stage0-commit")
    # ---- Stage 1: Spartan outer ----------------------------------------
    num_rounds = C.LOG_PADDED_CONSTRAINTS + log_T
    tau = transcript.challenge_vector(num_rounds)
    outer = SpartanOuterProver(inputs, tau)
    stage1_polys, _ = BatchedSumcheck.prove([outer], accumulator, transcript)

    _mark("stage1-spartan")
    # ---- Stage 2: registers read/write checking ------------------------
    # r_cycle and the rd/rs1/rs2 claims are the stage-1 openings.
    r_cycle = list(accumulator.get_point(("r1cs_input", "rs1_value")))
    claims = [accumulator.get_claim(("r1cs_input", "rd_write_value")),
              accumulator.get_claim(("r1cs_input", "rs1_value")),
              accumulator.get_claim(("r1cs_input", "rs2_value"))]
    gamma = transcript.challenge_scalar()
    rw = RegistersReadWriteChecking(reg_wit, gamma, r_cycle, claims)
    stage2_polys, r2 = BatchedSumcheck.prove([rw], accumulator, transcript)

    _mark("stage2-reg-rw")
    # ---- Stage 3: registers Val evaluation -----------------------------
    r2_cyc, r2_addr = r2[:log_T], r2[log_T:]
    val_claim = accumulator.get_claim(("registers", "val"))
    ve = RegistersValEvaluation(reg_wit, r2_addr, r2_cyc, val_claim)
    stage3_polys, r3 = BatchedSumcheck.prove([ve], accumulator, transcript)
    r3_cyc = r3[:log_T]

    _mark("stage3-reg-val")
    # ---- Stage 4: RAM read/write checking + raf evaluation (batched) ----
    ram_wit = extract_ram_witness(trace)
    gamma_ram = transcript.challenge_scalar()
    rv_claim = accumulator.get_claim(("r1cs_input", "ram_read_value"))
    wv_claim = accumulator.get_claim(("r1cs_input", "ram_write_value"))
    addr_claim = accumulator.get_claim(("r1cs_input", "ram_address"))
    ram_rw = RamReadWriteChecking(ram_wit, gamma_ram, r_cycle, rv_claim, wv_claim)
    ram_raf = RamRafEvaluation(ram_wit, r_cycle, addr_claim)
    stage4_polys, r4 = BatchedSumcheck.prove([ram_rw, ram_raf], accumulator,
                                             transcript)
    r4_cyc, r4_addr = r4[:log_T], r4[log_T:]

    # ---- Stage 5: RAM Val evaluation + output check (batched) ------------
    ram_val_claim = accumulator.get_claim(("ram", "val"))
    ram_ve = RamValEvaluation(ram_wit, r4_addr, r4_cyc, ram_val_claim)
    z_out = transcript.challenge_scalar()
    ram_oc = RamOutputCheck(ram_wit, trace.memory_layout, z_out,
                            bytes(trace.device.outputs))
    stage5_polys, _ = BatchedSumcheck.prove([ram_ve, ram_oc], accumulator,
                                            transcript)

    _mark("stage4-5-ram")
    # ---- Stage 6: bytecode read-raf + register index rafs (batched) ------
    # The rd/rs1/rs2 index streams are proven from BOTH sides against the
    # same virtual claims: bytecode side (public decoded columns) and
    # register side (the one-hot access matrices), closing the
    # "wa points at the instruction's rd" gap.
    from ..poly import eq as eq_mod
    from ..field import ops as fops
    bc_wit = extract_bytecode_witness(trace, trace.code, trace.entry)
    gamma_bc = transcript.challenge_scalar()
    E_cyc_dev = eq_mod.evals(r_cycle)
    rd_col = trace.col("rd").tolist()
    kinds = trace.col("kind").tolist()
    rd_eff = [0 if r == 255 else r for r in rd_col]
    rs1_eff = [0 if k == 0 else s for k, s in zip(kinds, trace.col("rs1").tolist())]
    rs2_eff = [0 if k == 0 else s for k, s in zip(kinds, trace.col("rs2").tolist())]
    idx_claims = [
        fops.unpack_ints(fops.dot(E_cyc_dev, fops.pack_ints(col)))[0]
        for col in (rd_eff, rs1_eff, rs2_eff)]
    bc_claims = [accumulator.get_claim(("r1cs_input", name))
                 for name, _ in CLAIM_COLUMNS[:-3]] + idx_claims
    bc = BytecodeReadRaf(bc_wit, gamma_bc, r_cycle, bc_claims)
    raf_rd = RegistersRaf(reg_wit.wa, None, r_cycle, idx_claims[0], "wa")
    raf_rs1 = RegistersRaf(reg_wit.ra1, None, r_cycle, idx_claims[1], "ra1")
    raf_rs2 = RegistersRaf(reg_wit.ra2, None, r_cycle, idx_claims[2], "ra2")
    stage6_polys, _ = BatchedSumcheck.prove(
        [bc, raf_rd, raf_rs1, raf_rs2], accumulator, transcript)

    _mark("stage6-bytecode")
    # ---- Stage 7: one-hot booleanity + Hamming weight (all matrices) -----
    matrices = [("reg_wa", reg_wit.wa, 128), ("reg_ra1", reg_wit.ra1, 128),
                ("reg_ra2", reg_wit.ra2, 128),
                ("ram_ra", ram_wit.ra, ram_wit.K),
                ("bc_ra", bc_wit.ra, bc_wit.K)]
    max_nv = max(len(m).bit_length() - 1 for _, m, _ in matrices)
    r_b = transcript.challenge_vector(max_nv)
    r_h = transcript.challenge_vector(log_T)
    insts7 = []
    for label, onehot, Km in matrices:
        nv = len(onehot).bit_length() - 1
        insts7.append(Booleanity(onehot, Km, r_b[max_nv - nv:], label))
        insts7.append(HammingWeight(onehot, Km, r_h, label))
    stage7_polys, _ = BatchedSumcheck.prove(insts7, accumulator, transcript)
    stage7_openings = {}
    for inst in insts7:
        kind7 = "bool" if isinstance(inst, Booleanity) else "ham"
        stage7_openings[f"{kind7}_{inst.label}"] = inst.final_openings["m"]

    # ---- Stage 8 (minimal): prove the terminal committed-poly openings --
    # The reference batches all committed claims into ONE Dory opening
    # (zkvm/prover.rs:2097-2260); round-1 opens each claim individually.
    opening_proofs: Dict[str, object] = {}
    if pcs is not None:
        # TODO(batched opening): reduce ALL terminal claims to one opening
        # via the joint-opening sumcheck (prove_packed_openings) -- round-1
        # proves the cheapest leaf (inc at the val-evaluation point); the
        # other claims are carried in the proof and verified structurally.
        terminal = [
            ("inc@ve", reg_wit.inc, r3_cyc, ve.final_openings["inc"]),
        ]
        for name, coeffs, point, claim in terminal:
            opening_proofs[name] = pcs.open(coeffs, point, claim, transcript)

    _mark("stage8-openings")
    return JoltProof(
        trace_length=trace.length,
        padded_length=trace.padded_length,
        stage1_polys=stage1_polys,
        r1cs_input_openings=list(outer.input_openings),
        stage2_polys=stage2_polys,
        stage2_openings=dict(rw.final_openings),
        stage3_polys=stage3_polys,
        stage3_openings=dict(ve.final_openings),
        stage4_polys=stage4_polys,
        stage4_openings={**{f"rw_{k}": v for k, v in ram_rw.final_openings.items()},
                         **{f"raf_{k}": v for k, v in ram_raf.final_openings.items()}},
        stage5_polys=stage5_polys,
        stage5_openings={**dict(ram_ve.final_openings),
                         **{f"oc_{k}": v
                            for k, v in ram_oc.final_openings.items()}},
        ram_log_K=ram_wit.log_K,
        stage6_polys=stage6_polys,
        stage6_openings={"ra": bc.final_openings["ra"],
                         "raf_wa": raf_rd.final_openings["m"],
                         "raf_ra1": raf_rs1.final_openings["m"],
                         "raf_ra2": raf_rs2.final_openings["m"]},
        stage6_claims=list(idx_claims),
        bytecode_log_K=bc_wit.log_K,
        stage7_polys=stage7_polys,
        stage7_openings=stage7_openings,
        commitments=commitments,
        opening_proofs=opening_proofs,
    )
