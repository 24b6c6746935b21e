"""The Jolt prover pipeline: the full staged sumcheck DAG.

Mirrors the stage structure of
`crates/jolt-prover-legacy/src/zkvm/prover.rs:449-607` (prove_parts):
Fiat-Shamir preamble, then:

  0   Dory/HyperKZG witness commitments (sparse one-hot tier-1 + tier-2)
  1   Spartan outer (R1CS, uni-skip first round)
  1s  Spartan shift sumcheck (PC chaining via EqPlusOne)
  2   registers read/write checking       (Twist)
  3   registers Val evaluation            (Twist prefix-sum via LT)
  4   RAM read/write checking + raf       (Twist, batched)
  5   RAM Val evaluation + output check   (+ advice / committed-image Init)
  5i  instruction-execution read-raf Shout over 2^128
  6   bytecode read-raf + register rafs + lookup-flag columns (batched)
  6v  RAM/bytecode ra-virtualization to committed 8-bit chunk selectors
  7   one-hot booleanity + Hamming weight (+ program-image reduction)
  8   joint opening-reduction sumcheck -> ONE RLC PCS opening

zk=True swaps every standard stage through the BlindFold committed-round
recorder (blindfold/).  See STAGES.md for the reference-instance mapping.
"""

from __future__ import annotations

import dataclasses
import hashlib
from typing import Dict, List, Optional

from ..field.params import FR
from ..lookups import tables as LT
from ..pcs import KZGSetup
from ..pcs.scheme import make_scheme
from ..r1cs import constraints as C
from ..relations.booleanity import Booleanity, HammingWeight
from ..relations.bytecode import CLAIM_COLUMNS
from ..relations.grouped_onehot import GroupedOneHot
from ..relations.instruction_read_raf import InstructionReadRaf
from ..relations.opening_reduction import (DenseOpening, SparseOneHotOpening,
                                           cycle_major_to_address_major_point,
                                           embedding_factor)
from ..relations.ra_virtual import (RaVirtual, block_point,
                                    block_widths, chunk_streams, d_chunks)
from ..relations.ram_sparse import (RamPairSchedule, SparseOneHotTableEval,
                                    SparseRamOutputCheck,
                                    SparseRamRafEvaluation,
                                    SparseRamReadWriteChecking,
                                    SparseRamValEvaluation,
                                    SparseRegistersReadWriteChecking,
                                    SparseRegistersValEvaluation,
                                    combined_table_dev, index_table)
from ..relations.spartan_outer import (SpartanOuterProver, num_stage1_rounds,
                                       prove_uniskip)
from ..sumcheck.engine import BatchedSumcheck, OpeningAccumulator
from ..sumcheck.scan import prove_scan
from ..tracer.trace import Trace
from ..transcript import Blake2bTranscript
from ..witness.bytecode import extract_bytecode_witness
from ..witness.instruction_lookups import (D as LK_D,
                                           extract_instruction_lookup_witness)
from ..witness.r1cs_inputs import extract_r1cs_inputs
from ..witness.ram import extract_ram_log
from ..witness.registers import LOG_K, extract_register_log

P = FR.modulus

LOOKUP_FLAG_COLUMNS = ([(f"flag_{n}", f"lk_{n}") for n in LT.TABLE_NAMES]
                       + [("raf", "lk_raf")])


@dataclasses.dataclass
class JoltProof:
    """Wire-format proof parts (`JoltProofParts`, zkvm/prover.rs:561-583)."""

    trace_length: int          # unpadded
    padded_length: int
    stage1_uniskip: List[int]          # uni-skip first-round poly (31 coeffs)
    stage1_polys: List[List[int]]      # compressed round polys
    r1cs_input_openings: List[int]     # 38 openings at r_cycle
    shift_polys: List[List[int]]       # PC-chaining shift sumcheck
    shift_opening: int                 # combined current-row cols at rho
    stage2_polys: List[List[int]]      # registers read/write checking
    stage2_openings: Dict[str, int]    # wa/ra1/ra2/val/inc at bound point
    stage3_polys: List[List[int]]      # registers Val evaluation
    stage3_openings: Dict[str, int]    # wa/inc at new bound point
    stage4_polys: List[List[int]]      # RAM rw-checking + raf (batched)
    stage4_openings: Dict[str, int]    # ra/val/inc (rw) + ra (raf)
    stage5_polys: List[List[int]]      # RAM Val evaluation + output check
    stage5_openings: Dict[str, int]
    ram_log_K: int
    stage5i_polys: List[List[int]]     # instruction read-raf Shout
    stage5i_openings: Dict[str, int]   # ra0..ra15, flag_<table>, raf_flag
    stage6_polys: List[List[int]]      # bytecode read-raf + register rafs
    stage6_openings: Dict[str, int]    # bytecode ra + register one-hot opens
    stage6_claims: List[int]           # virtual rd/rs1/rs2 index claims
    bytecode_log_K: int
    stage6v_polys: List[List[int]]     # ram/bytecode ra virtualization
    stage6v_openings: Dict[str, int]   # per-(source, chunk) openings
    stage7_polys: List[List[int]]      # booleanity + hamming (all one-hots)
    stage7_openings: Dict[str, int]    # per-matrix bound openings
    stage8_polys: List[List[int]]      # joint opening-reduction sumcheck
    stage8_openings: List[int]         # per-entry P_i(r*) terminal values
    commitments: Dict[str, object]     # committed polys (G1 points)
    opening_proofs: Dict[str, object]  # "joint" -> DoryProof|HyperKZGProof
    advice_openings: Dict[str, int] = None   # trusted/untrusted Init openings
    # zk mode (BlindFold): per-stage Pedersen round commitments replace the
    # stageN_polys coefficient lists, plus one BlindFoldProof
    zk_commitments: Dict[str, List[bytes]] = None
    zk_blindfold: object = None
    # prover-chosen protocol configuration, re-validated by the verifier
    # (config.ProofConfig wire dict; ref zkvm/config.rs:95-210)
    config: Dict[str, int] = None
    # committed-bytecode mode: the program image's contribution to
    # Val_init(r4_addr) (claim_reductions/program_image.rs)
    program_image_claim: int = None


def committed_poly_names(d_ram: int = 1, d_bc: int = 1,
                         advice_kinds=(), committed_image: bool = False):
    """Canonical commitment absorb order, shared by prover and verifier
    (one-hot access matrices then dense increment columns).  RAM and
    bytecode access matrices are committed as d 8-bit chunk selectors
    (reference RamRa(i)/BytecodeRa(i), `zkvm/witness.rs:24-74`) so no
    committed one-hot exceeds 256 rows.  `advice_kinds` (derived from the
    public MemoryLayout advice sizes) appends the trusted/untrusted advice
    polynomials (`zkvm/prover.rs:806-860`)."""
    return (["wa", "ra1", "ra2"]
            + [f"ram_ra{i}" for i in range(d_ram)]
            + [f"bc_ra{i}" for i in range(d_bc)]
            + [f"lk_ra{i}" for i in range(LK_D)]
            + ["inc", "ram_inc"]
            + [f"{k}_advice" for k in advice_kinds]
            + (["program_image"] if committed_image else []))


# full-ra virtual claims consumed by the ra-virtualization stage, in order
RAM_RA_SOURCES = [("ram", "ra"), ("ram_raf", "ra"),
                  ("ram_val_eval", "ra"), ("ram_output", "ra")]
BC_RA_SOURCES = [("bytecode", "ra"), ("bytecode_flags", "ra"),
                 ("bytecode_shift", "ra")]


def advice_kinds_of(layout) -> tuple:
    """('trusted'?, 'untrusted'?) in canonical order, from the PUBLIC
    memory layout (both sides derive the same commitment/entry lists)."""
    return tuple(k for k in ("trusted", "untrusted")
                 if layout.advice_region(k)[1] > 0)


def stage8_entry_ids(d_ram: int = 1, d_bc: int = 1, advice_kinds=(),
                     committed_image: bool = False):
    """Ordered (accumulator_id, commitment_name) pairs covering EVERY
    committed-polynomial opening produced by stages 1-7.  Shared by prover
    and verifier so the joint reduction is built identically on both sides;
    entries deduplicate on (commitment, point) with claim-equality checks."""
    ids = [
        (("registers", "wa"), "wa"), (("registers", "ra1"), "ra1"),
        (("registers", "ra2"), "ra2"), (("registers", "inc"), "inc"),
        (("registers_val_eval", "wa"), "wa"),
        (("registers_val_eval", "inc"), "inc"),
        (("ram", "inc"), "ram_inc"),
        (("ram_val_eval", "inc"), "ram_inc"),
        (("ram_output", "inc"), "ram_inc"),
        (("registers_raf", "wa"), "wa"), (("registers_raf", "ra1"), "ra1"),
        (("registers_raf", "ra2"), "ra2"),
    ]
    # ra-virtualization outputs: chunk openings per full-ra source claim
    for t in range(len(RAM_RA_SOURCES)):
        for i in range(d_ram):
            ids.append(((f"ram_ra_virt", (t, i)), f"ram_ra{i}"))
    for t in range(len(BC_RA_SOURCES)):
        for i in range(d_bc):
            ids.append(((f"bc_ra_virt", (t, i)), f"bc_ra{i}"))
    for i in range(LK_D):
        ids.append((("instr_ra", i), f"lk_ra{i}"))
    onehot_labels = (["reg_wa", "reg_ra1", "reg_ra2"]
                     + [f"ram_ra{i}" for i in range(d_ram)]
                     + [f"bc_ra{i}" for i in range(d_bc)]
                     + [f"lk_ra{i}" for i in range(LK_D)])
    cnames = (["wa", "ra1", "ra2"]
              + [f"ram_ra{i}" for i in range(d_ram)]
              + [f"bc_ra{i}" for i in range(d_bc)]
              + [f"lk_ra{i}" for i in range(LK_D)])
    for label, cname in zip(onehot_labels, cnames):
        ids.append(((("booleanity"), label), cname))
        ids.append(((("hamming"), label), cname))
    for kind in advice_kinds:
        ids.append((("advice", kind), f"{kind}_advice"))
    if committed_image:
        ids.append((("program_image", "init"), "program_image"))
    return ids


def preprocessing_digest(code: bytes, entry: int, start: int, memory_layout,
                         bytecode_log_K: int, padded_length: int) -> bytes:
    """32-byte digest of the preprocessing artifact, the analog of the
    reference's `preprocessing.digest()` absorbed first in the preamble.

    Covers everything the verifier derives from the program image rather
    than the per-run statement: the code bytes, entry/start addresses, the
    full memory-layout geometry, the (derived) bytecode table size, and the
    padded trace length (our padding rule admits a per-run `min_padded`, so
    it is bound here; the reference's padding is a fixed function of T).
    Both sides compute this from public data -- the verifier never trusts a
    prover-supplied digest."""
    h = hashlib.blake2b(digest_size=32)
    for tag, val in (
        (b"code", code),
        (b"entry", entry), (b"start", start),
        (b"max_input", memory_layout.max_input_size),
        (b"max_output", memory_layout.max_output_size),
        (b"stack", memory_layout.stack_size),
        (b"heap", memory_layout.heap_size),
        (b"max_trusted_advice", memory_layout.max_trusted_advice_size),
        (b"max_untrusted_advice", memory_layout.max_untrusted_advice_size),
        (b"bytecode_log_K", bytecode_log_K),
        (b"padded_T", padded_length),
    ):
        h.update(tag)
        h.update(val if isinstance(val, bytes) else int(val).to_bytes(8, "big"))
    return h.digest()


# proof-carried, verifier-validated protocol configuration lives in
# config.py (ReadWriteConfig / OneHotConfig ladder, zkvm/config.rs:95-210);
# the constants are re-exported here for the witness/relation layers
from ..config import (DORY_LAYOUT, LOG_K_CHUNK, REGISTERS_LOG_K,  # noqa: F401
                      ProofConfig)


def fiat_shamir_preamble(transcript: Blake2bTranscript, trace_length: int,
                         padded_length: int, inputs: bytes, outputs: bytes,
                         panic: bool, code: bytes, entry: int, start: int,
                         memory_layout, ram_log_K: int,
                         bytecode_log_K: int,
                         config: "ProofConfig" = None) -> None:
    """Preamble binding the full public statement.

    Byte-parity absorb sequence with the reference's `fiat_shamir_preamble`
    (`zkvm/mod.rs:257-301`): identical labels, types, and order.  Values
    that the reference sources from its preprocessing/config structs map to
    our analogs (documented inline); the opaque `preprocessing_digest`
    contents differ (see `preprocessing_digest`) -- aligning those is a
    one-function job once Rust fixtures are available."""
    transcript.append_bytes(
        b"preprocessing_digest",
        preprocessing_digest(code, entry, start, memory_layout,
                             bytecode_log_K, padded_length))
    transcript.append_u64(b"max_input_size", memory_layout.max_input_size)
    transcript.append_u64(b"max_output_size", memory_layout.max_output_size)
    transcript.append_u64(b"heap_size", memory_layout.heap_size)
    transcript.append_bytes(b"inputs", inputs)
    transcript.append_bytes(b"outputs", outputs)
    transcript.append_u64(b"panic", 1 if panic else 0)
    transcript.append_u64(b"ram_K", 1 << ram_log_K)
    transcript.append_u64(b"trace_length", trace_length)
    transcript.append_u64(b"entry_address", entry)
    log_T = padded_length.bit_length() - 1
    if config is None:
        config = ProofConfig.new(log_T, ram_log_K)
    rw, oh = config.read_write, config.one_hot
    transcript.append_u64(b"ram_rw_phase1_num_rounds",
                          rw.ram_rw_phase1_num_rounds)
    transcript.append_u64(b"ram_rw_phase2_num_rounds",
                          rw.ram_rw_phase2_num_rounds)
    transcript.append_u64(b"registers_rw_phase1_num_rounds",
                          rw.registers_rw_phase1_num_rounds)
    transcript.append_u64(b"registers_rw_phase2_num_rounds",
                          rw.registers_rw_phase2_num_rounds)
    transcript.append_u64(b"log_k_chunk", oh.log_k_chunk)
    transcript.append_u64(b"lookups_ra_virtual_log_k_chunk",
                          oh.lookups_ra_virtual_log_k_chunk)
    transcript.append_u64(b"dory_layout", config.dory_layout)
    transcript.append_u64(b"committed_program_image",
                          config.committed_program_image)


def required_num_vars(padded_length: int, ram_log_K: int,
                      bytecode_log_K: int) -> int:
    """log2 of the largest committed-polynomial length: the PCS setup size
    shared by prover and verifier (derivable from public proof fields).

    With ra chunking (relations/ra_virtual.py) no committed one-hot exceeds
    2^LOG_K_CHUNK = 256 rows, so the bound is 256 * T regardless of the
    RAM / bytecode address-space sizes."""
    del ram_log_K, bytecode_log_K
    return LOG_K_CHUNK + (padded_length - 1).bit_length()


def _resolve_setup(setup, padded_length, ram_log_K, bytecode_log_K):
    """Accept 'dory' / 'hyperkzg' strings and size the setup from the trace
    (the CLI path); raw setup objects pass through."""
    if setup == "dory":
        from ..pcs.dory import DorySetup
        return DorySetup.generate(
            required_num_vars(padded_length, ram_log_K, bytecode_log_K))
    if setup == "hyperkzg":
        nv = required_num_vars(padded_length, ram_log_K, bytecode_log_K)
        return KZGSetup.generate(1 << nv)
    return setup


def prove(trace: Trace, setup=None, _transcript=None, zk: bool = False,
          zk_rng=None, committed_image: bool = False) -> JoltProof:
    """Prove the trace.  `setup` enables the commitment layer (a `DorySetup`
    -- production, transparent -- or `KZGSetup`/scheme instance, or the
    strings 'dory'/'hyperkzg' to size + build one from the trace; see
    pcs/scheme.py); without it the proof carries bare opening claims
    (sumcheck-only mode for tests).

    zk=True routes every batched sumcheck stage through the BlindFold
    committed-round recorder (`blindfold/zk_sumcheck.py`): round
    polynomials are Pedersen-committed instead of sent in clear, and one
    BlindFold proof (Nova fold + Spartan over the verifier R1CS) attests
    every round check (ref `zkvm/prover.rs:1564-1610`).  v1 scope: all
    standard stage round polys are hidden; the stage-1 uni-skip first
    round and the opening CLAIMS remain clear (full witness-hiding of
    openings via the hiding PCS tier is tracked follow-up work).
    `zk_rng` (default SystemRandom) supplies the blinding randomness."""
    import os as _os
    import time as _time

    from ..utils.profiling import active as _prof_active
    _prof = _prof_active()
    _t0 = [_time.time()]
    _dbg = _os.environ.get("JOLT_TPU_STAGE_TIMING")
    # Fiat-Shamir fixture tape: per-stage transcript checkpoints
    # (state digest + round counter) for diffing against a Rust run
    _fs_trace = _os.environ.get("JOLT_TPU_FS_TRACE")
    _fs_tape: List[dict] = []
    _span = [None]

    def _mark(label):
        now = _time.time()
        if _fs_trace:
            entry = {"stage": label}
            try:
                entry["n_rounds"] = transcript.n_rounds
                entry["state"] = transcript.state.hex()
            except NameError:   # before the transcript exists
                pass
            _fs_tape.append(entry)
        if _dbg:
            from ..utils.profiling import _device_mem_bytes as _dmb
            _hbm = _dmb()
            _hs = f" hbm={_hbm / 2**30:.2f}G" if _hbm else ""
            print(f"[prove] {label}: {now - _t0[0]:.1f}s{_hs}", flush=True)
        if _prof.enabled:
            # retroactive span per stage (prove is a linear pipeline)
            from ..utils.profiling import Span, _device_mem_bytes
            s = Span(label, _t0[0], now - _t0[0])
            s.hbm_exit = _device_mem_bytes()
            (_span[0].children if _span[0] else _prof.roots).append(s)
        _t0[0] = now

    # ---- witness extraction (host) --------------------------------------
    import numpy as _np

    def _ZU64(n):
        return _np.zeros(n, dtype=_np.uint64)

    T_pad = trace.padded_length
    inputs = extract_r1cs_inputs(trace)
    reg_wit = extract_register_log(trace)
    ram_wit = extract_ram_log(trace)
    bc_wit = extract_bytecode_witness(trace)
    lk_wit = extract_instruction_lookup_witness(trace, inputs)
    log_T = trace.log_T
    # per-cycle one-hot index streams (x0-sink discipline for registers);
    # RAM/bytecode matrices commit as d 8-bit chunk selectors (ra_virtual)
    rd_eff, rs1_eff, rs2_eff = reg_wit.rd_eff, reg_wit.rs1_eff, reg_wit.rs2_eff
    ram_chunks = chunk_streams(ram_wit.cols, ram_wit.log_K)
    bc_chunks = chunk_streams(_np.asarray(bc_wit.pc_idx), bc_wit.log_K)
    d_ram, d_bc = len(ram_chunks), len(bc_chunks)
    onehot_meta = {"wa": (rd_eff, 128), "ra1": (rs1_eff, 128),
                   "ra2": (rs2_eff, 128)}
    for i, w in enumerate(block_widths(ram_wit.log_K)):
        onehot_meta[f"ram_ra{i}"] = (ram_chunks[i], 1 << w)
    for i, w in enumerate(block_widths(bc_wit.log_K)):
        onehot_meta[f"bc_ra{i}"] = (bc_chunks[i], 1 << w)
    for i in range(LK_D):
        onehot_meta[f"lk_ra{i}"] = (lk_wit.chunks[i], 256)
    dense_meta = {"inc": reg_wit.inc, "ram_inc": ram_wit.inc}
    # advice polynomials (zkvm/prover.rs:806-860): dense dword vectors over
    # the full advice regions, committed alongside the witness and reduced
    # through the stage-8 joint opening via zero-padding embedding
    from ..witness.ram import advice_poly_coeffs, advice_subcube
    layout = trace.memory_layout
    advice_kinds = advice_kinds_of(layout)
    advice_coeffs: Dict[str, List[int]] = {}
    for kind in advice_kinds:
        data = bytes(getattr(trace.device, f"{kind}_advice", b""))
        advice_coeffs[kind] = advice_poly_coeffs(layout, kind, data)
        dense_meta[f"{kind}_advice"] = advice_coeffs[kind]
    # committed-bytecode mode: commit the program-image words polynomial
    # (claim_reductions/program_image.rs; verifier recomputes+caches the
    # trusted commitment from the public program)
    pi_words = pi_start = None
    if committed_image:
        from ..relations.program_image import image_words
        from ..witness.ram import remap_address
        pi_words = image_words(trace.code)
        pi_start = remap_address(trace.entry, ram_wit.witness_base)
        dense_meta["program_image"] = pi_words
        # split-verification semantics: the verifier evaluates an
        # inputs-only Init and ADDS the image claim, while the witness
        # OVERWRITES on overlap -- so the image range must be disjoint
        # from the input and advice witness regions or honest proofs fail
        pi_end = pi_start + len(pi_words)
        regions = [("inputs", remap_address(layout.input_start,
                                            ram_wit.witness_base),
                    (layout.max_input_size + 7) // 8)]
        for kind in advice_kinds:
            a_start, a_size = layout.advice_region(kind)
            regions.append((f"{kind} advice",
                            remap_address(a_start, ram_wit.witness_base),
                            (a_size + 7) // 8))
        for rname, r0, nwords in regions:
            assert pi_end <= r0 or r0 + nwords <= pi_start, \
                f"committed image overlaps the {rname} region"
    _mark("witness-extraction")

    # ZK committed-round seam: _stage() routes every batched sumcheck
    # through zk_prove_stage when zk=True, recording ZkStageData
    zk_stages: List[object] = []
    zk_commit_bytes: Dict[str, List[bytes]] = {}
    if zk:
        import random as _random

        from ..blindfold.pedersen import PedersenBasis
        from ..blindfold.pedersen import point_bytes as _pt_bytes
        from ..blindfold.zk_sumcheck import zk_prove_stage
        zk_basis = PedersenBasis.create(8)
        zk_rng = zk_rng or _random.SystemRandom()

    def _drop(*objs):
        """Release a finished stage's device arrays (final openings are
        host ints by now).  Without this every stage's bound tables stay
        live until prove() returns and peak HBM is the SUM of all stages
        -- the 2^18 sha2-chain bench exhausts a 16 GB chip at stage 7."""
        import jax as _jax
        for obj in objs:
            if obj is None:
                continue
            for k, v in list(vars(obj).items()):
                if k in ("final_openings", "input_openings"):
                    continue
                if isinstance(v, _jax.Array):
                    setattr(obj, k, None)
                elif (isinstance(v, (list, tuple)) and v
                      and all(isinstance(x, _jax.Array) for x in v)):
                    setattr(obj, k, None)

    def _stage(insts, label):
        if not zk:
            return prove_scan(insts, accumulator, transcript)
        data, rs = zk_prove_stage(insts, accumulator, transcript,
                                  zk_basis, zk_rng, label)
        data.final_expected = data.claims[-1]
        zk_stages.append(data)
        zk_commit_bytes[label] = [_pt_bytes(c) for c in data.commitments]
        return [], rs

    from ..kernels import get_backend
    _bk = get_backend()
    transcript = _transcript or Blake2bTranscript(b"Jolt")
    proof_config = ProofConfig.new(log_T, ram_wit.log_K,
                                   committed_image=committed_image)
    fiat_shamir_preamble(
        transcript, trace.length, trace.padded_length,
        bytes(trace.device.inputs), bytes(trace.device.outputs),
        trace.device.panic, trace.code, trace.entry, trace.program.start,
        trace.memory_layout, ram_wit.log_K, bc_wit.log_K,
        config=proof_config)

    accumulator = OpeningAccumulator()

    # ---- Stage 0: commit the witness polynomials ------------------------
    # (zkvm/prover.rs:689-800 generate_and_commit_witness_polynomials --
    # commitments absorb BEFORE any challenge so they bind the witness.)
    commitments: Dict[str, object] = {}
    pcs = make_scheme(_resolve_setup(setup, T_pad, ram_wit.log_K,
                                     bc_wit.log_K))
    # sparse committed-poly descriptors: (positions int64, values|None=ones,
    # padded length) -- no dense K*T vector is ever materialized
    committed_sparse: Dict[str, tuple] = {}
    if pcs is not None:
        # pay-per-bit commits (msm/mod.rs:16-80): one-hot access matrices
        # are binary, committed ADDRESS-MAJOR (position = k*T + j) so the
        # joint reduction's address phase stays sparse; tier-1 runs as
        # device point segment-sums (commit_onehot).  Increments are SIGNED
        # (negative deltas wrap mod p), so until the signed small-scalar MSM
        # lands they take the full-width path (cheap: length T).
        arange_T = _np.arange(T_pad, dtype=_np.int64)
        for name, (indices, Km) in onehot_meta.items():
            idx = _np.asarray(indices, _np.int64)
            committed_sparse[name] = (idx * T_pad + arange_T, None,
                                      Km * T_pad)
        for name, coeffs in dense_meta.items():
            vals = [int(v) % P for v in coeffs]
            committed_sparse[name] = (
                _np.arange(len(vals), dtype=_np.int64), vals, len(vals))
        names = committed_poly_names(d_ram, d_bc, advice_kinds,
                                     committed_image)
        onehot_names = [n for n in names if committed_sparse[n][1] is None]
        if hasattr(pcs, "commit_sparse_many"):
            commitments.update(pcs.commit_sparse_many(
                [(n, committed_sparse[n][0]) for n in onehot_names]))
        else:
            for n in onehot_names:
                commitments[n] = pcs.commit_sparse(
                    n, committed_sparse[n][0], committed_sparse[n][2])
        for name in names:
            if name not in commitments:
                commitments[name] = pcs.commit(
                    name, committed_sparse[name][1], bits=254)
            pcs.absorb(transcript, commitments[name])

    _mark("stage0-commit")
    # ---- Stage 1: Spartan outer (uni-skip + remaining sumcheck) ---------
    # tau = [tau_high (Lagrange kernel), tau_g (group bit), *tau_cyc]
    tau = transcript.challenge_vector(1 + num_stage1_rounds(log_T))
    cols_dev, s1_coeffs, r0_skip, claim1, l_scale = prove_uniskip(
        inputs, tau, transcript)
    outer = _bk.make("spartan_outer", inputs, tau[1:], r0_skip, claim1,
                     l_scale, cols_dev)
    # fused device-transcript stage (one dispatch for all rounds); falls
    # back to the host engine under a device mesh
    stage1_polys, _ = _stage([outer], "s1")

    outer.cols_dev = None
    _drop(outer)
    del cols_dev
    _mark("stage1-spartan")
    # ---- Stage 1s: Spartan shift (PC chaining) --------------------------
    # Binds the five next_* openings to the actual next row via the
    # clamped-shift weight; output claim reduces to a public bytecode
    # lookup in stage 6 (relations/shift.py; ref zkvm/spartan/shift.rs).
    from ..relations.shift import ShiftSumcheck, shift_column_values
    r_cycle = list(accumulator.get_point(("r1cs_input", "rs1_value")))
    gamma_sh = transcript.challenge_scalar()
    shift_cols = shift_column_values(bc_wit.table, bc_wit.pc_idx, gamma_sh)
    shift_inst = _bk.make("spartan_shift", shift_cols, r_cycle, gamma_sh)
    shift_polys, _ = _stage([shift_inst], "s1s")

    _drop(shift_inst)
    _mark("stage1s-shift")
    # ---- Stage 2: registers read/write checking ------------------------
    # r_cycle and the rd/rs1/rs2 claims are the stage-1 openings.
    claims = [accumulator.get_claim(("r1cs_input", "rd_write_value")),
              accumulator.get_claim(("r1cs_input", "rs1_value")),
              accumulator.get_claim(("r1cs_input", "rs2_value"))]
    gamma = transcript.challenge_scalar()
    rw = _bk.make("registers_read_write", reg_wit, gamma, r_cycle, claims)
    stage2_polys, r2 = _stage([rw], "s2")

    _drop(rw)
    _mark("stage2-reg-rw")
    # ---- Stage 3: registers Val evaluation -----------------------------
    val_pt2 = accumulator.get_point(("registers", "val"))
    r2_cyc, r2_addr = list(val_pt2[:log_T]), list(val_pt2[log_T:])
    val_claim = accumulator.get_claim(("registers", "val"))
    ve = _bk.make("registers_val_evaluation", reg_wit, r2_addr, r2_cyc,
                  val_claim)
    stage3_polys, r3 = _stage([ve], "s3")
    r3_cyc = list(accumulator.get_point(("registers_val_eval", "inc")))

    _drop(ve)
    _mark("stage3-reg-val")
    # ---- Stage 4: RAM read/write checking + raf evaluation (batched) ----
    # Sparse Twist tier: O(T + K) memory (relations/ram_sparse.py), no
    # dense K x T arrays.
    gamma_ram = transcript.challenge_scalar()
    rv_claim = accumulator.get_claim(("r1cs_input", "ram_read_value"))
    wv_claim = accumulator.get_claim(("r1cs_input", "ram_write_value"))
    addr_claim = accumulator.get_claim(("r1cs_input", "ram_address"))
    ram_sched = RamPairSchedule(ram_wit.cols, ram_wit.pre, ram_wit.post,
                                ram_wit.K)
    ram_rw = _bk.make("ram_read_write",
        ram_sched, ram_wit.log_K, ram_wit.init_vals, ram_wit.inc, gamma_ram,
        r_cycle, rv_claim, wv_claim)
    ram_raf = _bk.make("ram_raf_evaluation", ram_sched, ram_wit.log_K,
                                     ram_wit.witness_base, r_cycle,
                                     addr_claim)
    stage4_polys, r4 = _stage([ram_rw, ram_raf], "s4")

    # ---- Stage 5: RAM Val evaluation + output check (batched) ------------
    val_pt = accumulator.get_point(("ram", "val"))  # normalized (cyc, addr)
    r4_cyc, r4_addr = list(val_pt[:log_T]), list(val_pt[log_T:])
    ram_val_claim = accumulator.get_claim(("ram", "val"))
    # advice openings: each advice region is a size-aligned subcube of the
    # address space, so its contribution to Init(r4_addr) factors as
    # selector(high vars) * AdviceMLE(low vars); the MLE opening joins the
    # stage-8 joint reduction (ref compute_advice_init_contributions)
    advice_openings: Dict[str, int] = {}
    if advice_kinds:
        from ..blindfold.hyrax import mle_eval_host
        for kind in advice_kinds:
            a_vars, _pfx = advice_subcube(layout, kind, ram_wit.log_K)
            r_low = r4_addr[len(r4_addr) - a_vars:]
            v = mle_eval_host(advice_coeffs[kind], r_low)
            advice_openings[kind] = v
            accumulator.insert(("advice", kind), tuple(r_low), v)
    # committed-bytecode mode: the program image's Init(r4_addr)
    # contribution as a scalar claim, bound to the committed image
    # polynomial by the stage-7 reduction sumcheck
    image_claim = None
    if committed_image:
        from ..relations.program_image import shifted_eq_table
        _pi_table = shifted_eq_table(r4_addr, pi_start,
                                     (len(pi_words) - 1).bit_length()
                                     if len(pi_words) > 1 else 0)
        image_claim = sum(t * w for t, w in zip(_pi_table, pi_words)) % P
        accumulator.insert(("program_image", "claim"), tuple(r4_addr),
                           image_claim)
    ram_ve = _bk.make("ram_val_check", ram_sched, ram_wit.log_K,
                                    ram_wit.init_vals, ram_wit.inc,
                                    r4_addr, r4_cyc, ram_val_claim)
    z_out = transcript.challenge_scalar()
    ram_oc = _bk.make("ram_output_check", ram_sched, ram_wit.log_K,
                                  ram_wit.init_vals, ram_wit.inc,
                                  trace.memory_layout, ram_wit.witness_base,
                                  z_out, bytes(trace.device.outputs))
    stage5_polys, _ = _stage([ram_ve, ram_oc], "s5")

    _drop(ram_rw, ram_raf, ram_ve, ram_oc, ram_sched)
    _mark("stage4-5-ram")
    # ---- Stage 5i: instruction-execution read-raf Shout ------------------
    # Binds LookupOutput / lookup operands to the table MLEs over the
    # 2^128 interleaved-operand index space (the heart of Jolt).
    gamma_lk = transcript.challenge_scalar()
    lk = _bk.make("instruction_read_raf",
        lk_wit, gamma_lk, r_cycle,
        accumulator.get_claim(("r1cs_input", "lookup_output")),
        accumulator.get_claim(("r1cs_input", "left_lookup_operand")),
        accumulator.get_claim(("r1cs_input", "right_lookup_operand")))
    stage5i_polys, r5i = _stage([lk], "s5i")
    r_lk_cyc = r5i[LT.LOG_K:]
    stage5i_openings = {f"ra{i}": lk.final_openings[f"ra{i}"]
                        for i in range(LK_D)}
    for t, tname in enumerate(LT.TABLE_NAMES):
        stage5i_openings[f"flag_{tname}"] = lk.flag_claims[t]
    stage5i_openings["raf_flag"] = lk.raf_flag_claim

    _drop(lk)
    _mark("stage5i-instr-lookups")
    # ---- Stage 6: bytecode read-raf + register index rafs (batched) ------
    # The rd/rs1/rs2 index streams are proven from BOTH sides against the
    # same virtual claims: bytecode side (public decoded columns) and
    # register side (the one-hot access matrices), closing the
    # "wa points at the instruction's rd" gap.  A second bytecode instance
    # proves the lookup-table / raf flag claims produced by stage 5i.
    from ..poly import eq as eq_mod
    from ..field import ops as fops
    gamma_bc = transcript.challenge_scalar()
    E_cyc_dev = eq_mod.evals(r_cycle)
    idx_claims = [
        fops.unpack_ints(fops.dot(E_cyc_dev, fops.pack_ints(col)))[0]
        for col in (rd_eff, rs1_eff, rs2_eff)]
    bc_claims = [accumulator.get_claim(("r1cs_input", name))
                 for name, _ in CLAIM_COLUMNS[:-3]] + idx_claims
    def _combine(claims):
        acc, g = 0, 1
        for c in claims:
            acc = (acc + g * c) % P
            g = g * gamma_bc % P
        return acc

    bc_sched = RamPairSchedule(bc_wit.pc_idx, _ZU64(T_pad), _ZU64(T_pad),
                               bc_wit.K)
    bc = SparseOneHotTableEval(
        bc_sched, bc_wit.log_K,
        combined_table_dev(bc_wit.table, bc_wit.entry, bc_wit.K, gamma_bc),
        r_cycle, _combine(bc_claims), ("bytecode", "ra"))
    flag_claims = [accumulator.get_claim(("instr_flag", n))
                   for n in LT.TABLE_NAMES]
    flag_claims.append(accumulator.get_claim(("instr_flag", "raf")))
    bc_flags = SparseOneHotTableEval(
        bc_sched, bc_wit.log_K,
        combined_table_dev(bc_wit.table, bc_wit.entry, bc_wit.K, gamma_bc,
                           columns=LOOKUP_FLAG_COLUMNS),
        r_lk_cyc, _combine(flag_claims), ("bytecode_flags", "ra"))
    # shift-output claim: the gamma_sh-combined current-row columns at the
    # shift sumcheck's bound point reduce to the same public table
    from ..relations.shift import SHIFT_COLUMNS
    r_shift = list(accumulator.get_point(("shift", "cols")))
    bc_shift = SparseOneHotTableEval(
        bc_sched, bc_wit.log_K,
        combined_table_dev(bc_wit.table, bc_wit.entry, bc_wit.K, gamma_sh,
                           columns=SHIFT_COLUMNS),
        r_shift, accumulator.get_claim(("shift", "cols")),
        ("bytecode_shift", "ra"))
    reg_idx_tab = index_table(128)
    raf_insts = []
    for idx_stream, claim, name in ((rd_eff, idx_claims[0], "wa"),
                                    (rs1_eff, idx_claims[1], "ra1"),
                                    (rs2_eff, idx_claims[2], "ra2")):
        sched_p = RamPairSchedule(idx_stream, _ZU64(T_pad), _ZU64(T_pad), 128)
        raf_insts.append(SparseOneHotTableEval(
            sched_p, 7, reg_idx_tab, r_cycle, claim,
            ("registers_raf", name), opening_key="m"))
    raf_rd, raf_rs1, raf_rs2 = raf_insts
    stage6_polys, _ = _stage(
        [bc, bc_flags, bc_shift, raf_rd, raf_rs1, raf_rs2], "s6")

    _drop(bc, bc_flags, bc_shift, raf_rd, raf_rs1, raf_rs2, bc_sched)
    del E_cyc_dev
    _mark("stage6-bytecode")
    # ---- Stage 6v: RAM/bytecode ra virtualization -------------------------
    # Every full-ra opening accumulated by stages 4-6 reduces to openings of
    # the d committed 8-bit chunk selectors (relations/ra_virtual.py;
    # reference RamRaVirtual / bytecode chunking, stage 6b).  Spaces that
    # already fit one chunk (log_K <= 8) re-index the claim directly: the
    # 256-row committed MLE at the zero-padded point IS the full-ra MLE.
    insts6v = []
    for prefix, chunks, log_Kv, sources in (
            ("ram_ra", ram_chunks, ram_wit.log_K, RAM_RA_SOURCES),
            ("bc_ra", bc_chunks, bc_wit.log_K, BC_RA_SOURCES)):
        for t, oid in enumerate(sources):
            pt, cl = accumulator.openings[oid]
            r_cyc_v, r_addr_v = list(pt[:log_T]), list(pt[log_T:])
            if len(chunks) == 1:
                accumulator.insert((f"{prefix}_virt", (t, 0)),
                                   r_cyc_v + r_addr_v, cl)
            else:
                insts6v.append(RaVirtual(chunks, log_Kv, r_cyc_v, r_addr_v,
                                         cl, (prefix, t)))
    stage6v_polys: List[List[int]] = []
    stage6v_openings: Dict[str, int] = {}
    if insts6v:
        stage6v_polys, _ = _stage(insts6v, "s6v")
        for inst in insts6v:
            prefix, t = inst.tag
            for i, v in enumerate(inst.final_openings):
                stage6v_openings[f"{prefix}_{t}_{i}"] = v

    _drop(*insts6v)
    _mark("stage6v-ra-virtual")
    # ---- Stage 7: one-hot booleanity + Hamming weight (all matrices) -----
    # Sparse index-stream formulation: O(T) per matrix per round.
    matrices = [("reg_wa", rd_eff, 128), ("reg_ra1", rs1_eff, 128),
                ("reg_ra2", rs2_eff, 128)]
    for i, w in enumerate(block_widths(ram_wit.log_K)):
        matrices.append((f"ram_ra{i}", ram_chunks[i].tolist(), 1 << w))
    for i, w in enumerate(block_widths(bc_wit.log_K)):
        matrices.append((f"bc_ra{i}", bc_chunks[i].tolist(), 1 << w))
    for i in range(LK_D):
        matrices.append((f"lk_ra{i}", lk_wit.chunks[i].tolist(), 256))
    max_log_K = max(K.bit_length() - 1 for _, _, K in matrices)
    r_b = transcript.challenge_vector(max_log_K + log_T)
    r_h = transcript.challenge_vector(log_T)
    gamma7 = transcript.challenge_scalar()
    # group same-K matrices into ONE gamma-RLC instance per (kind, K):
    # 21 matrices -> <=8 instances (relations/grouped_onehot.py)
    groups7: Dict[int, list] = {}
    for label, indices, Km in matrices:
        groups7.setdefault(Km, []).append((label, indices))
    E_bcyc = eq_mod.evals(r_b[max_log_K:])
    E_h = eq_mod.evals(r_h)
    insts7 = []
    for Km, members in groups7.items():
        lk_m = Km.bit_length() - 1
        r_addr = r_b[max_log_K - lk_m:max_log_K]
        labels7 = [lab for lab, _ in members]
        streams7 = [idxs for _, idxs in members]
        m7 = len(members)
        insts7.append(_bk.make(
            "booleanity",
            streams7, Km, [E_bcyc] * m7, [r_addr] * m7, [0] * m7, gamma7,
            labels7, booleanity=True, opening_kind="booleanity"))
        insts7.append(_bk.make(
            "ram_hamming_booleanity",
            streams7, Km, [E_h] * m7, [None] * m7, [1] * m7, gamma7,
            labels7, booleanity=False, opening_kind="hamming"))
    pi_inst = None
    if committed_image:
        from ..relations.program_image import ProgramImageReduction
        pi_inst = _bk.make("program_image_claim_reduction", pi_words,
                           r4_addr, pi_start, image_claim)
        insts7.append(pi_inst)
    stage7_polys, _ = _stage(insts7, "s7")
    stage7_openings = {}
    for inst in insts7:
        if inst is pi_inst:
            stage7_openings["program_image_init"] = \
                inst.final_openings["p"]
            continue
        kind7 = "bool" if inst.booleanity else "ham"
        for lab, v in zip(inst.labels, inst.final_openings):
            stage7_openings[f"{kind7}_{lab}"] = v

    _drop(*insts7)
    del E_bcyc, E_h
    _mark("stage7-booleanity")
    # ---- Stage 8: joint batched opening ---------------------------------
    # Reduce EVERY committed-poly claim from stages 1-7 to openings at one
    # shared point r*, then a single homomorphic RLC PCS opening
    # (prove_packed_openings, zkvm/prover.rs:2097-2260).
    entries = []          # (commitment_name, cycle-major point, claim)
    seen: Dict[object, int] = {}
    for oid, cname in stage8_entry_ids(d_ram, d_bc, advice_kinds,
                                       committed_image):
        pt, cl = accumulator.openings[oid]
        key = (cname, pt)
        if key in seen:
            assert seen[key] == cl, f"inconsistent duplicate claim {oid}"
            continue
        seen[key] = cl
        entries.append((cname, list(pt), cl))
    # group one-hot entries by K into gamma-RLC instances (one per K);
    # dense entries stay singletons.  Entries are REORDERED group-first so
    # stage8_openings aligns with the flattened instance outputs.
    gamma8 = transcript.challenge_scalar()
    # group key = (K, opening point): members of a group share ONE cycle
    # eq table (GroupedOneHot stores shared tables as (L, 1, T) and folds
    # the gamma powers into the per-matrix scalar -- the per-member
    # (L, M, T) eq-table stack at 2^18 was the stage-8 HBM peak)
    groups8: Dict[tuple, list] = {}
    dense8 = []
    for cname, pt, cl in entries:
        if cname in onehot_meta:
            key8 = (onehot_meta[cname][1], tuple(x % P for x in pt))
            groups8.setdefault(key8, []).append((cname, pt, cl))
        else:
            dense8.append((cname, pt, cl))
    entries = [e for g in groups8.values() for e in g] + dense8
    insts8 = []
    n8 = 0
    for (Km, _), members in groups8.items():
        log_Km = Km.bit_length() - 1
        q = cycle_major_to_address_major_point(
            members[0][1], len(members[0][1]) - log_Km)
        w_shared = eq_mod.evals(q[log_Km:])
        streams8, wt8, qa8, cls8, labs8 = [], [], [], [], []
        for cname, pt, cl in members:
            streams8.append(onehot_meta[cname][0])
            qa8.append(q[:log_Km])
            wt8.append(w_shared)
            cls8.append(cl)
            labs8.append(f"{n8}_{cname}")
            n8 += 1
        insts8.append(GroupedOneHot(streams8, Km, wt8, qa8, cls8, gamma8,
                                    labs8, booleanity=False,
                                    opening_kind="joint_opening"))
    for cname, pt, cl in dense8:
        insts8.append(_bk.make("inc_claim_reduction",
                               dense_meta[cname], pt, cl, f"{n8}_{cname}"))
        n8 += 1
    # Stage 8 tier selection (JOLT_TPU_S8 = stepped|scan|host): the joint
    # reduction is MANY small instances (one per (K, point) group + dense
    # singletons).  The whole-stage scan module's single remote XLA
    # compile for that many kernels exceeded 35 minutes at 2^18, and the
    # host engine pays ~2 dispatches PER INSTANCE per round (~27 s at
    # 2^18 on the axon relay).  Default: the STEPPED driver
    # (sumcheck/stepped.py) -- one batched dispatch per round across all
    # instances, O(segments) small compiles.  Proof bytes are
    # tier-invariant; CPU (test platform) keeps the host engine to avoid
    # per-shape compiles across hundreds of tiny suite cases.
    import os as _os8

    import jax as _jax8
    s8_mode = _os8.environ.get("JOLT_TPU_S8", "")
    if not s8_mode:
        if _os8.environ.get("JOLT_TPU_SCAN_S8"):
            s8_mode = "scan"
        else:
            s8_mode = ("stepped" if _jax8.default_backend() != "cpu"
                       else "host")
    if s8_mode == "host":
        for _inst8 in insts8:
            _inst8.force_host = True
    elif s8_mode == "stepped":
        for _inst8 in insts8:
            _inst8.prefer_stepped = True
    stage8_polys, r8 = _stage(insts8, "s8")
    stage8_openings = []
    for inst in insts8:
        if isinstance(inst, GroupedOneHot):
            stage8_openings.extend(inst.final_openings)
        else:
            stage8_openings.append(inst.final_openings["p"])

    _drop(*insts8)
    _mark("stage8-reduction")
    # single RLC opening of  sum_i mu^i * P~_i  at r*
    opening_proofs: Dict[str, object] = {}
    if pcs is not None:
        mu = transcript.challenge_scalar()
        n_max = max(committed_sparse[c][2] for c, _, _ in entries)
        assert n_max == 1 << len(r8)
        weights: Dict[str, int] = {}
        mup = 1
        value = 0
        for (cname, pt, cl), o in zip(entries, stage8_openings):
            weights[cname] = (weights.get(cname, 0) + mup) % P
            value = (value + mup * o % P
                     * embedding_factor(r8, len(pt))) % P
            mup = mup * mu % P
        # sparse RLC as weighted PARTS [(positions, w, values|None)]:
        # duplicate positions combine additively inside the opening, and
        # the combined-row build runs on the native mod-r kernel without
        # materializing per-entry weighted values
        rlc_parts = [(committed_sparse[cname][0], w,
                      committed_sparse[cname][1])
                     for cname, w in weights.items()]
        opening_proofs["joint"] = pcs.open_rlc(weights, rlc_parts, r8,
                                               value, transcript)

    _mark("stage8-openings")
    zk_blindfold = None
    if zk:
        from ..blindfold.prove import blindfold_prove
        zk_blindfold = blindfold_prove(zk_stages, zk_basis, transcript,
                                       zk_rng)
        _mark("blindfold")
    if _fs_trace:
        import json as _json
        with open(_fs_trace, "w") as _f:
            _json.dump(_fs_tape, _f, indent=1)
    return JoltProof(
        trace_length=trace.length,
        padded_length=trace.padded_length,
        stage1_uniskip=list(s1_coeffs),
        stage1_polys=stage1_polys,
        r1cs_input_openings=list(outer.input_openings),
        shift_polys=shift_polys,
        shift_opening=shift_inst.final_openings["cols"],
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
        stage5i_polys=stage5i_polys,
        stage5i_openings=stage5i_openings,
        stage6_polys=stage6_polys,
        stage6_openings={"ra": bc.final_openings["ra"],
                         "flags_ra": bc_flags.final_openings["ra"],
                         "shift_ra": bc_shift.final_openings["ra"],
                         "raf_wa": raf_rd.final_openings["m"],
                         "raf_ra1": raf_rs1.final_openings["m"],
                         "raf_ra2": raf_rs2.final_openings["m"]},
        stage6_claims=list(idx_claims),
        bytecode_log_K=bc_wit.log_K,
        stage6v_polys=stage6v_polys,
        stage6v_openings=stage6v_openings,
        stage7_polys=stage7_polys,
        stage7_openings=stage7_openings,
        stage8_polys=stage8_polys,
        stage8_openings=stage8_openings,
        commitments=commitments,
        opening_proofs=opening_proofs,
        advice_openings=advice_openings,
        zk_commitments=zk_commit_bytes if zk else None,
        zk_blindfold=zk_blindfold,
        config=proof_config.as_dict(),
        program_image_claim=image_claim,
    )
