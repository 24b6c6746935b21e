"""Instruction-execution read+raf Shout: standalone prove/verify gates on
synthetic lookup witnesses (all 12 tables + raf identity path + no-table
cycles), plus tamper rejection."""
import random

import numpy as np
import pytest

from jolt_tpu.field.params import FR
from jolt_tpu.lookups import tables as LT
from jolt_tpu.relations.instruction_read_raf import (InstructionReadRaf,
                                                     InstructionReadRafVerifier,
                                                     host_eq_evals)
from jolt_tpu.sumcheck.engine import (BatchedSumcheck, OpeningAccumulator,
                                      SumcheckError)
from jolt_tpu.transcript import Blake2bTranscript
from jolt_tpu.witness.instruction_lookups import (D, LOG_M, M,
                                                  InstructionLookupWitness)

P = FR.modulus


def _synthetic_witness(T, seed):
    """Random mix of interleaved tables, identity-path, and no-table rows."""
    rng = random.Random(seed)
    indices, table_ids, interleaved = [], [], []
    outputs, lefts, rights = [], [], []
    il_tables = ["And", "Or", "Xor", "Equal", "NotEqual", "UnsignedLessThan",
                 "SignedLessThan", "UnsignedGreaterThanEqual",
                 "SignedGreaterThanEqual", "RangeCheckAligned"]
    for j in range(T):
        kind = rng.randrange(4)
        if kind == 0:   # no-table interleaved (load/store/noop)
            x = y = 0
            idx = 0
            indices.append(idx)
            table_ids.append(-1)
            interleaved.append(1)
            outputs.append(0)
            lefts.append(x)
            rights.append(y)
        elif kind == 1:  # non-interleaved (add/sub/mul): RangeCheck/UpperWord
            name = rng.choice(["RangeCheck", "UpperWord"])
            right = rng.randrange(1 << (65 if name == "RangeCheck" else 128))
            idx = LT.lookup_index(False, 0, right)
            indices.append(idx)
            table_ids.append(LT.TABLE_INDEX[name])
            interleaved.append(0)
            outputs.append(LT.table_entry(name, idx))
            lefts.append(0)
            rights.append(right)
        else:            # interleaved table
            name = rng.choice(il_tables)
            x, y = rng.randrange(1 << 64), rng.randrange(1 << 64)
            idx = LT.lookup_index(True, x, y)
            indices.append(idx)
            table_ids.append(LT.TABLE_INDEX[name])
            interleaved.append(1)
            outputs.append(LT.table_entry(name, idx))
            lefts.append(x)
            rights.append(y)
    chunks = np.zeros((D, T), dtype=np.uint32)
    for j, idx in enumerate(indices):
        for i in range(D):
            chunks[i, j] = (idx >> (LT.LOG_K - LOG_M * (i + 1))) & (M - 1)
    wit = InstructionLookupWitness(indices=indices, table_ids=table_ids,
                                   interleaved=interleaved, chunks=chunks, T=T)
    return wit, outputs, lefts, rights


def _run(T=8, seed=3, tamper_round=None, tamper_opening=None):
    wit, outputs, lefts, rights = _synthetic_witness(T, seed)
    log_T = T.bit_length() - 1

    tp = Blake2bTranscript(b"rr")
    r_cycle = tp.challenge_vector(log_T)
    gamma = tp.challenge_scalar()
    E = host_eq_evals(r_cycle)
    rv = sum(e * o for e, o in zip(E, outputs)) % P
    lo = sum(e * o for e, o in zip(E, lefts)) % P
    ro = sum(e * o for e, o in zip(E, rights)) % P

    inst = InstructionReadRaf(wit, gamma, r_cycle, rv, lo, ro)
    acc = OpeningAccumulator()
    polys, r = BatchedSumcheck.prove([inst], acc, tp)

    # assemble "proof" openings
    openings = {f"ra{i}": inst.final_openings[f"ra{i}"] for i in range(D)}
    for t, name in enumerate(LT.TABLE_NAMES):
        openings[f"flag_{name}"] = inst.flag_claims[t]
    openings["raf_flag"] = inst.raf_flag_claim

    if tamper_round is not None:
        polys = [list(rp) for rp in polys]
        polys[tamper_round][0] = (polys[tamper_round][0] + 1) % P
    if tamper_opening is not None:
        openings[tamper_opening] = (openings[tamper_opening] + 1) % P

    tv = Blake2bTranscript(b"rr")
    r_cycle2 = tv.challenge_vector(log_T)
    gamma2 = tv.challenge_scalar()
    ver = InstructionReadRafVerifier(log_T, gamma2, r_cycle2, rv, lo, ro,
                                     openings)
    acc2 = OpeningAccumulator()
    try:
        rr = BatchedSumcheck.verify(polys, [ver], acc2, tv)
    except SumcheckError:
        return False, None, None
    # replicate the prover's opening flush for transcript parity
    for t, name in enumerate(LT.TABLE_NAMES):
        acc2.insert(("instr_flag", name), rr[128:], openings[f"flag_{name}"])
    acc2.insert(("instr_flag", "raf"), rr[128:], openings["raf_flag"])
    for i in range(D):
        pt = list(rr[128:]) + list(rr[LOG_M * i: LOG_M * (i + 1)])
        acc2.insert(("instr_ra", i), pt, openings[f"ra{i}"])
    acc2.flush_to_transcript(tv)
    assert tv.state == tp.state, "transcript divergence"
    return True, inst, rr


def test_read_raf_roundtrip():
    ok, inst, r = _run(T=8, seed=3)
    assert ok


def test_read_raf_all_nontable():
    # degenerate: every cycle is a no-table row (rv = 0 claims)
    ok, _, _ = _run(T=4, seed=999)
    assert ok


def test_read_raf_tamper_rejected():
    assert not _run(T=8, seed=3, tamper_round=0)[0]       # address round
    assert not _run(T=8, seed=3, tamper_round=64)[0]      # mid address
    assert not _run(T=8, seed=3, tamper_round=129)[0]     # cycle round
    assert not _run(T=8, seed=3, tamper_opening="ra3")[0]
    assert not _run(T=8, seed=3, tamper_opening="flag_And")[0]
    assert not _run(T=8, seed=3, tamper_opening="raf_flag")[0]


def test_read_raf_wrong_output_claim():
    """A lying rv claim (wrong ALU output) must be rejected."""
    wit, outputs, lefts, rights = _synthetic_witness(8, 3)
    log_T = 3
    tp = Blake2bTranscript(b"rr")
    r_cycle = tp.challenge_vector(log_T)
    gamma = tp.challenge_scalar()
    E = host_eq_evals(r_cycle)
    rv = (sum(e * o for e, o in zip(E, outputs)) + 1) % P  # LIE
    lo = sum(e * o for e, o in zip(E, lefts)) % P
    ro = sum(e * o for e, o in zip(E, rights)) % P
    inst = InstructionReadRaf(wit, gamma, r_cycle, rv, lo, ro)
    acc = OpeningAccumulator()
    polys, _ = BatchedSumcheck.prove([inst], acc, tp)
    openings = {f"ra{i}": inst.final_openings[f"ra{i}"] for i in range(D)}
    for t, name in enumerate(LT.TABLE_NAMES):
        openings[f"flag_{name}"] = inst.flag_claims[t]
    openings["raf_flag"] = inst.raf_flag_claim
    tv = Blake2bTranscript(b"rr")
    r_cycle2 = tv.challenge_vector(log_T)
    gamma2 = tv.challenge_scalar()
    ver = InstructionReadRafVerifier(log_T, gamma2, r_cycle2, rv, lo, ro,
                                     openings)
    with pytest.raises(SumcheckError):
        BatchedSumcheck.verify(polys, [ver], OpeningAccumulator(), tv)
