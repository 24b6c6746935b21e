"""Spartan shift sumcheck (PC chaining): weight algebra, completeness,
and the round-3 forgery regression (experiments/soundness_probe_pc_chain).

Reference: `crates/jolt-prover-legacy/src/zkvm/spartan/shift.rs:40-55`.
"""
import random

import numpy as np
import pytest

from jolt_tpu.field import FR, ops
from jolt_tpu.poly import dense, eq
from jolt_tpu.relations.shift import (SHIFT_COLUMNS, shift_weight_eval_int,
                                      shift_weight_evals)
from jolt_tpu.riscv.emulator import MemoryLayout
from jolt_tpu.tracer.trace import Trace, trace_program
from jolt_tpu.verifier.verifier import PublicIO, VerificationError, verify
import jolt_tpu.witness.r1cs_inputs as RI
from jolt_tpu.prover import prover as PROVER
from jolt_tpu.r1cs import constraints as C

P = FR.modulus
rng = random.Random(7)


def _rand_pt(n):
    return [rng.randrange(P) for _ in range(n)]


def test_shift_weight_closed_form():
    """The clamped-shift weight table's MLE at a random point equals the
    verifier's closed form (same HighToLow binding as the engine)."""
    for n in (2, 3, 5):
        r_cyc = _rand_pt(n)
        rho = _rand_pt(n)
        W = shift_weight_evals(r_cyc)
        for rj in rho:
            W = dense.bind_high(W, ops.pack_ints([rj]), FR)
        got = ops.unpack_ints(W)[0]
        assert got == shift_weight_eval_int(r_cyc, rho)


def test_shift_weight_table_semantics():
    """On boolean rows the table is the clamped shift: W'[y] = eq(r, y-1)
    for y >= 1 (plus eq(r, T-1) at the last slot), W'[0] = 0."""
    n = 3
    r_cyc = _rand_pt(n)
    W = ops.unpack_ints(shift_weight_evals(r_cyc))
    E = ops.unpack_ints(eq.evals(r_cyc))
    T = 1 << n
    assert W[0] == 0
    for y in range(1, T - 1):
        assert W[y] == E[y - 1]
    assert W[T - 1] == (E[T - 2] + E[T - 1]) % P


@pytest.fixture(scope="module")
def fib_trace():
    layout = MemoryLayout(max_input_size=64, max_output_size=64)
    src = open("examples/fibonacci.s").read()
    return trace_program(src, inputs=(10).to_bytes(8, "little"),
                         layout=layout, min_padded=256)


def _forge_pc_chain(tr):
    """Duplicate one add cycle (register-file-consistent) and forge the
    next_* witness columns to claim fall-through: the exact round-3 break."""
    rd, rs1, rs2 = tr.col("rd"), tr.col("rs1"), tr.col("rs2")
    j = None
    for t in range(tr.length):
        if rd[t] == 13 and rs1[t] == 11 and rs2[t] == 12 and \
           tr.columns["ram_addr_lo"][t] == 0 and \
           tr.columns["ram_addr_hi"][t] == 0:
            j = t
            break
    assert j is not None
    cols = {}
    for name, arr in tr.columns.items():
        dup = arr[j:j + 1].copy()
        cols[name] = np.concatenate([arr[:j + 1], dup, arr[j + 1:-1]])
    for suffix in ("_lo", "_hi"):
        cols["rd_pre" + suffix][j + 1] = cols["rd_post" + suffix][j]
    forged = Trace(columns=cols, length=tr.length + 1,
                   padded_length=tr.padded_length, device=tr.device,
                   memory_layout=tr.memory_layout, code=tr.code,
                   entry=tr.entry, program=tr.program)
    return forged, j


def test_pc_chain_forgery_rejected(fib_trace, monkeypatch):
    """Round-3 soundness regression: the spliced-duplicate trace with
    forged fall-through next_* openings must NOT verify."""
    forged, j = _forge_pc_chain(fib_trace)
    honest_extract = RI.extract_r1cs_inputs

    def forged_extract(trace, strict=True):
        inputs = honest_extract(trace, strict=False)
        inputs.lo[RI.V_NEXT_UNEXPANDED_PC][j] = \
            inputs.lo[RI.V_UNEXPANDED_PC][j] + 4
        inputs.lo[RI.V_NEXT_PC][j] = inputs.lo[RI.V_PC][j] + 1
        assert not C.check_satisfied(inputs), \
            "forgery must satisfy per-row R1CS (else the probe is moot)"
        return inputs

    monkeypatch.setattr(PROVER, "extract_r1cs_inputs", forged_extract)
    proof = PROVER.prove(forged)
    io = PublicIO.from_trace(forged)
    with pytest.raises(VerificationError):
        verify(proof, io)


def test_shift_tamper_rejected(fib_trace):
    """Mutating the shift opening or a shift round poly must reject."""
    proof = PROVER.prove(fib_trace)
    io = PublicIO.from_trace(fib_trace)
    assert verify(proof, io)

    import copy
    bad = copy.deepcopy(proof)
    bad.shift_opening = (bad.shift_opening + 1) % P
    with pytest.raises(VerificationError):
        verify(bad, io)

    bad = copy.deepcopy(proof)
    bad.shift_polys[1][0] = (bad.shift_polys[1][0] + 1) % P
    with pytest.raises(VerificationError):
        verify(bad, io)

    # forged next_pc opening alone (constraint-consistent direction) must
    # break the shift input claim chain
    bad = copy.deepcopy(proof)
    idx = RI.VAR_NAMES.index("next_pc")
    bad.r1cs_input_openings[idx] = (bad.r1cs_input_openings[idx] + 1) % P
    with pytest.raises(VerificationError):
        verify(bad, io)
