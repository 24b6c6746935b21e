"""Streaming stage-1 tier: chunked lift+combo produces BYTE-IDENTICAL
proofs to the materialized tier (backend-invariance, the reference's
invariant 8 / `specs/clean-slate-prover.md:226-233`), while the Montgomery
column stack never materializes (`subprotocols/streaming_schedule.rs`
analog; activates automatically at T >= STREAM_THRESHOLD)."""
import pytest

from jolt_tpu.proof_io import serialize_proof
from jolt_tpu.prover import prove
from jolt_tpu.riscv.emulator import MemoryLayout
from jolt_tpu.tracer import trace_program

L = MemoryLayout(max_input_size=64, max_output_size=64)

GUEST = f"""
    li   a0, 200
    li   a1, 0
loop:
    add  a1, a1, a0
    addi a0, a0, -1
    bne  a0, zero, loop
    li   t0, {L.output_start}
    sd   a1, 0(t0)
    li   t1, {L.termination}
    li   t2, 1
    sd   t2, 0(t1)
"""


def test_streamed_stage1_proof_byte_identical(monkeypatch):
    tr = trace_program(GUEST, layout=L)
    monkeypatch.delenv("JOLT_TPU_STREAM_STAGE1", raising=False)
    dense = prove(tr)
    monkeypatch.setenv("JOLT_TPU_STREAM_STAGE1", "1")
    streamed = prove(tr)
    assert serialize_proof(dense, {}) == serialize_proof(streamed, {})
