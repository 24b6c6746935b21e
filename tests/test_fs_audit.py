"""Fiat-Shamir obligation audit (the reference's fs_obligations /
fs-audit gates, `jolt-verifier/src/fs_audit.rs`,
`book/src/dev/testing-gates.md:10-24`):

1. the prover's and verifier's transcript EVENT TAPES are identical --
   every absorb/challenge the prover performs is replayed by the verifier
   in the same order with the same payload (catches absorbed-by-one-side
   bugs that state-equality alone can't localize);
2. the scan/fused device transcript agrees with the host tape (covered
   structurally by the drivers' replay asserts, re-checked here e2e).
"""

import pytest

from jolt_tpu.prover import prove
from jolt_tpu.riscv.emulator import MemoryLayout
from jolt_tpu.tracer import trace_program
from jolt_tpu.transcript import Blake2bTranscript
from jolt_tpu.verifier import verify
from jolt_tpu.verifier.verifier import PublicIO

L = MemoryLayout(max_input_size=64, max_output_size=64)

GUEST = f"""
    li   a0, 6
    li   a1, 1
loop:
    beq  a0, zero, done
    mul  a1, a1, a0
    addi a0, a0, -1
    j    loop
done:
    li   t0, {L.output_start}
    sd   a1, 0(t0)
    li   t1, {L.termination}
    li   t2, 1
    sd   t2, 0(t1)
"""


def test_prover_verifier_event_tapes_identical():
    tr = trace_program(GUEST, layout=L)
    pt = Blake2bTranscript(b"Jolt", record_events=True)
    proof = prove(tr, _transcript=pt)
    vt = Blake2bTranscript(b"Jolt", record_events=True)
    assert verify(proof, PublicIO.from_trace(tr), _transcript=vt)
    assert pt.events == vt.events, (
        "prover/verifier Fiat-Shamir tapes diverge: first delta at index "
        f"{next(i for i, (a, b) in enumerate(zip(pt.events, vt.events)) if a != b)}"
        if pt.events != vt.events else "")
    # sanity on the tape itself: non-trivial, interleaved
    kinds = [k for k, _ in pt.events]
    assert kinds.count("challenge") > 50
    assert kinds.count("absorb") > 100
    assert pt.state == vt.state
