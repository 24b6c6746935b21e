"""VirtualHostIO guest intrinsics: print + cycle tracking.

Reference: tracer/src/instruction/virtual_host_io.rs (dispatch on x10),
jolt-platform/src/{print,cycle_tracking}.rs.  The hostio row is a provable
no-op (FENCE class); the side effects are trace-time only."""
import numpy as np
import pytest

from jolt_tpu.riscv.emulator import MemoryLayout
from jolt_tpu.tracer import trace_program
from jolt_tpu.tracer.native import trace_program_native

L = MemoryLayout(max_input_size=64, max_output_size=64)

HEAP = 0x80010000
PRINT_ID = 0x505249
CYCLE_ID = 0xC7C1E


def _store_str(base: int, s: bytes) -> str:
    """Emit asm storing s at base (8 bytes at a time)."""
    out = [f"    li   s10, {base}"]
    padded = s + b"\x00" * (-len(s) % 8)
    for i in range(0, len(padded), 8):
        w = int.from_bytes(padded[i:i + 8], "little")
        out.append(f"    li   s11, {w}")
        out.append(f"    sd   s11, {i}(s10)")
    return "\n".join(out) + "\n"


def _guest():
    src = _store_str(HEAP, b"hello")
    src += _store_str(HEAP + 64, b"loop")
    src += f"""
    # println("hello")
    li   a0, {PRINT_ID}
    li   a1, {HEAP}
    li   a2, 5
    li   a3, 2
    hostio
    # start_cycle_tracking("loop")
    li   a0, {CYCLE_ID}
    li   a1, {HEAP + 64}
    li   a2, 4
    li   a3, 1
    hostio
    li   t0, 10
    li   t1, 0
sumloop:
    add  t1, t1, t0
    addi t0, t0, -1
    bne  t0, zero, sumloop
    # end_cycle_tracking("loop")
    li   a0, {CYCLE_ID}
    li   a1, {HEAP + 64}
    li   a2, 4
    li   a3, 2
    hostio
    li   t2, {L.output_start}
    sd   t1, 0(t2)
    li   t3, {L.termination}
    li   t4, 1
    sd   t4, 0(t3)
"""
    return src


@pytest.fixture(scope="module")
def traces():
    src = _guest()
    return trace_program(src, layout=L), trace_program_native(src, layout=L)


def test_console_output(traces):
    tr_py, tr_nat = traces
    assert bytes(tr_py.device.console) == b"hello\n"
    assert bytes(tr_nat.device.console) == b"hello\n"


def test_cycle_markers(traces):
    tr_py, tr_nat = traces
    assert tr_py.device.cycle_markers == tr_nat.device.cycle_markers
    spans = tr_py.device.cycle_spans()
    assert list(spans) == ["loop"]
    assert spans["loop"]["count"] == 1
    # the loop body is 10 iterations x 3 instructions plus the 4 marker
    # setup rows between start and end markers
    assert 30 <= spans["loop"]["cycles"] <= 50


def test_native_bit_identity(traces):
    tr_py, tr_nat = traces
    assert tr_py.length == tr_nat.length
    for name in tr_py.columns:
        assert np.array_equal(tr_py.columns[name], tr_nat.columns[name]), name


def test_result_and_prove(traces):
    from jolt_tpu.prover import prove
    from jolt_tpu.verifier import verify
    from jolt_tpu.verifier.verifier import PublicIO
    tr_py, _ = traces
    out = int.from_bytes(bytes(tr_py.device.outputs[:8]), "little")
    assert out == sum(range(1, 11))
    proof = prove(tr_py)
    assert verify(proof, PublicIO.from_trace(tr_py))
