"""Native C++ tracer vs Python emulator: bit-identical traces.

The mode-equivalence gate (SURVEY.md §4.9): different execution backends
must produce identical witnesses."""
import numpy as np
import pytest

from jolt_tpu.riscv.emulator import MemoryLayout
from jolt_tpu.tracer import trace_program
from jolt_tpu.tracer.native import trace_program_native

L = MemoryLayout()

GUESTS = {
    "fib": f"""
        li   a0, 25
        li   a1, 0
        li   a2, 1
    loop:
        beq  a0, zero, done
        add  a3, a1, a2
        mv   a1, a2
        mv   a2, a3
        addi a0, a0, -1
        j    loop
    done:
        li   t0, {L.output_start}
        sd   a1, 0(t0)
        li   t1, {L.termination}
        li   t2, 1
        sd   t2, 0(t1)
    """,
    "mixed": f"""
        li   a0, 123
        li   a1, -456
        mul  a2, a0, a1
        mulh a3, a0, a1
        div  a4, a1, a0
        rem  a5, a1, a0
        xor  a6, a0, a1
        sra  a7, a1, a0
        sltu s2, a1, a0
        lui  s3, 0xFFFFF
        li   t0, 0x80300000
        sd   a2, 0(t0)
        sw   a3, 8(t0)
        sh   a4, 16(t0)
        sb   a5, 24(t0)
        ld   s4, 0(t0)
        lw   s5, 8(t0)
        lhu  s6, 16(t0)
        lb   s7, 24(t0)
        jal  s8, fin
    fin:
        li   t1, {L.termination}
        li   t2, 1
        sd   t2, 0(t1)
    """,
    "io": f"""
        li t0, {L.input_start}
        ld a0, 0(t0)
        slli a0, a0, 2
        li t1, {L.output_start}
        sd a0, 0(t1)
        li t2, {L.termination}
        li t3, 1
        sd t3, 0(t2)
    """,
}


@pytest.mark.parametrize("name", list(GUESTS))
def test_native_matches_python(name):
    inputs = (123456).to_bytes(8, "little") if name == "io" else b""
    py = trace_program(GUESTS[name], inputs=inputs)
    nat = trace_program_native(GUESTS[name], inputs=inputs)
    assert nat.length == py.length
    assert nat.padded_length == py.padded_length
    for col in py.columns:
        assert (nat.columns[col] == py.columns[col]).all(), f"column {col} differs"
    assert bytes(nat.device.outputs) == bytes(py.device.outputs)
    assert nat.device.panic == py.device.panic


def test_native_tracer_speed():
    # tight loop: ~1M cycles; native tracer should stay well under a second
    import time
    src = f"""
        li   a0, 100000
    loop:
        addi a0, a0, -1
        bne  a0, zero, loop
        li   t1, {L.termination}
        li   t2, 1
        sd   t2, 0(t1)
    """
    t0 = time.time()
    tr = trace_program_native(src, max_cycles=1 << 19)
    dt = time.time() - t0
    assert tr.length >= 200_000
    rate = tr.length / dt
    # ~6 MHz standalone; generous threshold tolerates CPU contention from
    # concurrent XLA compilation in full-suite runs on this 4-core host
    assert rate > 0.5e6, f"native tracer too slow: {rate/1e6:.1f} MHz"


def test_parallel_tracing_bit_identical():
    """Two-pass parallel tracing == serial tracing, bit for bit (the
    reference's paranoia gate, tracer/src/parallel.rs:54-60)."""
    import numpy as np
    from jolt_tpu.riscv.emulator import MemoryLayout
    from jolt_tpu.tracer.native import trace_program_native
    layout = MemoryLayout(max_input_size=64, max_output_size=64)
    src = open("examples/collatz.s").read()
    inputs = (27).to_bytes(8, "little")
    serial = trace_program_native(src, inputs=inputs, layout=layout,
                                  parallel=1)
    par = trace_program_native(src, inputs=inputs, layout=layout,
                               parallel=4, chunk_rows=64)
    assert serial.length == par.length
    for k in serial.columns:
        assert np.array_equal(serial.columns[k], par.columns[k]), k
    assert bytes(serial.device.outputs) == bytes(par.device.outputs)
