"""Emulator/assembler tests: guest programs with known outputs.

Mirrors the reference arch-test approach (SURVEY.md §4.6) at small scale:
known-answer programs checked against Python-computed expectations.
"""
import numpy as np
import pytest

from jolt_tpu.riscv import assemble, isa
from jolt_tpu.riscv.emulator import MemoryLayout
from jolt_tpu.tracer import trace_program

# Guest ABI used by the test guests: inputs at layout.input_start, outputs
# written to layout.output_start, then store any nonzero to termination.
L = MemoryLayout()


def fib_guest(n: int) -> str:
    return f"""
        li   a0, {n}          # n
        li   a1, 0            # f0
        li   a2, 1            # f1
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
    """


def test_fibonacci_guest():
    tr = trace_program(fib_guest(50))
    out = int.from_bytes(bytes(tr.device.outputs[:8]), "little")
    fib = [0, 1]
    for _ in range(50):
        fib.append(fib[-1] + fib[-2])
    assert out == fib[50]
    assert tr.length > 50 * 5
    assert tr.padded_length >= 256 and (tr.padded_length & (tr.padded_length - 1)) == 0
    # SoA invariants
    assert tr.col("kind").shape == (tr.padded_length,)
    kinds = tr.col("kind")
    assert (kinds[tr.length:] == isa.KIND_ID["NOOP"]).all()
    # pc continuity: next_pc[i] == pc[i+1] for non-branch rows in [0, T-1)
    pc = tr.col("pc_lo").astype(np.uint64) | (tr.col("pc_hi").astype(np.uint64) << np.uint64(32))
    npc = tr.col("next_pc_lo").astype(np.uint64) | (tr.col("next_pc_hi").astype(np.uint64) << np.uint64(32))
    assert (npc[:tr.length - 1] == pc[1:tr.length]).all()


def test_memory_guest():
    # store/load roundtrip through RAM including byte/half/word variants
    src = f"""
        li   t0, 0x80100000
        li   t1, -559038737      # 0xDEADBEEF sign-extended
        sw   t1, 0(t0)
        lwu  t2, 0(t0)
        lw   t3, 0(t0)
        lb   t4, 3(t0)
        lbu  t5, 3(t0)
        li   s0, {L.output_start}
        sd   t2, 0(s0)
        sd   t3, 8(s0)
        sd   t4, 16(s0)
        sd   t5, 24(s0)
        li   t1, {L.termination}
        li   t2, 1
        sd   t2, 0(t1)
    """
    tr = trace_program(src)
    out = bytes(tr.device.outputs)
    def rd(i):
        return int.from_bytes(out[8 * i:8 * i + 8], "little")
    assert rd(0) == 0xDEADBEEF
    assert rd(1) == 0xFFFFFFFFDEADBEEF  # lw sign-extends
    assert rd(2) == (0xDE - 256) % (1 << 64)  # lb sign-extends 0xDE
    assert rd(3) == 0xDE
    # ram columns recorded for the store
    ram_addr = tr.col("ram_addr_lo").astype(np.uint64) | (
        tr.col("ram_addr_hi").astype(np.uint64) << np.uint64(32))
    assert 0x80100000 in ram_addr.tolist()


def test_mul_div_guest():
    cases = [
        ("mul", 7, 6, 42), ("mulhu", 1 << 63 >> 32, 1 << 33, 1),
        ("div", -100, 7, (-14) % (1 << 64)),  # truncates toward zero
        ("divu", 100, 7, 14),
        ("rem", -100, 7, (-2) % (1 << 64)), ("remu", 100, 7, 2),
        ("div", 5, 0, (1 << 64) - 1),  # div by zero -> -1
        ("rem", 5, 0, 5),
    ]
    for mnem, a, b, want in cases:
        src = f"""
            li a0, {a}
            li a1, {b}
            {mnem} a2, a0, a1
            li t0, {L.output_start}
            sd a2, 0(t0)
            li t1, {L.termination}
            li t2, 1
            sd t2, 0(t1)
        """
        tr = trace_program(src)
        got = int.from_bytes(bytes(tr.device.outputs[:8]), "little")
        assert got == want, f"{mnem} {a} {b}: got {got:#x} want {want:#x}"


def test_input_output_device():
    # read 8-byte input, add 1, write to output
    src = f"""
        li t0, {L.input_start}
        ld a0, 0(t0)
        addi a0, a0, 1
        li t1, {L.output_start}
        sd a0, 0(t1)
        li t2, {L.termination}
        li t3, 1
        sd t3, 0(t2)
    """
    tr = trace_program(src, inputs=(41).to_bytes(8, "little"))
    assert int.from_bytes(bytes(tr.device.outputs[:8]), "little") == 42


def test_shifts_and_w_ops():
    src = f"""
        li   a0, 1
        slli a1, a0, 63       # 1<<63
        srai a2, a1, 63       # -1
        srli a3, a1, 60       # 8
        li   a4, -1
        addiw a5, a4, 0       # sext32(-1) = -1
        li   a6, 0x7fffffff
        addiw a7, a6, 1       # overflow to -2^31
        li   t0, {L.output_start}
        sd a1, 0(t0)
        sd a2, 8(t0)
        sd a3, 16(t0)
        sd a5, 24(t0)
        sd a7, 32(t0)
        li t1, {L.termination}
        li t2, 1
        sd t2, 0(t1)
    """
    tr = trace_program(src)
    out = bytes(tr.device.outputs)
    def rd(i):
        return int.from_bytes(out[8 * i:8 * i + 8], "little")
    assert rd(0) == 1 << 63
    assert rd(1) == (1 << 64) - 1
    assert rd(2) == 8
    assert rd(3) == (1 << 64) - 1
    assert rd(4) == (-(1 << 31)) % (1 << 64)


def test_decode_roundtrip_random():
    # assemble -> decode for every R-type op
    from jolt_tpu.riscv.assembler import _R_OPS, _enc_r
    for mnem, (op, f3, f7) in _R_OPS.items():
        word = _enc_r(op, f3, f7, 11, 12, 13)
        dec = isa.decode(word)
        if op == 0x0B:   # INLINE custom opcode: selector packed in imm
            assert dec.kind == "INLINE"
            assert dec.imm == (op << 10) | (f7 << 3) | f3
        else:
            assert dec.kind == mnem.upper()
        assert (dec.rd, dec.rs1, dec.rs2) == (11, 12, 13)
