"""RV64 A (atomics) + C (compressed) extension tests.

Decoder unit tests against hand-encoded words, execution equivalence
between the source-instruction emulator and the expanded-row tracer, and a
prove/verify round trip over a guest that exercises LR/SC + AMOs +
compressed instructions (reference scope: RV64IMAC, `README.md:7`;
atomics lower through `jolt-program/src/expand/memory/{amo*,lr*,sc*}.rs`).
"""

import hashlib
import struct

import pytest

from jolt_tpu.prover import prove
from jolt_tpu.riscv import isa
from jolt_tpu.riscv.assembler import assemble
from jolt_tpu.riscv.emulator import Emulator, JoltDevice, MemoryLayout
from jolt_tpu.tracer.trace import trace_program
from jolt_tpu.verifier import verify
from jolt_tpu.verifier.verifier import PublicIO

L = MemoryLayout(max_input_size=64, max_output_size=64)


def enc_amo(funct5, funct3, rd, rs1, rs2):
    return (0x2F | (rd << 7) | (funct3 << 12) | (rs1 << 15) | (rs2 << 20)
            | (funct5 << 27))


AMO_F5 = {"LR": 0x02, "SC": 0x03, "AMOSWAP": 0x01, "AMOADD": 0x00,
          "AMOXOR": 0x04, "AMOAND": 0x0C, "AMOOR": 0x08, "AMOMIN": 0x10,
          "AMOMAX": 0x14, "AMOMINU": 0x18, "AMOMAXU": 0x1C}


def test_decode_amo_all_kinds():
    for name, f5 in AMO_F5.items():
        for f3, w in ((2, "W"), (3, "D")):
            rs2 = 0 if name == "LR" else 7
            d = isa.decode(enc_amo(f5, f3, 5, 6, rs2))
            assert d.kind == name + w
            assert (d.rd, d.rs1, d.rs2) == (5, 6, rs2)
    # aq/rl bits are ignored
    d = isa.decode(enc_amo(AMO_F5["AMOADD"], 2, 1, 2, 3) | (3 << 25))
    assert d.kind == "AMOADDW"


def test_decode_compressed_samples():
    # c.addi x10, -3  -> 000 1 01010 11101 01 = funct3 000, imm 0x1D sext -3
    d = isa.decode_compressed(0b000_1_01010_11101_01)
    assert (d.kind, d.rd, d.rs1, d.imm, d.length) == ("ADDI", 10, 10, -3, 2)
    # c.li x7, 9      -> 010 0 00111 01001 01
    d = isa.decode_compressed(0b010_0_00111_01001_01)
    assert (d.kind, d.rd, d.rs1, d.imm) == ("ADDI", 7, 0, 9)
    # c.mv x5, x6     -> 100 0 00101 00110 10
    d = isa.decode_compressed(0b100_0_00101_00110_10)
    assert (d.kind, d.rd, d.rs1, d.rs2) == ("ADD", 5, 0, 6)
    # c.add x5, x6    -> 100 1 00101 00110 10
    d = isa.decode_compressed(0b100_1_00101_00110_10)
    assert (d.kind, d.rd, d.rs1, d.rs2) == ("ADD", 5, 5, 6)
    # c.sub x8, x9    -> 100 0 11 000 00 001 01 (rd'=x8 -> 0, rs2'=x9 -> 1)
    d = isa.decode_compressed(0b100_0_11_000_00_001_01)
    assert (d.kind, d.rd, d.rs1, d.rs2) == ("SUB", 8, 8, 9)
    # c.ld x9, 8(x10) -> 011 001 010 00 001 00  (uimm[5:3]=1, uimm[7:6]=0)
    d = isa.decode_compressed(0b011_001_010_00_001_00)
    assert (d.kind, d.rd, d.rs1, d.imm) == ("LD", 9, 10, 8)
    # c.sdsp x9, 16(sp) -> 111 010 000 01001 10  (uimm[5:3]=2 -> 16)
    d = isa.decode_compressed(0b111_010_000_01001_10)
    assert (d.kind, d.rs1, d.rs2, d.imm) == ("SD", 2, 9, 16)
    # c.jr x1         -> 100 0 00001 00000 10
    d = isa.decode_compressed(0b100_0_00001_00000_10)
    assert (d.kind, d.rd, d.rs1, d.imm) == ("JALR", 0, 1, 0)
    # c.beqz x8, 0    -> branch imm 0 variant just decodes
    d = isa.decode_compressed(0b110_000_000_00000_01)
    assert (d.kind, d.rs1, d.rs2) == ("BEQ", 8, 0)


def _amo_guest_code():
    """Raw code: exercise AMOs + LR/SC, accumulate a checksum in a5,
    store it to the output region, terminate."""
    base = 0x80001000   # scratch RAM (dword-aligned)
    lines = [
        f"li   s0, {base}",
        "li   t0, 100",
        "sd   t0, 0(s0)",           # mem[0] = 100
        "li   t1, 23",
    ]
    code = assemble("\n".join(lines), base=0x80000000)
    words = []
    # amoadd.d a0, t1, (s0): old=100, mem=123
    words.append(enc_amo(AMO_F5["AMOADD"], 3, 10, 8, 6))
    # amomaxu.d a1, t0(=100), (s0): old=123, mem=max(123,100)=123
    words.append(enc_amo(AMO_F5["AMOMAXU"], 3, 11, 8, 5))
    # lr.d a2, (s0): old=123, reservation = s0
    words.append(enc_amo(AMO_F5["LR"], 3, 12, 8, 0))
    # sc.d a3, t1(=23), (s0): succeeds -> mem=23, a3=0
    words.append(enc_amo(AMO_F5["SC"], 3, 13, 8, 6))
    # sc.d a4, t0, (s0): fails (no reservation) -> a4=1, mem unchanged
    words.append(enc_amo(AMO_F5["SC"], 3, 14, 8, 5))
    # word AMOs at s0+8 (word-aligned)
    more = [
        "addi s1, s0, 8",
        "li   t2, 0x80000001",
        "sw   t2, 0(s1)",            # word = 0x80000001 (negative as i32)
        "li   t3, 5",
    ]
    code2 = assemble("\n".join(more), base=0)
    # amomin.w a6, t3, (s1): old sext = 0xFFFFFFFF80000001, min keeps word
    words2 = [enc_amo(AMO_F5["AMOMIN"], 2, 16, 9, 28),
              # amoswap.w a7, t3, (s1): old = min result, word = 5
              enc_amo(AMO_F5["AMOSWAP"], 2, 17, 9, 28)]
    tail = [
        "ld   t4, 0(s0)",            # 23
        "lw   t5, 0(s1)",            # 5
        # checksum: fold everything into a5
        "add  a5, a0, a1",
        "add  a5, a5, a2",
        "add  a5, a5, a3",
        "add  a5, a5, a4",
        "add  a5, a5, a6",
        "add  a5, a5, a7",
        "add  a5, a5, t4",
        "add  a5, a5, t5",
        f"li   t6, {L.output_start}",
        "sd   a5, 0(t6)",
        f"li   t6, {L.termination}",
        "li   t5, 1",
        "sd   t5, 0(t6)",
    ]
    code3 = assemble("\n".join(tail), base=0)
    blob = (code + b"".join(w.to_bytes(4, "little") for w in words)
            + code2 + b"".join(w.to_bytes(4, "little") for w in words2)
            + code3)
    return blob


def _expected_amo_checksum():
    M = (1 << 64) - 1
    a0 = 100
    a1 = 123
    a2 = 123
    a3 = 0
    a4 = 1
    old_w = 0xFFFFFFFF80000001      # sext(0x80000001)
    a6 = old_w                      # min(s32 old=-2^31+1, 5) keeps old
    a7 = old_w                      # after amomin word unchanged; swap returns it
    t4 = 23
    t5 = 5
    return (a0 + a1 + a2 + a3 + a4 + a6 + a7 + t4 + t5) & M


def test_amo_execution_and_prove():
    code = _amo_guest_code()
    tr = trace_program(code, layout=L)
    got = struct.unpack("<Q", bytes(tr.device.outputs[:8]))[0]
    assert got == _expected_amo_checksum()
    proof = prove(tr)
    assert verify(proof, PublicIO.from_trace(tr))


def test_amo_source_emulator_matches_row_tracer():
    """The plain (source-instruction) emulator computes the same outputs as
    the expanded-row tracer -- the atomic expansion is semantics-preserving."""
    code = _amo_guest_code()
    dev = JoltDevice(L)
    emu = Emulator(dev)
    emu.load_bytes(0x80000000, code)
    emu.run(record_trace=False)
    tr = trace_program(code, layout=L)
    assert bytes(dev.outputs[:8]) == bytes(tr.device.outputs[:8])


def _compressed_guest_code():
    """Half of the work in RVC encodings: c.li/c.mv/c.add/c.sub/c.j."""
    def h(x):
        return x.to_bytes(2, "little")

    blob = b""
    blob += h(0b010_0_01010_01110_01)   # c.li  x10, 14
    blob += h(0b010_0_01011_00111_01)   # c.li  x11, 7
    blob += h(0b100_1_01010_01011_10)   # c.add x10, x11      -> 21
    blob += h(0b100_0_01100_01010_10)   # c.mv  x12, x10      -> 21
    # c.sub x12', x11' needs rd'/rs2' in x8..15: x12 -> 100, x11 -> 011
    blob += h(0b100_0_11_100_00_011_01)  # c.sub x12, x11     -> 14
    blob += h(0b000_0_01100_00100_01)   # c.addi x12, 4       -> 18
    # c.j +2 (lands on the next instruction; exercises the CJ format)
    cj = (0b101 << 13) | 0b01
    cj |= 1 << 3          # imm[3:1] at inst[5:3]; offset 2 -> imm[1]=1
    blob += h(cj)
    tail = f"""
    li   t0, {L.output_start}
    sd   a2, 0(t0)
    li   t1, {L.termination}
    li   t2, 1
    sd   t2, 0(t1)
"""
    return blob + assemble(tail, base=0)


def test_compressed_execution_and_prove():
    code = _compressed_guest_code()
    tr = trace_program(code, layout=L)
    got = struct.unpack("<Q", bytes(tr.device.outputs[:8]))[0]
    assert got == 18
    # both emulators agree
    dev = JoltDevice(L)
    emu = Emulator(dev)
    emu.load_bytes(0x80000000, code)
    emu.run(record_trace=False)
    assert struct.unpack("<Q", bytes(dev.outputs[:8]))[0] == 18
    proof = prove(tr)
    assert verify(proof, PublicIO.from_trace(tr))
