"""Example guests execute correctly end-to-end (the reference ships 28
runnable examples as tests; `Cargo.toml:66-120`)."""

import struct

import pytest

from jolt_tpu.riscv.emulator import MemoryLayout
from jolt_tpu.tracer.trace import trace_program

L = MemoryLayout(max_input_size=64, max_output_size=64)
M64 = (1 << 64) - 1


def _run(path, inputs=b""):
    src = open(path).read()
    tr = trace_program(src, inputs=inputs, layout=L)
    return struct.unpack("<Q", bytes(tr.device.outputs[:8]))[0], tr


def test_fibonacci():
    out, _ = _run("examples/fibonacci.s", struct.pack("<Q", 10))
    assert out == 55


def test_collatz():
    def steps(n):
        c = 0
        while n != 1:
            n = 3 * n + 1 if n % 2 else n // 2
            c += 1
        return c
    out, _ = _run("examples/collatz.s", struct.pack("<Q", 27))
    assert out == steps(27) == 111


def test_muldiv():
    def s64(v):
        v &= M64
        return v - (1 << 64) if v >> 63 else v

    def s32(v):
        v &= 0xFFFFFFFF
        return v - (1 << 32) if v >> 31 else v

    def sext32(v):
        return s32(v) & M64

    for x, y in ((1234567890123, 97), (5, 0), ((1 << 63) | 3, 41)):
        acc = 0
        acc += x * y                                   # mul
        acc += (s64(x) * s64(y)) >> 64                 # mulh
        acc += (x * y) >> 64                           # mulhu
        acc += (s64(x) * y) >> 64                      # mulhsu
        if y == 0:
            acc += -1 + (1 << 64)                      # div
            acc += M64                                 # divu
            acc += s64(x) & M64                        # rem
            acc += x                                   # remu
        else:
            q = abs(s64(x)) // abs(s64(y))
            if (s64(x) < 0) != (s64(y) < 0):
                q = -q
            acc += q & M64
            acc += x // y
            acc += (s64(x) - q * s64(y)) & M64
            acc += x % y
        acc += (1 << 63)                               # MIN / -1 div -> MIN
        acc += 0                                       # MIN / -1 rem -> 0
        acc += sext32(x * y)                           # mulw
        sx, sy = s32(x), s32(y)
        if sy == 0:
            qw, rw = -1, sx
        elif sx == -(1 << 31) and sy == -1:
            qw, rw = sx, 0
        else:
            qw = abs(sx) // abs(sy)
            if (sx < 0) != (sy < 0):
                qw = -qw
            rw = sx - qw * sy
        acc += qw & M64
        acc += rw & M64
        out, _ = _run("examples/muldiv.s", struct.pack("<QQ", x, y))
        assert out == acc & M64, (x, y)


def test_memory_ops():
    def sx(v, bits):
        return v - (1 << bits) if v >> (bits - 1) else v
    base = 0x123456789ABCDEF0
    acc = 0
    acc += sx(0xF0, 8)
    acc += 0xF0
    acc += sx(0xDEF0, 16)
    acc += 0xDEF0
    acc += sx(0x9ABCDEF0, 32)
    acc += 0x9ABCDEF0
    acc += base
    acc += 0x55
    acc += 0x7FEE
    acc += sx(0x80000001, 32)
    out, _ = _run("examples/memory_ops.s")
    assert out == acc & M64
