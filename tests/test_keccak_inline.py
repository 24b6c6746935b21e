"""Keccak256 INLINE (the Keccak-f[1600] permutation custom opcode).

Reference: `jolt-inlines/keccak256/src/sequence_builder.rs` (theta ->
rho+pi -> chi -> iota x24 over 66 virtual registers; ~3.4k provable rows
per permutation, the reference's 3x-class cycle reduction).  Exercises
the 64-bit rotate/xor tables (VirtualROTR via bitmask rotri) and ANDN
end-to-end.
"""
import random

import pytest

from jolt_tpu.riscv.emulator import MemoryLayout
from jolt_tpu.tracer import trace_program

L = MemoryLayout(max_input_size=64, max_output_size=64)
S = 0x80008100
M64 = (1 << 64) - 1


def keccak_f(state):
    """Python reference Keccak-f[1600] (FIPS 202)."""
    RC = [
        0x0000000000000001, 0x0000000000008082, 0x800000000000808a,
        0x8000000080008000, 0x000000000000808b, 0x0000000080000001,
        0x8000000080008081, 0x8000000000008009, 0x000000000000008a,
        0x0000000000000088, 0x0000000080008009, 0x000000008000000a,
        0x000000008000808b, 0x800000000000008b, 0x8000000000008089,
        0x8000000000008003, 0x8000000000008002, 0x8000000000000080,
        0x000000000000800a, 0x800000008000000a, 0x8000000080008081,
        0x8000000000008080, 0x0000000080000001, 0x8000000080008008,
    ]
    ROT = [[0, 36, 3, 41, 18], [1, 44, 10, 45, 2], [62, 6, 43, 15, 61],
           [28, 55, 25, 21, 56], [27, 20, 39, 8, 14]]
    A = {(x, y): state[5 * y + x] for x in range(5) for y in range(5)}

    def rotl(v, n):
        return ((v << n) | (v >> (64 - n))) & M64 if n else v

    for rnd in range(24):
        C = {x: A[(x, 0)] ^ A[(x, 1)] ^ A[(x, 2)] ^ A[(x, 3)] ^ A[(x, 4)]
             for x in range(5)}
        D = {x: C[(x + 4) % 5] ^ rotl(C[(x + 1) % 5], 1) for x in range(5)}
        for x in range(5):
            for y in range(5):
                A[(x, y)] ^= D[x]
        B = {}
        for x in range(5):
            for y in range(5):
                B[(y, (2 * x + 3 * y) % 5)] = rotl(A[(x, y)], ROT[x][y])
        for x in range(5):
            for y in range(5):
                A[(x, y)] = B[(x, y)] ^ (
                    (~B[((x + 1) % 5, y)]) & B[((x + 2) % 5, y)] & M64)
        A[(0, 0)] ^= RC[rnd]
    return [A[(x, y)] for y in range(5) for x in range(5)]


def _guest(state):
    src = [f"    li   s0, {S}"]
    for i, v in enumerate(state):
        src.append(f"    li   t0, {v:#x}")
        src.append(f"    sd   t0, {8 * i}(s0)")
    src.append("    keccak256 s0")
    src.append(f"    li   t3, {L.output_start}")
    for i in range(4):
        src.append(f"    ld   t0, {8 * i}(s0)")
        src.append(f"    sd   t0, {8 * i}(t3)")
    src.append(f"    li   t1, {L.termination}")
    src.append("    li   t2, 1")
    src.append("    sd   t2, 0(t1)")
    return "\n".join(src)


@pytest.fixture(scope="module")
def traced():
    state = [random.Random(9).getrandbits(64) for _ in range(25)]
    return state, trace_program(_guest(state), layout=L)


def test_keccak_inline_permutation(traced):
    state, tr = traced
    want = keccak_f(state)
    got = [int.from_bytes(bytes(tr.device.outputs[8 * i:8 * i + 8]),
                          "little") for i in range(4)]
    assert got == want[:4]
    # the permutation itself stays in the ~3.5k-row class
    assert tr.length < 4000


def test_keccak_inline_native_parity(traced):
    from jolt_tpu.tracer.native import trace_program_native
    state, py = traced
    nat = trace_program_native(_guest(state), layout=L)
    assert nat.length == py.length
    for col in py.columns:
        assert (nat.columns[col] == py.columns[col]).all(), col


def test_keccak_inline_prove_verify(traced):
    from jolt_tpu.prover import prove
    from jolt_tpu.verifier import verify
    from jolt_tpu.verifier.verifier import PublicIO
    state, tr = traced
    proof = prove(tr)
    assert verify(proof, PublicIO.from_trace(tr))
