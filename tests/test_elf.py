"""ELF loader gates: parse/load/trace/prove an ELF guest.

Mirrors the reference's ELF decode path
(`crates/jolt-program/src/image/elf.rs:29`): PT_LOAD segments -> memory
image + e_entry.  Without a cross toolchain in the image, executables are
produced by the built-in minimal ELF writer around assembler output --
which exercises the identical parse/load path a GCC-built static guest
takes.
"""
import struct

import pytest

from jolt_tpu.riscv.assembler import assemble
from jolt_tpu.riscv.elf import ElfError, is_elf, load_elf, write_elf
from jolt_tpu.riscv.emulator import MemoryLayout
from jolt_tpu.tracer import trace_program
from jolt_tpu.tracer.native import trace_program_native

L = MemoryLayout(max_input_size=64, max_output_size=64)
BASE = 0x80000000


def _guest_with_rodata():
    """Entry point NOT at the image base, and a .rodata word the guest
    loads through the RAM argument (public initial image)."""
    data_addr = BASE + 512  # one data dword well past the code
    return f"""
    ld   t0, 0(t1)           # t1 = data_addr (set by start below)
    addi t0, t0, 5
    li   t2, {L.output_start}
    sd   t0, 0(t2)
halt:
    j    halt                # reference-style jump-to-self termination
""", data_addr


def _build_elf():
    body, data_addr = _guest_with_rodata()
    # start stub placed AFTER the data word: set t1 then jump to body? --
    # simpler: body at base, data word appended, entry at base.
    src = f"""
    li   t1, {data_addr}
""" + body
    code = assemble(src, base=BASE)
    # append the .rodata dword (data_addr must match)
    n = len(code) // 4
    pad = (data_addr - BASE) - len(code)
    assert pad >= 0
    code += b"\x00" * pad + struct.pack("<Q", 0xCAFE)
    return write_elf(code, BASE, entry=BASE)


def test_roundtrip_writer_loader():
    elf = _build_elf()
    assert is_elf(elf)
    loaded = load_elf(elf)
    assert loaded.base == BASE
    assert loaded.entry == BASE
    assert struct.pack("<Q", 0xCAFE) in loaded.image


def test_reject_non_riscv():
    elf = bytearray(_build_elf())
    elf[18] = 62  # EM_X86_64
    with pytest.raises(ElfError):
        load_elf(bytes(elf))


def test_trace_elf_guest_reads_rodata():
    elf = _build_elf()
    tr = trace_program(elf, layout=L)
    assert bytes(tr.device.outputs)[:8] == struct.pack("<Q", 0xCAFE + 5)
    # native tracer agrees bit-for-bit
    tn = trace_program_native(elf, layout=L)
    for name in tr.columns:
        assert (tr.columns[name] == tn.columns[name]).all(), name


def test_prove_verify_elf_guest():
    from jolt_tpu.prover import prove
    from jolt_tpu.verifier import verify
    from jolt_tpu.verifier.verifier import PublicIO
    elf = _build_elf()
    tr = trace_program(elf, layout=L)
    proof = prove(tr)
    assert verify(proof, PublicIO.from_trace(tr))


def test_entry_mid_image():
    """e_entry pointing past a data preamble (start != base)."""
    src = f"""
    li   t2, {L.output_start}
    li   t0, 77
    sd   t0, 0(t2)
    li   t3, {L.termination}
    li   t4, 1
    sd   t4, 0(t3)
"""
    code = assemble(src, base=BASE + 8)
    image = struct.pack("<Q", 0xDEAD) + code  # 8 data bytes, then text
    elf = write_elf(image, BASE, entry=BASE + 8)
    tr = trace_program(elf, layout=L)
    assert tr.program.start == BASE + 8
    assert bytes(tr.device.outputs)[:8] == struct.pack("<Q", 77)
