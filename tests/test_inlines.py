"""SHA-256 INLINE expansion: digest correctness, cycle-count reduction,
native-tracer bit-identity, and prove/verify round-trip with the new
rotate/andn lookup tables.

Reference: `jolt-inlines/sha2/src/sequence_builder.rs` (expansion),
`book/src/how/optimizations/inlines.md:132-140` (5.9x cycle reduction).
"""
import hashlib
import importlib.util
import pathlib

import pytest

from jolt_tpu.riscv.emulator import MemoryLayout
from jolt_tpu.tracer import trace_program

L = MemoryLayout(max_input_size=64, max_output_size=64)
MSG = bytes(range(32))


def _gen():
    spec = importlib.util.spec_from_file_location(
        "gen_sha256",
        pathlib.Path(__file__).parent.parent / "examples" / "gen_sha256.py")
    gen = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(gen)
    return gen


def _inline_src(chain: int) -> str:
    return _gen().emit_inline(
        input_start=L.input_start, output_start=L.output_start,
        termination=L.termination, chain=chain)


def _want(chain: int) -> bytes:
    d = MSG
    for _ in range(chain):
        d = hashlib.sha256(d).digest()
    return d


@pytest.mark.parametrize("chain", [1, 3])
def test_inline_sha256_digest(chain):
    tr = trace_program(_inline_src(chain), layout=L, inputs=MSG)
    assert bytes(tr.device.outputs[:32]) == _want(chain)


def test_inline_cycle_reduction():
    """The point of inlines: >= 4x fewer provable cycles per compression
    than the software guest (reference reports 5.9x vs the sha2 crate)."""
    t1 = trace_program(_inline_src(1), layout=L, inputs=MSG)
    t3 = trace_program(_inline_src(3), layout=L, inputs=MSG)
    per_hash = (t3.length - t1.length) // 2
    gen = _gen()
    soft = trace_program(
        gen.emit(input_start=L.input_start, output_start=L.output_start,
                 termination=L.termination, chain=1),
        layout=L, inputs=MSG)
    assert per_hash * 4 <= soft.length, (per_hash, soft.length)


def test_inline_native_tracer_bit_identical():
    from jolt_tpu.tracer.native import trace_program_native
    src = _inline_src(2)
    py = trace_program(src, layout=L, inputs=MSG)
    nat = trace_program_native(src, layout=L, inputs=MSG)
    assert nat.length == py.length
    for col in py.columns:
        assert (nat.columns[col] == py.columns[col]).all(), col
    assert bytes(nat.device.outputs) == bytes(py.device.outputs)


def test_inline_prove_verify():
    from jolt_tpu.prover import prove
    from jolt_tpu.verifier import verify
    from jolt_tpu.verifier.verifier import PublicIO
    tr = trace_program(_inline_src(1), layout=L, inputs=MSG)
    proof = prove(tr)
    assert verify(proof, PublicIO.from_trace(tr))


# ---------------------------------------------------------------------------
# Blake2b inline (jolt-inlines/blake2 analog)
# ---------------------------------------------------------------------------

def _gen_blake2b():
    spec = importlib.util.spec_from_file_location(
        "gen_blake2b",
        pathlib.Path(__file__).parent.parent / "examples" / "gen_blake2b.py")
    gen = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(gen)
    return gen


def _blake_src(chain: int) -> str:
    return _gen_blake2b().emit_inline(
        input_start=L.input_start, output_start=L.output_start,
        termination=L.termination, chain=chain)


def _blake_want(chain: int) -> bytes:
    d = MSG
    for _ in range(chain):
        d = hashlib.blake2b(d, digest_size=32).digest()
    return d


@pytest.mark.parametrize("chain", [1, 3])
def test_inline_blake2b_digest(chain):
    tr = trace_program(_blake_src(chain), layout=L, inputs=MSG)
    assert bytes(tr.device.outputs[:32]) == _blake_want(chain)


def test_inline_blake2b_cycle_cost():
    """Per-compression cost within 1.5x of the reference blake2 inline
    (340,787 cycles / 32 KB = ~1,331 rows per 128-byte compression,
    inlines.md:138)."""
    t1 = trace_program(_blake_src(1), layout=L, inputs=MSG)
    t5 = trace_program(_blake_src(5), layout=L, inputs=MSG)
    per_link = (t5.length - t1.length) / 4
    assert per_link < 1331 * 1.5, f"blake2b link costs {per_link} rows"


def test_inline_blake2b_native_tracer_bit_identical():
    from jolt_tpu.tracer.native import trace_program_native
    src = _blake_src(2)
    a = trace_program(src, layout=L, inputs=MSG)
    b = trace_program_native(src, layout=L, inputs=MSG)
    assert a.length == b.length
    assert bytes(b.device.outputs[:32]) == _blake_want(2)


def test_inline_blake2b_prove_verify():
    from jolt_tpu.prover import prove
    from jolt_tpu.verifier import verify
    from jolt_tpu.verifier.verifier import PublicIO
    tr = trace_program(_blake_src(1), layout=L, inputs=MSG)
    proof = prove(tr)
    assert verify(proof, PublicIO.from_trace(tr))
