"""SHA-256 guest (examples/sha256.s): the BASELINE ladder's sha2-ex analog.

The reference's sha2-ex example hashes a 32-byte buffer in guest Rust; here
the same workload runs as hand-assembled RV64IM (examples/gen_sha256.py).
The digest test is the correctness oracle (hashlib); the prove test runs
the full pipeline on the ~13.5k-cycle (padded 2^14) trace and is gated
behind JOLT_TPU_SCALE=1 like the other big-shape tests.
"""

import hashlib
import os
import pathlib

import pytest

from jolt_tpu.riscv.emulator import MemoryLayout
from jolt_tpu.tracer.trace import trace_program

SRC = (pathlib.Path(__file__).parent.parent / "examples" / "sha256.s")
L = MemoryLayout(max_input_size=64, max_output_size=64)


def _trace(msg: bytes):
    return trace_program(SRC.read_text(), layout=L, inputs=msg)


@pytest.mark.parametrize("msg", [bytes(range(32)),
                                 hashlib.sha256(b"jolt").digest()])
def test_sha256_guest_digest(msg):
    tr = _trace(msg)
    assert bytes(tr.device.outputs[:32]) == hashlib.sha256(msg).digest()
    assert not tr.device.panic


def test_sha256_guest_regenerates():
    """examples/sha256.s must match its generator (no hand edits)."""
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "gen_sha256", SRC.parent / "gen_sha256.py")
    gen = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(gen)
    assert SRC.read_text() == gen.emit()


@pytest.mark.skipif(os.environ.get("JOLT_TPU_SCALE") != "1",
                    reason="full 2^14 sha256 prove: set JOLT_TPU_SCALE=1")
def test_sha256_guest_proves():
    from jolt_tpu.prover.prover import prove
    from jolt_tpu.verifier.verifier import PublicIO, verify
    tr = _trace(bytes(range(32)))
    proof = prove(tr)
    assert verify(proof, PublicIO.from_trace(tr))
