"""Trace checkpoint/resume (tracer/trace_io.py): a saved + reloaded trace
must prove to byte-identical proof bytes."""
import numpy as np

from jolt_tpu.riscv.emulator import MemoryLayout
from jolt_tpu.tracer.trace import trace_program
from jolt_tpu.tracer.trace_io import load_trace, save_trace

L = MemoryLayout(max_input_size=64, max_output_size=64)

GUEST = f"""
    li   a1, 6
    li   a2, 7
    mul  a3, a1, a2
    li   t0, {L.output_start}
    sd   a3, 0(t0)
    li   t1, {L.termination}
    li   t2, 1
    sd   t2, 0(t1)
"""


def test_trace_roundtrip(tmp_path):
    tr = trace_program(GUEST, layout=L, min_padded=16)
    p = str(tmp_path / "t.npz")
    save_trace(tr, p)
    tr2 = load_trace(p)

    assert tr2.length == tr.length
    assert tr2.padded_length == tr.padded_length
    assert tr2.entry == tr.entry
    assert tr2.code == tr.code
    assert bytes(tr2.device.outputs) == bytes(tr.device.outputs)
    assert tr2.device.panic == tr.device.panic
    assert set(tr2.columns) == set(tr.columns)
    for k in tr.columns:
        assert np.array_equal(tr2.columns[k], tr.columns[k]), k
    assert tr2.program.n_rows == tr.program.n_rows


def test_reloaded_trace_proves_identically(tmp_path):
    import pickle

    from jolt_tpu.prover import prove
    from jolt_tpu.verifier import verify
    from jolt_tpu.verifier.verifier import PublicIO

    tr = trace_program(GUEST, layout=L, min_padded=16)
    p = str(tmp_path / "t.npz")
    save_trace(tr, p)
    tr2 = load_trace(p)

    proof1 = prove(tr)
    proof2 = prove(tr2)
    assert pickle.dumps(proof1) == pickle.dumps(proof2)
    assert verify(proof2, PublicIO.from_trace(tr2))
