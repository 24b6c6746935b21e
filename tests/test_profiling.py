"""Span profiler (utils/profiling.py): nesting, timing, reports, prover
integration via JOLT_TPU_PROFILE."""
import json
import time

from jolt_tpu.utils.profiling import Profiler


def test_spans_nest_and_time():
    prof = Profiler(track_memory=False)
    with prof.span("outer"):
        with prof.span("inner"):
            time.sleep(0.01)
        with prof.span("inner"):
            time.sleep(0.01)
    assert len(prof.roots) == 1
    outer = prof.roots[0]
    assert [c.name for c in outer.children] == ["inner", "inner"]
    assert outer.wall_s >= 0.02
    assert prof.total("inner") >= 0.02
    assert "outer" in prof.report()
    tree = json.loads(prof.to_json())
    assert tree[0]["name"] == "outer"
    assert len(tree[0]["children"]) == 2


def test_disabled_profiler_is_noop():
    prof = Profiler(enabled=False)
    with prof.span("x"):
        pass
    assert prof.roots == []


def test_prover_emits_stage_spans(monkeypatch):
    import jolt_tpu.utils.profiling as profiling
    from jolt_tpu.prover.prover import prove
    from jolt_tpu.riscv.emulator import MemoryLayout
    from jolt_tpu.tracer.trace import trace_program

    prof = Profiler(track_memory=False)
    monkeypatch.setattr(profiling, "PROFILER", prof)

    L = MemoryLayout(max_input_size=64, max_output_size=64)
    guest = f"""
        li   a1, 2
        li   a2, 3
        add  a3, a1, a2
        li   t0, {L.output_start}
        sd   a3, 0(t0)
        li   t1, {L.termination}
        li   t2, 1
        sd   t2, 0(t1)
    """
    tr = trace_program(guest, layout=L, min_padded=16)
    prove(tr)
    names = [s.name for s in prof.roots]
    assert "stage1-spartan" in names
    assert "stage8-reduction" in names
    assert prof.total("stage1-spartan") > 0
