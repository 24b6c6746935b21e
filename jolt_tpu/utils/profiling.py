"""Span-based profiling: nested wall-clock spans + device-memory watermarks.

TPU-native analog of the reference's span machinery
(`crates/jolt-profiling/src/lib.rs`: `#[tracing::instrument]` spans,
flamegraph export, the `--profile` CLI path).  Design differences forced by
the platform:

  * XLA dispatch is asynchronous -- a span around a jitted call measures
    enqueue time unless the caller forces the result.  Spans therefore
    record wall time as observed by the HOST (which is what the prover's
    throughput is made of: the per-stage fetch is the synchronization
    point), plus jax device-memory stats where the backend exposes them.
  * No global subscriber: an explicit `Profiler` object threads through
    (or the module-level `PROFILER` enabled via JOLT_TPU_PROFILE=1), so
    nothing is paid when disabled.

Output: a tree of spans with {name, start, wall_s, hbm_peak_bytes?} --
`report()` renders a indented text profile, `to_json()` a machine-readable
dump (the CLI writes it next to the proof with --profile).
"""

from __future__ import annotations

import json
import os
import time
from contextlib import contextmanager
from dataclasses import dataclass, field
from typing import List, Optional


def _device_mem_bytes() -> Optional[int]:
    """Live bytes on device 0, when the backend exposes memory_stats
    (XLA:TPU does; XLA:CPU returns None)."""
    try:
        import jax
        stats = jax.devices()[0].memory_stats()
        if stats:
            return int(stats.get("bytes_in_use", 0)) or None
    except Exception:
        pass
    return None


@dataclass
class Span:
    name: str
    start: float
    wall_s: float = 0.0
    hbm_enter: Optional[int] = None
    hbm_exit: Optional[int] = None
    children: List["Span"] = field(default_factory=list)

    def as_dict(self) -> dict:
        d = {"name": self.name, "wall_s": round(self.wall_s, 4)}
        if self.hbm_exit is not None:
            d["hbm_bytes"] = self.hbm_exit
        if self.children:
            d["children"] = [c.as_dict() for c in self.children]
        return d


class Profiler:
    """Nested span recorder.  Usage:

        prof = Profiler(enabled=True)
        with prof.span("stage1"):
            with prof.span("message"):
                ...
        print(prof.report())
    """

    def __init__(self, enabled: bool = True, track_memory: bool = True):
        self.enabled = enabled
        self.track_memory = track_memory
        self.roots: List[Span] = []
        self._stack: List[Span] = []

    @contextmanager
    def span(self, name: str):
        if not self.enabled:
            yield
            return
        s = Span(name, time.perf_counter())
        if self.track_memory:
            s.hbm_enter = _device_mem_bytes()
        (self._stack[-1].children if self._stack else self.roots).append(s)
        self._stack.append(s)
        try:
            yield s
        finally:
            self._stack.pop()
            s.wall_s = time.perf_counter() - s.start
            if self.track_memory:
                s.hbm_exit = _device_mem_bytes()

    # ---- reporting -------------------------------------------------------

    def report(self) -> str:
        lines: List[str] = []

        def walk(s: Span, depth: int):
            mem = ""
            if s.hbm_exit is not None:
                mem = f"  hbm={s.hbm_exit / 2**20:.0f}MB"
                if s.hbm_enter is not None:
                    mem += f" (+{(s.hbm_exit - s.hbm_enter) / 2**20:.0f})"
            lines.append(f"{'  ' * depth}{s.name}: {s.wall_s:.3f}s{mem}")
            for c in s.children:
                walk(c, depth + 1)

        for r in self.roots:
            walk(r, 0)
        return "\n".join(lines)

    def to_json(self) -> str:
        return json.dumps([r.as_dict() for r in self.roots], indent=1)

    def dump(self, path: str) -> None:
        with open(path, "w") as f:
            f.write(self.to_json())

    def total(self, name: str) -> float:
        """Sum of wall_s over all spans with this name (any depth)."""
        acc = 0.0

        def walk(s: Span):
            nonlocal acc
            if s.name == name:
                acc += s.wall_s
            for c in s.children:
                walk(c)

        for r in self.roots:
            walk(r)
        return acc


_NULL = Profiler(enabled=False)
PROFILER: Profiler = (Profiler() if os.environ.get("JOLT_TPU_PROFILE")
                      else _NULL)


def active() -> Profiler:
    """The process-wide profiler (null object when disabled)."""
    return PROFILER


def enable() -> Profiler:
    """Turn on the process-wide profiler (used by the CLI's --profile)."""
    global PROFILER
    if not PROFILER.enabled:
        PROFILER = Profiler()
    return PROFILER
