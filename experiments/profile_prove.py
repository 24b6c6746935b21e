"""Profiled e2e prove on TPU: bench.py's workload + span report.

Usage: JOLT_TPU_PROFILE=1 python experiments/profile_prove.py [chain]
Prints the span tree for BOTH the cold (compile) and warm prove, plus the
warm-run throughput, so kernel work can be aimed at the dominant stages.
"""
import importlib.util
import os
import pathlib
import sys
import time

os.environ.setdefault("JOLT_TPU_PROFILE", "1")

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

from jolt_tpu.pcs.dory import DorySetup
from jolt_tpu.prover.prover import prove
from jolt_tpu.riscv.emulator import MemoryLayout
from jolt_tpu.tracer.native import trace_program_native
from jolt_tpu.utils import profiling
from jolt_tpu.utils.env import ensure_map_count


def _guest(layout, chain):
    spec = importlib.util.spec_from_file_location(
        "gen_sha256",
        pathlib.Path(__file__).resolve().parents[1] / "examples" / "gen_sha256.py")
    gen = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(gen)
    return gen.emit_inline(input_start=layout.input_start,
                           output_start=layout.output_start,
                           termination=layout.termination, chain=chain)


def main():
    chain = int(sys.argv[1]) if len(sys.argv) > 1 else 114
    ensure_map_count()
    layout = MemoryLayout(max_input_size=64, max_output_size=64)
    t0 = time.perf_counter()
    tr = trace_program_native(_guest(layout, chain), layout=layout,
                              inputs=bytes(range(32)))
    print(f"trace: {tr.length} cycles (padded {tr.padded_length}), "
          f"{time.perf_counter() - t0:.1f}s", flush=True)
    n_max = 256 * tr.padded_length
    setup = DorySetup.generate(n_max.bit_length() - 1)
    print("setup done", flush=True)

    prof = profiling.enable()
    t0 = time.perf_counter()
    prove(tr, setup=setup)
    print(f"\n=== COLD prove: {time.perf_counter() - t0:.1f}s ===",
          flush=True)
    print(prof.report(), flush=True)

    prof.roots.clear()
    t0 = time.perf_counter()
    prove(tr, setup=setup)
    dt = time.perf_counter() - t0
    print(f"\n=== WARM prove: {dt:.1f}s  ({tr.length / dt:.1f} cycles/s) ===",
          flush=True)
    print(prof.report(), flush=True)


if __name__ == "__main__":
    main()
