"""Eval/fuzz framework (jolt_tpu/eval): pinned-seed invariant checks.

The framework generates random terminating RV64IM guests and checks
differential tracing (Python vs C++), R1CS satisfaction, and prove/verify
round trips with tamper rejection.  `python -m jolt_tpu.eval.fuzz N seed`
runs open-ended campaigns; the suite pins seeds for determinism.
"""
import pytest

from jolt_tpu.eval.fuzz import (check_invariants, gen_program,
                                run_differential, run_fuzz_case)


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_differential_tracing(seed):
    run_differential(seed, n_instr=60)


def test_invariants_on_random_guest():
    import random

    from jolt_tpu.riscv.emulator import MemoryLayout
    from jolt_tpu.tracer import trace_program

    layout = MemoryLayout(max_input_size=64, max_output_size=64)
    guest = gen_program(random.Random(7), 50, layout)
    tr = trace_program(guest, layout=layout, min_padded=16)
    assert check_invariants(tr) == []


def test_fuzz_prove_verify_with_tamper():
    run_fuzz_case(11, n_instr=25, tamper=True)
