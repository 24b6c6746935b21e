"""RAM Twist witness extraction sanity + full pipeline with RAM stages."""
import pytest

from jolt_tpu.field.params import FR
from jolt_tpu.riscv.emulator import MemoryLayout
from jolt_tpu.tracer import trace_program
from jolt_tpu.witness.ram import extract_ram_witness, remap_address

P = FR.modulus
L = MemoryLayout()

RAM_GUEST = f"""
    li   t0, {L.input_start}
    ld   a0, 0(t0)           # read input
    li   t1, 0x80001000
    sd   a0, 0(t1)           # store
    ld   a1, 0(t1)           # load back
    addi a1, a1, 5
    sd   a1, 8(t1)           # second cell
    ld   a2, 8(t1)
    li   s0, {L.output_start}
    sd   a2, 0(s0)
    li   t2, {L.termination}
    li   t3, 1
    sd   t3, 0(t2)
"""


def test_ram_witness_consistency():
    tr = trace_program(RAM_GUEST, inputs=(37).to_bytes(8, "little"))
    wit = extract_ram_witness(tr)
    T, K = wit.T, wit.K
    # every cycle has exactly one ra
    for j in range(T):
        row = wit.ra[j * K:(j + 1) * K]
        assert sum(row) == 1
    # read-value identity: sum_k ra*val == ram_pre for every access cycle
    import numpy as np
    lo, hi = tr.u64_col("ram_pre")
    pre = (lo.astype(np.uint64) | (hi.astype(np.uint64) << np.uint64(32))).tolist()
    lo2, hi2 = tr.u64_col("ram_addr")
    addr = (lo2.astype(np.uint64) | (hi2.astype(np.uint64) << np.uint64(32))).tolist()
    for j in range(T):
        k = remap_address(addr[j], wit.witness_base)
        rv = sum(wit.ra[j * K + kk] * wit.val[j * K + kk] for kk in range(K)) % P
        if k:
            assert rv == pre[j] % P, f"cycle {j}"
    # inputs appear in the initial image
    assert 1 in wit.init_vals and wit.init_vals[1] == 37
