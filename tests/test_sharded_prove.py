"""Backend invariance: proof bytes must be identical on 1 device and on the
8-device virtual CPU mesh (the reference's invariant 8, "backend-invariant
proof bytes", specs/clean-slate-prover.md:226-233; SURVEY.md §4.9).

The REAL prover runs under `use_mesh`: witness arrays are created with
their cycle/entry axis sharded over the mesh and GSPMD inserts the
collectives.  Field arithmetic is exact mod-p, so any divergence is a bug,
not noise.
"""

import pickle

import jax
import pytest

from jolt_tpu.parallel.mesh import cycle_mesh, use_mesh
from jolt_tpu.prover.prover import prove
from jolt_tpu.riscv.emulator import MemoryLayout
from jolt_tpu.tracer.trace import trace_program
from jolt_tpu.verifier.verifier import PublicIO, verify

L = MemoryLayout(max_input_size=64, max_output_size=64)

GUEST = f"""
    li   a1, 5
    li   a2, 9
    add  a3, a1, a2
    xor  a4, a1, a2
    li   t0, {L.output_start}
    sd   a3, 0(t0)
    li   t1, {L.termination}
    li   t2, 1
    sd   t2, 0(t1)
"""


def test_proof_bytes_mesh_invariant():
    assert len(jax.devices()) >= 8, "conftest forces an 8-device CPU mesh"
    tr = trace_program(GUEST, layout=L, min_padded=16)

    single = prove(tr)
    with use_mesh(cycle_mesh(8)):
        sharded = prove(tr)

    assert pickle.dumps(single) == pickle.dumps(sharded), \
        "proof bytes depend on the sharding (invariant 8 violated)"
    assert verify(sharded, PublicIO.from_trace(tr))
