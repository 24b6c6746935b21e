"""Backend slot registry: the jolt-kernels seam (lib.rs:1-36).

Invariant 8 (specs/clean-slate-prover.md:226-233): proof bytes are a
function of (guest, inputs, config) alone -- swapping a slot's
implementation or forcing a slot onto the host tier must emit the
IDENTICAL proof."""
import pytest

from jolt_tpu.kernels import JoltBackend, SLOTS, get_backend, set_backend
from jolt_tpu.proof_io import serialize_proof
from jolt_tpu.prover import prove
from jolt_tpu.riscv.emulator import MemoryLayout
from jolt_tpu.tracer import trace_program

L = MemoryLayout(max_input_size=64, max_output_size=64)

GUEST = f"""
    li   a0, 6
    li   a1, 7
    mul  a2, a0, a1
    li   t0, {L.output_start}
    sd   a2, 0(t0)
    li   t1, {L.termination}
    li   t2, 1
    sd   t2, 0(t1)
"""


def test_slot_inventory_covers_reference():
    """Every jolt-kernels reference slot module has a registry row."""
    import os
    ref = "/root/reference/crates/jolt-kernels/src/reference"
    if os.path.isdir(ref):
        expected = {f[:-3] for f in os.listdir(ref)
                    if f.endswith(".rs") and f not in ("mod.rs", "views.rs")}
        assert expected <= set(SLOTS), expected - set(SLOTS)


def test_default_backend_resolves_class_slots():
    b = JoltBackend.default()
    # every class-backed slot's lazy target imports and is a class
    import importlib
    for name, factory in b.factories.items():
        mod_name, cls_name = factory.target.split(":")
        cls = getattr(importlib.import_module(f"jolt_tpu.{mod_name}"),
                      cls_name)
        assert isinstance(cls, type), name


def test_backend_invariance_host_forced_slots():
    """Forcing slots onto the host tier must not change proof bytes."""
    tr = trace_program(GUEST, layout=L)
    set_backend(None)
    base = serialize_proof(prove(tr))
    try:
        forced = (JoltBackend.default()
                  .with_tier("registers_read_write", "host")
                  .with_tier("booleanity", "host")
                  .with_tier("spartan_outer", "host"))
        set_backend(forced)
        alt = serialize_proof(prove(tr))
    finally:
        set_backend(None)
    assert alt == base


def test_swapped_slot_implementation():
    """A swapped (wrapped) slot implementation produces identical bytes
    and records that it was exercised."""
    from jolt_tpu.relations.ram_sparse import SparseRegistersReadWriteChecking
    calls = []

    def wrapped(*args, **kwargs):
        calls.append(1)
        return SparseRegistersReadWriteChecking(*args, **kwargs)

    tr = trace_program(GUEST, layout=L)
    set_backend(None)
    base = serialize_proof(prove(tr))
    try:
        set_backend(JoltBackend.default().with_slot(
            "registers_read_write", wrapped))
        alt = serialize_proof(prove(tr))
    finally:
        set_backend(None)
    assert calls and alt == base
