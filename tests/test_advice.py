"""Trusted/untrusted advice pipeline: guest-visible advice regions,
committed advice polynomials, selector-scaled Init openings, stage-8
reduction membership, and tamper rejection.

Reference: `zkvm/prover.rs:806-860` (advice commitment),
`zkvm/ram/mod.rs` compute_advice_selector / reconstruct_full_eval,
`zkvm/claim_reductions/advice.rs` (here subsumed by the stage-8 joint
opening's zero-padding embedding).
"""
import pytest

from jolt_tpu.prover import prove
from jolt_tpu.riscv.emulator import MemoryLayout
from jolt_tpu.tracer import trace_program
from jolt_tpu.verifier import VerificationError, verify
from jolt_tpu.verifier.verifier import PublicIO

L = MemoryLayout(max_input_size=64, max_output_size=64,
                 max_trusted_advice_size=32, max_untrusted_advice_size=16)

TRUSTED = (11).to_bytes(8, "little") + (22).to_bytes(8, "little") \
    + (33).to_bytes(8, "little") + (44).to_bytes(8, "little")
UNTRUSTED = (100).to_bytes(8, "little") + (200).to_bytes(8, "little")

# guest: sum all six advice dwords, write the total
SRC = f"""
    li   t0, {L.trusted_advice_start}
    ld   a0, 0(t0)
    ld   a1, 8(t0)
    add  a0, a0, a1
    ld   a1, 16(t0)
    add  a0, a0, a1
    ld   a1, 24(t0)
    add  a0, a0, a1
    li   t0, {L.untrusted_advice_start}
    ld   a1, 0(t0)
    add  a0, a0, a1
    ld   a1, 8(t0)
    add  a0, a0, a1
    li   t1, {L.output_start}
    sd   a0, 0(t1)
    li   t2, {L.termination}
    li   t3, 1
    sd   t3, 0(t2)
"""


@pytest.fixture(scope="module")
def advice_proof():
    tr = trace_program(SRC, layout=L, trusted_advice=TRUSTED,
                       untrusted_advice=UNTRUSTED)
    want = 11 + 22 + 33 + 44 + 100 + 200
    assert int.from_bytes(bytes(tr.device.outputs[:8]), "little") == want
    return tr, prove(tr)


def test_advice_layout_subcubes():
    from jolt_tpu.witness.ram import advice_subcube, remap_address
    wb = L.witness_base
    # trusted (larger) first, both size-aligned in k-space
    a_t, pfx_t = advice_subcube(L, "trusted", 12)
    a_u, pfx_u = advice_subcube(L, "untrusted", 12)
    assert a_t == 2 and a_u == 1
    k_t = remap_address(L.trusted_advice_start, wb)
    k_u = remap_address(L.untrusted_advice_start, wb)
    assert k_t % 4 == 0 and k_u % 2 == 0
    assert (pfx_t << a_t) == k_t and (pfx_u << a_u) == k_u


def test_advice_prove_verify(advice_proof):
    tr, proof = advice_proof
    assert set(proof.advice_openings) == {"trusted", "untrusted"}
    assert verify(proof, PublicIO.from_trace(tr))


def test_advice_native_tracer_bit_identical():
    from jolt_tpu.tracer.native import trace_program_native
    py = trace_program(SRC, layout=L, trusted_advice=TRUSTED,
                       untrusted_advice=UNTRUSTED)
    nat = trace_program_native(SRC, layout=L, trusted_advice=TRUSTED,
                               untrusted_advice=UNTRUSTED)
    assert nat.length == py.length
    for col in py.columns:
        assert (nat.columns[col] == py.columns[col]).all(), col
    assert bytes(nat.device.outputs) == bytes(py.device.outputs)


def test_advice_opening_tamper_rejected(advice_proof):
    import dataclasses
    tr, proof = advice_proof
    bad = dataclasses.replace(
        proof, advice_openings={**proof.advice_openings,
                                "trusted": (proof.advice_openings["trusted"]
                                            + 1) % (2**255)})
    with pytest.raises(VerificationError):
        verify(bad, PublicIO.from_trace(tr))


def test_advice_missing_opening_rejected(advice_proof):
    import dataclasses
    tr, proof = advice_proof
    bad = dataclasses.replace(proof, advice_openings={})
    with pytest.raises(VerificationError):
        verify(bad, PublicIO.from_trace(tr))


def test_advice_sdk_roundtrip():
    """provable(max_*_advice_size=...) -> prove_fn(inputs, advice...)."""
    from jolt_tpu.sdk import provable
    guest = provable(SRC, max_trusted_advice_size=32,
                     max_untrusted_advice_size=16)
    prove_fn = guest.build_prover()
    verify_fn = guest.build_verifier()
    out, proof = prove_fn(b"", TRUSTED, UNTRUSTED)
    assert int.from_bytes(out.outputs[:8], "little") == 410
    assert verify_fn(b"", out.outputs, out.panic, proof)


def test_advice_proof_roundtrips_serialization(advice_proof):
    from jolt_tpu.proof_io import deserialize_proof, serialize_proof
    tr, proof = advice_proof
    blob = serialize_proof(proof, {"outputs": bytes(tr.device.outputs)})
    proof2, stmt = deserialize_proof(blob)
    assert proof2.advice_openings == proof.advice_openings
    assert verify(proof2, PublicIO.from_trace(tr))
