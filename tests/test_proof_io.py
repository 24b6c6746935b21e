"""Canonical proof serialization gates: byte-stable, pickle-free wire
format; proofs survive a (de)serialization roundtrip and still verify;
decoding validates points (on-curve, range)."""
import pytest

from jolt_tpu.field.params import FR
from jolt_tpu.curve import bn254_host as host
from jolt_tpu.proof_io import (ProofDecodeError, dec_g1, deserialize_proof,
                               enc_g1, serialize_proof)
from jolt_tpu.prover import prove
from jolt_tpu.riscv.emulator import MemoryLayout
from jolt_tpu.tracer import trace_program
from jolt_tpu.verifier import verify
from jolt_tpu.verifier.verifier import PublicIO

P = FR.modulus
L = MemoryLayout(max_input_size=64, max_output_size=64)

GUEST = f"""
    li   t0, 123
    li   t1, 45
    mul  t2, t0, t1
    srl  t3, t2, t1
    div  t4, t2, t0
    li   t5, {L.output_start}
    sd   t2, 0(t5)
    li   t5, {L.termination}
    li   t6, 1
    sd   t6, 0(t5)
"""


@pytest.fixture(scope="module")
def dory_proof():
    from jolt_tpu.pcs import DorySetup
    tr = trace_program(GUEST, layout=L, min_padded=16)
    # size the transparent setup for the largest committed vector
    from jolt_tpu.witness.registers import extract_register_log
    n_max = 256 * tr.padded_length
    setup = DorySetup.generate(n_max.bit_length() - 1)
    proof = prove(tr, setup=setup)
    return tr, proof, setup


def test_g1_compression_roundtrip():
    import random
    rng = random.Random(3)
    pts = [None, host.G1_GEN]
    for _ in range(8):
        pts.append(host.g1_mul(host.G1_GEN, rng.randrange(1, P)))
    for pt in pts:
        raw = enc_g1(pt)
        assert len(raw) == 32
        back, off = dec_g1(memoryview(raw), 0)
        assert off == 32
        assert back == pt


def test_reject_offcurve_g1():
    bad = bytearray(enc_g1(host.G1_GEN))
    bad[0] ^= 1  # perturb x
    with pytest.raises(ProofDecodeError):
        dec_g1(memoryview(bytes(bad)), 0)


def test_roundtrip_and_verify(dory_proof):
    tr, proof, setup = dory_proof
    statement = {"trace_length": tr.length,
                 "padded_length": tr.padded_length,
                 "outputs": bytes(tr.device.outputs),
                 "panic": tr.device.panic}
    blob = serialize_proof(proof, statement)
    assert isinstance(blob, bytes)
    # deterministic bytes
    assert blob == serialize_proof(proof, statement)
    proof2, st2 = deserialize_proof(blob)
    assert st2["outputs"] == statement["outputs"]
    assert proof2.stage1_polys == proof.stage1_polys
    assert proof2.stage8_openings == proof.stage8_openings
    assert verify(proof2, PublicIO.from_trace(tr), setup=setup)


def test_reject_truncated(dory_proof):
    tr, proof, _ = dory_proof
    blob = serialize_proof(proof, {})
    with pytest.raises(Exception):
        deserialize_proof(blob[:-7])
