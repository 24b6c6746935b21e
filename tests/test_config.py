"""Proof-carried config ladder: constructor defaults, validation errors,
verifier-side rejection of tampered configs, wire round-trip.

Mirrors the reference's config validation surface
(`zkvm/config.rs:95-210`: ReadWriteConfig/OneHotConfig `validate()`,
called by the verifier before any expectation is derived)."""
import copy

import pytest

from jolt_tpu.config import (ConfigError, OneHotConfig, ProofConfig,
                             ReadWriteConfig)
from jolt_tpu.prover import prove
from jolt_tpu.riscv.emulator import MemoryLayout
from jolt_tpu.tracer import trace_program
from jolt_tpu.verifier import VerificationError, verify
from jolt_tpu.verifier.verifier import PublicIO

L = MemoryLayout(max_input_size=64, max_output_size=64)

HALT = f"""
    li   a0, 5
    li   a1, 7
    add  a2, a0, a1
    li   t0, {L.output_start}
    sd   a2, 0(t0)
    li   t1, {L.termination}
    li   t2, 1
    sd   t2, 0(t1)
"""


# ---------------------------------------------------------------------------
# unit validation
# ---------------------------------------------------------------------------

def test_defaults_validate():
    cfg = ProofConfig.new(log_T=16, ram_log_K=20)
    cfg.validate(16, 20)   # no raise
    d = cfg.as_dict()
    assert ProofConfig.from_dict(d).as_dict() == d


@pytest.mark.parametrize("field,delta,err", [
    ("ram_rw_phase1_num_rounds", +1, "exceeds log_T"),
    ("ram_rw_phase2_num_rounds", +1, "exceeds ram_log_K"),
    ("registers_rw_phase1_num_rounds", +1, "exceeds log_T"),
    ("registers_rw_phase2_num_rounds", +1, "exceeds log_register_count"),
])
def test_readwrite_bounds(field, delta, err):
    cfg = ReadWriteConfig.new(16, 20)
    setattr(cfg, field, getattr(cfg, field) + delta)
    with pytest.raises(ConfigError, match=err):
        cfg.validate(16, 20)


def test_onehot_chunk_must_be_4_or_8():
    cfg = OneHotConfig.new(16)
    cfg.log_k_chunk = 5
    with pytest.raises(ConfigError, match="must be either 4 or 8"):
        cfg.validate()


def test_onehot_virtual_chunk_divisibility():
    cfg = OneHotConfig.new(16)
    cfg.lookups_ra_virtual_log_k_chunk = 4   # < log_k_chunk (8)
    with pytest.raises(ConfigError, match=">= log_k_chunk"):
        cfg.validate()
    cfg.lookups_ra_virtual_log_k_chunk = 256
    with pytest.raises(ConfigError, match="<= LOG_K"):
        cfg.validate()
    cfg.lookups_ra_virtual_log_k_chunk = 12  # not a multiple of 8
    with pytest.raises(ConfigError, match="multiple of log_k_chunk"):
        cfg.validate()


def test_missing_field_rejected():
    d = ProofConfig.new(16, 20).as_dict()
    del d["log_k_chunk"]
    with pytest.raises(ConfigError, match="missing field"):
        ProofConfig.from_dict(d)


# ---------------------------------------------------------------------------
# verifier-side rejection (tamper suite)
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def halt_proof():
    tr = trace_program(HALT, layout=L)
    return tr, prove(tr)


def test_proof_carries_config(halt_proof):
    tr, proof = halt_proof
    assert proof.config["log_k_chunk"] == 8
    assert verify(proof, PublicIO.from_trace(tr))


@pytest.mark.parametrize("mutate", [
    lambda c: c.__setitem__("log_k_chunk", 5),
    lambda c: c.__setitem__("ram_rw_phase2_num_rounds",
                            c["ram_rw_phase2_num_rounds"] + 1),
    lambda c: c.__setitem__("registers_rw_phase1_num_rounds",
                            c["registers_rw_phase1_num_rounds"] + 3),
    lambda c: c.__setitem__("dory_layout", 9),
    lambda c: c.pop("dory_layout"),
])
def test_tampered_config_rejected(halt_proof, mutate):
    tr, proof = halt_proof
    bad = copy.deepcopy(proof)
    mutate(bad.config)
    with pytest.raises(VerificationError, match="config"):
        verify(bad, PublicIO.from_trace(tr))


def test_config_survives_serialization(halt_proof):
    from jolt_tpu.proof_io import deserialize_proof, serialize_proof
    tr, proof = halt_proof
    blob = serialize_proof(proof)
    back, _ = deserialize_proof(blob)
    assert back.config == proof.config
    assert verify(back, PublicIO.from_trace(tr))
