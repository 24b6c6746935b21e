"""Committed program-image (committed-bytecode) mode.

Reference: `zkvm/claim_reductions/program_image.rs` + `zkvm/prover.rs:2633`.
The image's Val_init contribution becomes a prover scalar claim bound to
an opening of the committed image-words polynomial; the verifier's
per-proof image work drops to an O(log K) carry-DP shifted-eq evaluation."""
import copy
import random

import pytest

from jolt_tpu.field.params import FR
from jolt_tpu.prover import prove
from jolt_tpu.relations.program_image import (eval_shifted_eq, image_words,
                                              shifted_eq_table)
from jolt_tpu.riscv.emulator import MemoryLayout
from jolt_tpu.tracer import trace_program
from jolt_tpu.verifier import VerificationError, verify
from jolt_tpu.verifier.verifier import PublicIO

P = FR.modulus
L = MemoryLayout(max_input_size=64, max_output_size=64)

# a guest that READS ITS OWN CODE through RAM (so the image matters to
# the RAM argument) and returns a checksum
GUEST = f"""
    li   t0, 0x80000000
    ld   a1, 0(t0)
    ld   a2, 8(t0)
    add  a3, a1, a2
    li   t1, {L.output_start}
    sd   a3, 0(t1)
    li   t2, {L.termination}
    li   t3, 1
    sd   t3, 0(t2)
"""


def _eq_pt(r, k):
    v, ell = 1, len(r)
    for i, ri in enumerate(r):
        bit = (k >> (ell - 1 - i)) & 1
        v = v * (ri if bit else (1 - ri) % P) % P
    return v


def test_shifted_eq_matches_bruteforce():
    rng = random.Random(3)
    ell, m = 10, 5
    r = [rng.randrange(P) for _ in range(ell)]
    for start in (0, 24, 37, (1 << ell) - 20):
        tab = shifted_eq_table(r, start, m)
        for j in range(1 << m):
            want = _eq_pt(r, start + j) if start + j < (1 << ell) else 0
            assert tab[j] == want


def test_eval_shifted_eq_is_table_mle():
    rng = random.Random(4)
    ell, m = 10, 5
    r = [rng.randrange(P) for _ in range(ell)]
    for start in (0, 37):
        cur = shifted_eq_table(r, start, m)
        rho = [rng.randrange(P) for _ in range(m)]
        for ri in rho:
            half = len(cur) // 2
            cur = [(cur[i] * (1 - ri) + cur[half + i] * ri) % P
                   for i in range(half)]
        assert eval_shifted_eq(r, start, rho) == cur[0]


@pytest.fixture(scope="module")
def ci_proof():
    tr = trace_program(GUEST, layout=L)
    return tr, prove(tr, committed_image=True)


def test_committed_image_roundtrip(ci_proof):
    tr, proof = ci_proof
    assert proof.config["committed_program_image"] == 1
    assert proof.program_image_claim is not None
    assert "program_image_init" in proof.stage7_openings
    assert verify(proof, PublicIO.from_trace(tr))


def test_uncommitted_mode_unchanged(ci_proof):
    tr, _ = ci_proof
    proof = prove(tr)
    assert proof.config["committed_program_image"] == 0
    assert proof.program_image_claim is None
    assert verify(proof, PublicIO.from_trace(tr))


def test_tampered_image_claim_rejected(ci_proof):
    tr, proof = ci_proof
    bad = copy.deepcopy(proof)
    bad.program_image_claim = (bad.program_image_claim + 1) % P
    with pytest.raises(VerificationError):
        verify(bad, PublicIO.from_trace(tr))


def test_tampered_image_opening_rejected(ci_proof):
    tr, proof = ci_proof
    bad = copy.deepcopy(proof)
    bad.stage7_openings["program_image_init"] = \
        (bad.stage7_openings["program_image_init"] + 1) % P
    with pytest.raises(VerificationError):
        verify(bad, PublicIO.from_trace(tr))


def test_serialization_roundtrip(ci_proof):
    from jolt_tpu.proof_io import deserialize_proof, serialize_proof
    tr, proof = ci_proof
    back, _ = deserialize_proof(serialize_proof(proof))
    assert back.program_image_claim == proof.program_image_claim
    assert verify(back, PublicIO.from_trace(tr))


@pytest.mark.slow
def test_committed_image_with_dory():
    """Full PCS path: commitment recomputed+checked by the verifier; a
    wrong-program commitment is rejected."""
    from jolt_tpu.pcs.dory import DorySetup
    from jolt_tpu.prover.prover import required_num_vars
    tr = trace_program(GUEST, layout=L)
    setup = DorySetup.generate(required_num_vars(tr.padded_length, 0, 0))
    proof = prove(tr, setup=setup, committed_image=True)
    assert verify(proof, PublicIO.from_trace(tr), setup=setup)
    # commitment swap -> rejected before any sumcheck work
    bad = copy.deepcopy(proof)
    bad.commitments["program_image"] = bad.commitments["ram_inc"]
    with pytest.raises(VerificationError, match="program_image commitment"):
        verify(bad, PublicIO.from_trace(tr), setup=setup)


def test_image_words_padding():
    assert image_words(b"") == [0]
    w = image_words(bytes(range(24)))
    assert len(w) == 4 and w[3] == 0
    assert w[0] == int.from_bytes(bytes(range(8)), "little")


def test_trusted_commitment_unit():
    """Fast-tier guard on the verifier's recompute-and-compare path: the
    verifier's cached trusted commitment equals the prover-side commit of
    the image-words polynomial, and the cache keys on SETUP IDENTITY (two
    different setups never share a slot)."""
    from jolt_tpu.pcs.dory import DorySetup
    from jolt_tpu.pcs.scheme import make_scheme
    from jolt_tpu.verifier.verifier import (_PI_COMMIT_CACHE,
                                            _program_image_commitment)

    code = bytes(range(64)) * 2
    s_a = make_scheme(DorySetup.generate(6))
    s_b = make_scheme(DorySetup.generate(7))
    _PI_COMMIT_CACHE.clear()
    got_a = _program_image_commitment(s_a, code)
    want_a = s_a.commit("pi_check", image_words(code), bits=254)
    assert got_a == want_a
    # second call is the cached object; a different setup must re-commit
    assert _program_image_commitment(s_a, code) is got_a
    got_b = _program_image_commitment(s_b, code)
    assert got_b == s_b.commit("pi_check", image_words(code), bits=254)
    assert got_a != got_b
    assert len(_PI_COMMIT_CACHE) == 2


def test_commitment_recompute_matches_prover_commit_default_tier():
    """Default-tier guard for the verifier's trusted-commitment path
    (ADVICE r4: the only prior coverage was the slow Dory e2e): the
    verifier's recompute-and-cache helper must return exactly the
    commitment the prover's commit path produces, and the cache must be
    keyed by setup identity (two different setups in one process must
    not share a slot)."""
    from jolt_tpu.pcs.dory import DorySetup
    from jolt_tpu.pcs.scheme import make_scheme
    from jolt_tpu.verifier.verifier import _program_image_commitment

    # image long enough to span multiple matrix ROWS under setup_a (the
    # URS hash tags give both setups a shared generator prefix, so a
    # single-row image would commit identically under both)
    code = bytes(range(200))
    setup_a = DorySetup.generate(6)
    setup_b = DorySetup.generate(8, nu=3)
    ca = _program_image_commitment(make_scheme(setup_a), code)
    cb = _program_image_commitment(make_scheme(setup_b), code)
    direct = make_scheme(setup_a).commit("program_image",
                                         image_words(code), bits=254)
    assert ca.c == direct.c
    # different setup -> different commitment object, no stale cache hit
    assert cb.c != ca.c
    # cache hit returns the same commitment for the same (code, setup)
    assert _program_image_commitment(make_scheme(setup_a), code).c == ca.c
