"""BlindFold ZK layer: committed sumcheck rounds, verifier R1CS, Nova
fold, Spartan, Hyrax openings (jolt_tpu/blindfold)."""
import random

import pytest

from jolt_tpu.blindfold import (PedersenBasis, blindfold_prove,
                                blindfold_verify, pedersen_commit,
                                zk_prove_stage, zk_replay_challenges)
from jolt_tpu.blindfold.pedersen import point_bytes
from jolt_tpu.blindfold.verify import BlindFoldError
from jolt_tpu.blindfold.zk_sumcheck import ZkStageData
from jolt_tpu.curve import bn254_host as host
from jolt_tpu.field.params import FR
from jolt_tpu.poly import eq
from jolt_tpu.relations.opening_reduction import DenseOpening
from jolt_tpu.sumcheck.engine import OpeningAccumulator
from jolt_tpu.transcript import Blake2bTranscript

P = FR.modulus


def test_pedersen_basics():
    rng = random.Random(1)
    basis = PedersenBasis.create(4, b"test")
    for g in basis.G + [basis.H]:
        assert host.g1_is_on_curve(g)
    v = [rng.randrange(P) for _ in range(4)]
    r1, r2 = rng.randrange(P), rng.randrange(P)
    c1 = pedersen_commit(basis, v, r1)
    c2 = pedersen_commit(basis, v, r2)
    assert c1 != c2, "blinding must hide"
    # homomorphism: C(v, r1) + C(w, r2) == C(v+w, r1+r2)
    w = [rng.randrange(P) for _ in range(4)]
    lhs = host.g1_add(c1, pedersen_commit(basis, w, r2))
    rhs = pedersen_commit(basis, [(a + b) % P for a, b in zip(v, w)],
                          (r1 + r2) % P)
    assert lhs == rhs


def _dense_stage_instances(rng, sizes):
    insts = []
    meta = []
    for n in sizes:
        coeffs = [rng.randrange(P) for _ in range(1 << n)]
        point = [rng.randrange(P) for _ in range(n)]
        claim = 0
        e = eq.evals(point)
        from jolt_tpu.field import ops
        claim = ops.unpack_ints(ops.dot(e, ops.pack_ints(coeffs)))[0]
        insts.append(DenseOpening(coeffs, point, claim, f"d{n}"))
        meta.append((point, claim))
    return insts, meta


def _expected_final(insts, meta, coeffs, rs, max_rounds):
    """Public final binding: sum_i coeff_i * eq(q_i, r_slice) * opening."""
    from jolt_tpu.poly.eq import eq_int
    total = 0
    for inst, (point, _claim), c in zip(insts, meta, coeffs):
        off = max_rounds - inst.num_rounds
        r_slice = rs[off:]
        total = (total
                 + c * eq_int(point, r_slice) % P
                 * inst.final_openings["p"]) % P
    return total


def _run_zk_pipeline(tamper=None):
    rng = random.Random(7)
    basis = PedersenBasis.create(8)
    t = Blake2bTranscript(b"bf-test")
    acc = OpeningAccumulator()

    stages = []
    stage_specs = [[4, 3], [5]]       # two stages, mixed sizes
    all_meta = []
    for si, sizes in enumerate(stage_specs):
        insts, meta = _dense_stage_instances(rng, sizes)
        data, rs = zk_prove_stage(insts, acc, t, basis, rng, f"s{si}")
        # honest final binding = the last chained claim; the verifier
        # recomputes the same value from the public opening algebra
        data.final_expected = data.claims[-1]
        stages.append((insts, meta, data))
        all_meta.append(meta)

    zk_stages = [d for _, _, d in stages]
    proof = blindfold_prove(zk_stages, basis, t, rng)

    # ---- verifier side ----------------------------------------------------
    vt = Blake2bTranscript(b"bf-test")
    pub_stages = []
    for (insts, meta, data) in stages:
        input_claims = [cl for _, cl in meta]
        comm_bytes = [point_bytes(c) for c in data.commitments]
        coeffs, rs = zk_replay_challenges(comm_bytes, input_claims,
                                          len(insts), vt)
        claim0 = sum(
            c * ((cl << (data.max_rounds - inst.num_rounds)) % P)
            for c, (pt, cl), inst in zip(coeffs, meta, insts)) % P
        expected = _expected_final(insts, meta, coeffs, rs,
                                   data.max_rounds)
        pub = ZkStageData(label=data.label, max_rounds=data.max_rounds,
                          max_degree=data.max_degree, input_claim0=claim0,
                          round_coeffs=[], blinds=[],
                          commitments=list(data.commitments),
                          challenges=rs, claims=[],
                          final_expected=expected)
        # the verifier must also replay the opening-claim absorbs the
        # prover's accumulator flushed after the stage
        for inst in insts:
            vt.append_scalar(b"opening_claim", inst.final_openings["p"])
        pub_stages.append(pub)

    if tamper == "w_comb":
        proof.w_comb[0] = (proof.w_comb[0] + 1) % P
    if tamper == "az":
        proof.az_r = (proof.az_r + 1) % P
    if tamper == "coeff_comm":
        pub_stages[0].commitments[0] = host.g1_mul(
            pub_stages[0].commitments[0], 2)

    return pub_stages, proof, basis, vt


def test_blindfold_end_to_end():
    pub_stages, proof, basis, vt = _run_zk_pipeline()
    assert blindfold_verify(pub_stages, proof, basis, vt)


@pytest.mark.parametrize("tamper", ["w_comb", "az"])
def test_blindfold_rejects_tampering(tamper):
    pub_stages, proof, basis, vt = _run_zk_pipeline(tamper=tamper)
    with pytest.raises(BlindFoldError):
        blindfold_verify(pub_stages, proof, basis, vt)
