"""Sumcheck engine end-to-end: prove with device kernels, verify on host,
transcripts must agree; soundness checks on tampered proofs."""
import random

import pytest

from jolt_tpu.field import FR, ops
from jolt_tpu.poly import dense, eq
from jolt_tpu.poly.univariate import UniPoly
from jolt_tpu.sumcheck import BatchedSumcheck, OpeningAccumulator, SumcheckError
from jolt_tpu.sumcheck.product import ProductSumcheck, VerifierProductSumcheck
from jolt_tpu.transcript import Blake2bTranscript

P = FR.modulus


def rand_mle(rng, n_vars):
    return dense.from_ints([rng.randrange(P) for _ in range(1 << n_vars)])


def run_product_sumcheck(rng, sizes_and_factors):
    """sizes_and_factors: list of (n_vars, n_factors) per instance."""
    instances = []
    raw_polys = []
    for n_vars, k in sizes_and_factors:
        polys = [rand_mle(rng, n_vars) for _ in range(k)]
        raw_polys.append(polys)
        instances.append(ProductSumcheck(polys))

    acc = OpeningAccumulator()
    tp = Blake2bTranscript(b"test_sumcheck")
    input_claims = [inst.input_claim(acc) for inst in instances]
    proof, r = BatchedSumcheck.prove(instances, acc, tp)

    # verifier twin instances driven by claims carried in the "proof"
    v_instances = [
        VerifierProductSumcheck(inst.num_rounds, ic, inst.final_claims)
        for inst, ic in zip(instances, input_claims)
    ]
    acc_v = OpeningAccumulator()
    tv = Blake2bTranscript(b"test_sumcheck")
    r_v = BatchedSumcheck.verify(proof, v_instances, acc_v, tv)
    assert r_v == r

    # verifier and prover transcripts agree after symmetric opening flush
    for inst, ic in zip(instances, input_claims):
        for k2, claim in enumerate(inst.final_claims):
            acc_v.insert(("product_poly", id(instances[instances.index(inst)]), k2), r_v, claim)
    acc_v.flush_to_transcript(tv)
    assert tv.state == tp.state

    # final claims really are P_k evaluated at r (slice per instance)
    max_rounds = max(i.num_rounds for i in instances)
    for inst, polys in zip(instances, raw_polys):
        off = inst.round_offset(max_rounds)
        r_slice = r[off:off + inst.num_rounds]
        for claim, Pk in zip(inst.final_claims, polys):
            assert claim == dense.evaluate(Pk, r_slice)
    return proof, r, instances, input_claims


def test_single_product_sumcheck():
    rng = random.Random(10)
    run_product_sumcheck(rng, [(4, 2)])


def test_single_cubic_sumcheck():
    rng = random.Random(11)
    run_product_sumcheck(rng, [(5, 3)])


def test_batched_unequal_rounds():
    rng = random.Random(12)
    run_product_sumcheck(rng, [(4, 2), (6, 3), (3, 1)])


def test_soundness_tampered_poly():
    rng = random.Random(13)
    proof, r, instances, input_claims = run_product_sumcheck(rng, [(4, 2)])
    bad = [list(c) for c in proof]
    bad[1][0] = (bad[1][0] + 1) % P
    v = [VerifierProductSumcheck(i.num_rounds, ic, i.final_claims)
         for i, ic in zip(instances, input_claims)]
    with pytest.raises(SumcheckError):
        BatchedSumcheck.verify(bad, v, OpeningAccumulator(), Blake2bTranscript(b"test_sumcheck"))


def test_soundness_tampered_claim():
    rng = random.Random(14)
    proof, r, instances, input_claims = run_product_sumcheck(rng, [(4, 2)])
    v = [VerifierProductSumcheck(i.num_rounds, (ic + 1) % P, i.final_claims)
         for i, ic in zip(instances, input_claims)]
    with pytest.raises(SumcheckError):
        BatchedSumcheck.verify(proof, v, OpeningAccumulator(), Blake2bTranscript(b"test_sumcheck"))


def test_eq_table_matches_pointwise():
    rng = random.Random(15)
    point = [rng.randrange(P) for _ in range(4)]
    E = eq.evals(point)
    vals = ops.unpack_ints(E)
    for x in range(16):
        bits = [(x >> (3 - j)) & 1 for j in range(4)]  # big-endian: r[0]=MSB
        assert vals[x] == eq.eq_int(point, bits)


def test_eq_weighted_product_sumcheck():
    # claim = sum_x eq(tau, x) * A(x) * B(x): the Spartan-outer shape
    rng = random.Random(16)
    n = 5
    tau = [rng.randrange(P) for _ in range(n)]
    A = rand_mle(rng, n)
    B = rand_mle(rng, n)
    E = eq.evals(tau)
    inst = ProductSumcheck([E, A, B])
    acc = OpeningAccumulator()
    tp = Blake2bTranscript(b"eqw")
    ic = inst.input_claim(acc)
    proof, r = BatchedSumcheck.prove([inst], acc, tp)
    # eq factor's final claim must equal eq(tau, r) computed on host
    eq_claim = inst.final_claims[0]
    assert eq_claim == eq.eq_int(tau, r)
