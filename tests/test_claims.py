"""Claims layer: Expr algebra, typed ids, and the naive interpreter prover.

The naive tier is the semantic oracle for optimized kernels (SURVEY.md
§4.2, `specs/clean-slate-prover.md:110-140`): any relation expressed as an
Expr proves via direct interpretation, and an optimized device instance
must emit byte-identical round polynomials on the same transcript.
"""
import random

import pytest

from jolt_tpu.claims import (Challenge, Const, NaiveExprProver,
                             NaiveExprVerifier, OpeningId, Poly, SumcheckId,
                             all_committed, sum_over_hypercube)
from jolt_tpu.claims.ids import CommittedPolynomial
from jolt_tpu.field.params import FR
from jolt_tpu.poly import eq
from jolt_tpu.sumcheck.engine import (BatchedSumcheck, OpeningAccumulator,
                                      SumcheckError)
from jolt_tpu.transcript import Blake2bTranscript

P = FR.modulus


def _host_eq_table(point):
    """[eq(point, x)]_x with point[0] = MSB var: each new var is appended
    as the LSB, E'[2x + b] = E[x] * chi(r, b) (poly/eq.py _double)."""
    E = [1]
    for r in point:
        nxt = []
        for v in E:
            nxt.append(v * (1 - r) % P)
            nxt.append(v * r % P)
        E = nxt
    return E


class TestExpr:
    def test_degree_and_eval(self):
        e = Poly("a") * Poly("b") * Poly("c") + Challenge("g") * Poly("a")
        assert e.degree() == 3
        v = e.evaluate({"a": 2, "b": 3, "c": 5}, {"g": 7})
        assert v == (2 * 3 * 5 + 7 * 2) % P

    def test_sub_neg_const(self):
        e = (Const(5) - Poly("m")) * Poly("m")
        assert e.degree() == 2
        assert e.evaluate({"m": 3}, {}) == 6

    def test_sum_over_hypercube(self):
        rng = random.Random(0)
        a = [rng.randrange(P) for _ in range(8)]
        b = [rng.randrange(P) for _ in range(8)]
        e = Poly("a") * Poly("b")
        want = sum(x * y for x, y in zip(a, b)) % P
        assert sum_over_hypercube(e, {"a": a, "b": b}, {}) == want


class TestIds:
    def test_opening_id_key(self):
        oid = OpeningId(SumcheckId.REGISTERS_RW, CommittedPolynomial.RD_INC)
        assert oid.key() == ("registers", "inc")

    def test_all_committed(self):
        names = all_committed(4)
        assert names[:4] == ["wa", "ra1", "ra2", "inc"]
        assert names[-1] == "lk_ra3"
        assert len(names) == 11

    def test_instruction_ra_needs_index(self):
        with pytest.raises(ValueError):
            CommittedPolynomial.INSTRUCTION_RA.indexed()


class TestNaiveProver:
    def _roundtrip(self, tamper=False):
        rng = random.Random(42)
        n_vars = 4
        n = 1 << n_vars
        q = [rng.randrange(P) for _ in range(n_vars)]
        E = _host_eq_table(q)
        A = [rng.randrange(P) for _ in range(n)]
        B = [rng.randrange(P) for _ in range(n)]
        gamma = rng.randrange(P)
        # claim = sum_x eq(q,x) * A(x) * (B(x) + gamma)
        expr = Poly("eq") * Poly("A") * (Poly("B") + Challenge("g"))
        polys = {"eq": E, "A": A, "B": B}
        prover = NaiveExprProver(expr, polys, {"g": gamma})
        assert prover.degree == 3
        assert prover.num_rounds == n_vars

        acc_p = OpeningAccumulator()
        t_p = Blake2bTranscript(b"claims-test")
        compressed, r = BatchedSumcheck.prove([prover], acc_p, t_p)

        a_open = acc_p.get_claim(("naive", "A"))
        b_open = acc_p.get_claim(("naive", "B"))
        if tamper:
            b_open = (b_open + 1) % P

        acc_v = OpeningAccumulator()
        t_v = Blake2bTranscript(b"claims-test")
        verifier = NaiveExprVerifier(
            expr, prover.input_claim(acc_p), n_vars, {"g": gamma},
            public_evals={"eq": lambda rr: eq.eq_int(q, rr)},
            claimed={"A": a_open, "B": b_open})
        r_v = BatchedSumcheck.verify(compressed, [verifier], acc_v, t_v)
        assert r_v == r

    def test_prove_verify_roundtrip(self):
        self._roundtrip()

    def test_tampered_opening_rejected(self):
        with pytest.raises(SumcheckError):
            self._roundtrip(tamper=True)

    def test_matches_optimized_dense_opening(self):
        """kernel_naive_equivalence gate for the DenseOpening kernel: the
        optimized device instance and the naive interpreter must emit
        byte-identical round polynomials on the same transcript."""
        from jolt_tpu.relations.opening_reduction import DenseOpening

        rng = random.Random(7)
        n_vars = 4
        n = 1 << n_vars
        q = [rng.randrange(P) for _ in range(n_vars)]
        coeffs = [rng.randrange(P) for _ in range(n)]
        E = _host_eq_table(q)
        claim = sum(e * c for e, c in zip(E, coeffs)) % P

        opt = DenseOpening(coeffs, q, claim, "x")
        naive = NaiveExprProver(Poly("eq") * Poly("p"),
                                {"eq": E, "p": coeffs})
        assert naive._claim == claim

        out = []
        for inst in (opt, naive):
            acc = OpeningAccumulator()
            t = Blake2bTranscript(b"equiv")
            out.append(BatchedSumcheck.prove([inst], acc, t))
        (polys_o, r_o), (polys_n, r_n) = out
        assert polys_o == polys_n
        assert r_o == r_n
        # terminal opening of p matches too
        assert opt.final_openings["p"] == naive.polys["p"][0]
