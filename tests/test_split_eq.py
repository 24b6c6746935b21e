"""Split-eq / Gruen + eq+1 equivalence tests (poly/split_eq.py) against the
dense eq oracle -- the reference's own gate (`split_eq_bind_*` invariants,
jolt-eval; `poly/split_eq_poly.rs` tests)."""

import random

from jolt_tpu.field import FR, ops
from jolt_tpu.poly import eq as eq_mod
from jolt_tpu.poly.split_eq import (GruenSplitEq, eq_plus_one_evals,
                                    eq_plus_one_int)

P = FR.modulus
rng = random.Random(7)


def _rand_point(n):
    return [rng.randrange(P) for _ in range(n)]


def test_split_outer_matches_dense():
    w = _rand_point(6)
    se = GruenSplitEq(w)
    dense = ops.unpack_ints(eq_mod.evals(w))
    assert ops.unpack_ints(se.full_table()) == dense
    # partial tables at every round boundary
    for j in range(1, 6):
        sub = ops.unpack_ints(se.outer(j))
        want = ops.unpack_ints(eq_mod.evals(w[j:]))
        assert sub == want, f"outer({j})"


def test_gruen_round_message_matches_dense():
    """One HighToLow sumcheck round of sum_x eq(w,x)*g(x): the Gruen-lifted
    message equals the dense-path message at every eval point."""
    n = 5
    w = _rand_point(n)
    g = [rng.randrange(P) for _ in range(1 << n)]
    se = GruenSplitEq(w)
    r_hist = []
    for rnd in range(n):
        rem = n - rnd
        half = 1 << (rem - 1)
        E = ops.unpack_ints(eq_mod.evals(w[rnd:]))
        # dense message at X in {0, 2}: bind the CURRENT (MSB) variable
        def at(X, col):
            lo, hi = col[:half], col[half:]
            return [(l + X * (h - l)) % P for l, h in zip(lo, hi)]
        s_dense = []
        for X in (0, 2):
            ev = at(X, E)
            gv = at(X, g)
            s_dense.append(sum(e * v % P for e, v in zip(ev, gv)) % P)
        # Gruen: inner message over the TAIL eq table only, lifted
        E_tail = ops.unpack_ints(se.outer(rnd + 1)) if rem > 1 else [1]
        t = []
        for X in (0, 2):
            gv = at(X, g)
            t.append(sum(e * v % P for e, v in zip(E_tail, gv)) % P)
        s_gruen = se.gruen_evals(t, 1)
        # the dense comparator above rebuilds eq from w[rnd:] (no bound
        # prefix), so scale it by c_j to match the true round message
        assert s_gruen == [se.scalar * v % P for v in s_dense], f"round {rnd}"
        r = rng.randrange(P)
        r_hist.append(r)
        se.bind(r)
        g = at(r, g)
    # final scalar equals eq(w, r_hist)
    assert se.scalar == eq_mod.eq_int(w, r_hist)


def test_eq_plus_one():
    n = 4
    w = _rand_point(n)
    tab = ops.unpack_ints(eq_plus_one_evals(w))
    E = ops.unpack_ints(eq_mod.evals(w))
    for x in range(1 << n):
        want = E[x + 1] if x + 1 < (1 << n) else 0
        assert tab[x] == want
        bits = [(x >> (n - 1 - i)) & 1 for i in range(n)]
        assert eq_plus_one_int(w, bits) == want
