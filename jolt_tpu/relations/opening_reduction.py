"""Joint batched-opening reduction: reduce every terminal committed-poly
claim (polys of different sizes, opened at different points) to openings of
all polynomials at ONE common point, then a single RLC PCS opening.

Reference: `crates/jolt-openings/src/lib.rs:12-19` (prove_packed_openings /
HomomorphicBatch), `zkvm/prover.rs:2097-2260` (stage 8), Lagrange embedding
factors for size mismatches.

Per claim (P_i, q_i, v_i) one sumcheck instance proves
    v_i = sum_x eq(q_i, x) * P_i(x)
All instances batch through the standard engine (RLC coefficients,
front-loaded activation for smaller polys).  After the shared challenges
r* are drawn, each instance's terminal value is P_i(r*_suffix); the
verifier checks eq(q_i, r*_suffix) * P_i(r*_suffix) against the running
claim, then scales each opening by the zero-padding embedding factor
prod_{j < max-n_i} (1 - r*_j) and checks ONE homomorphically-combined PCS
opening  sum_i mu^i C_i  at r*.

One-hot polynomials are committed ADDRESS-MAJOR (index = k*T + j) so the
reduction's HighToLow binding does the address phase first and the sparse
O(T) formulation applies (same machinery as the booleanity stage: per-cycle
eq-weight tracking, no dense K x T arrays).
"""

from __future__ import annotations

from functools import partial
from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..field import FR, ops
from ..poly import dense, eq
from ..poly.univariate import UniPoly
from ..sumcheck.engine import OpeningAccumulator, SumcheckInstance
from ..sumcheck import scan
from ..sumcheck.fused import FusedInstance
from ..sumcheck.scan import ScanFusedInstance
from .booleanity import _chi_dev, _mont_consts, _sham_addr_kernel, \
    _ham_cycle_kernel, _update_u

P = FR.modulus


def onehot_address_major(indices: Sequence[int], K: int) -> List[int]:
    """Committed coefficient vector for a one-hot matrix, index = k*T + j."""
    T = len(indices)
    out = [0] * (K * T)
    for j, c in enumerate(indices):
        out[int(c) * T + j] = 1
    return out


def cycle_major_to_address_major_point(point: Sequence[int],
                                       log_T: int) -> List[int]:
    """Relation sumchecks produce (r_cycle ++ r_addr) opening points over
    cycle-major arrays; the same evaluation over the address-major committed
    layout is at (r_addr ++ r_cycle)."""
    return list(point[log_T:]) + list(point[:log_T])


class SparseOneHotOpening(ScanFusedInstance):
    """v = sum_{k,j} eq(q, (k,j)) * M(k,j) for a one-hot M given by its
    per-cycle index stream; q in address-major var order."""

    degree = 2

    def __init__(self, indices: Sequence[int], K: int, point: Sequence[int],
                 claim: int, label: str):
        self.K = K
        self.log_K = K.bit_length() - 1
        self.T = len(indices)
        self.log_T = self.T.bit_length() - 1
        assert len(point) == self.log_K + self.log_T
        self.q_addr = [x % P for x in point[:self.log_K]]
        self.q_cyc = [x % P for x in point[self.log_K:]]
        self.claim = claim % P
        self.label = label

        idx = np.asarray(indices, dtype=np.int64)
        self.masks = [jnp.asarray((idx >> (self.log_K - 1 - b)) & 1, jnp.bool_)
                      for b in range(self.log_K)]
        W = eq.evals(self.q_cyc)
        # WS[b] = W * prod_{i>b} chi(q_addr_i, bit_i(c_j))
        self.WS = [None] * self.log_K
        acc = W
        for b in range(self.log_K - 1, -1, -1):
            self.WS[b] = acc
            if b > 0:
                r_on = ops.pack_ints([self.q_addr[b]])
                r_off = ops.pack_ints([(1 - self.q_addr[b]) % P])
                acc = _update_u(acc, self.masks[b], r_on, r_off)
        self.U = ops.ones((self.T,))
        self.A = 1
        self.E = W
        self.V: Optional[jnp.ndarray] = None
        self.final_openings: Optional[dict] = None

    @property
    def num_rounds(self) -> int:
        return self.log_K + self.log_T

    def input_claim(self, accumulator: OpeningAccumulator) -> int:
        return self.claim

    def message_evals_dev(self, round: int):
        if round < self.log_K:
            on2 = _mont_consts([0, 2])
            off2 = _mont_consts([1, -1])
            arr = _sham_addr_kernel(self.WS[round], self.U,
                                    self.masks[round], on2, off2)
            qb = self.q_addr[round]
            A = self.A
            post = lambda evals: [
                A * ((qb * X + (1 - qb) * (1 - X)) % P) % P * e % P
                for X, e in zip((0, 2), evals)]
            return arr, post
        A = self.A
        return (_ham_cycle_kernel(self.E, self.V),
                lambda evals: [A * e % P for e in evals])

    def ingest_challenge(self, r: int, round: int) -> None:
        if round < self.log_K:
            r_on = ops.pack_ints([r])
            r_off = ops.pack_ints([(1 - r) % P])
            self.U = _update_u(self.U, self.masks[round], r_on, r_off)
            qb = self.q_addr[round]
            self.A = self.A * ((qb * r + (1 - qb) * (1 - r)) % P) % P
            if round + 1 == self.log_K:
                self.V = self.U
        else:
            r_dev = ops.pack_ints([r])
            self.E = dense.bind_high(self.E, r_dev, FR)
            self.V = dense.bind_high(self.V, r_dev, FR)

    def finalize(self) -> None:
        self.final_openings = {"p": ops.unpack_ints(self.V)[0]}

    def cache_openings(self, accumulator: OpeningAccumulator,
                       r_slice: Sequence[int]) -> None:
        accumulator.insert(("joint_opening", self.label), list(r_slice),
                           self.final_openings["p"])

    def expected_output_claim(self, accumulator, r):  # pragma: no cover
        raise NotImplementedError

    # ---- fused (device-transcript) protocol ----------------------------

    def fused_key(self):
        return (self.log_K, self.log_T)

    def fused_consts(self):
        chi2 = tuple(
            ops.pack_ints([(1 - qb) % P, (3 * qb - 1) % P])[:, :, None]
            for qb in self.q_addr)
        qbs = tuple(
            (ops.pack_ints([qb]), ops.pack_ints([(1 - qb) % P]))
            for qb in self.q_addr)
        return {"masks": tuple(self.masks), "WS": tuple(self.WS),
                "chi2": chi2, "qbs": qbs}

    def fused_state(self):
        return {"U": self.U, "A": ops.ones((1,)), "E": self.E}

    def fused_message(self, consts, st, round: int):
        on2 = _mont_consts([0, 2])
        off2 = _mont_consts([1, -1])
        if round < self.log_K:
            arr = _sham_addr_kernel(consts["WS"][round], st["U"],
                                    consts["masks"][round], on2, off2)
            arr = ops.mont_mul(arr, consts["chi2"][round], FR)
        else:
            arr = _ham_cycle_kernel(st["E"], st["V"])
        return ops.mont_mul(arr, st["A"][:, None, :], FR)

    def fused_bind(self, consts, st, r, round: int):
        st = dict(st)
        if round < self.log_K:
            one = ops.ones((1,))
            r_off = ops.sub(one, r, FR)
            st["U"] = _update_u(st["U"], consts["masks"][round], r, r_off)
            qb_m, qb1m = consts["qbs"][round]
            st["A"] = ops.mont_mul(st["A"], _chi_dev(qb_m, qb1m, r), FR)
            if round + 1 == self.log_K:
                st["V"] = st["U"]
        else:
            st["E"] = dense.bind_high(st["E"], r, FR)
            st["V"] = dense.bind_high(st["V"], r, FR)
        return st

    def fused_finals(self, st):
        return {"V": st["V"]}

    def fused_store(self, finals) -> None:
        self.V = finals["V"]

    # ---- scan-fused protocol --------------------------------------------

    def scan_plan(self):
        return [("addr", self.log_K), ("cycle", self.log_T)]

    def scan_bconsts(self):
        return {"E0": scan.to_pair_order(self.E)}

    def scan_state0(self):
        return {"U": self.U, "A": ops.ones((1,))}

    def scan_xs(self, mode, lo, hi):
        if mode != "addr":
            return ()
        qbs = self.q_addr[lo:hi]
        chi2 = jnp.stack([
            ops.pack_ints([(1 - qb) % P, (3 * qb - 1) % P])[:, :, None]
            for qb in qbs])
        return {"mask": jnp.stack(self.masks[lo:hi]),
                "WS": jnp.stack(self.WS[lo:hi]),
                "chi2": chi2,
                "qb": jnp.stack([ops.pack_ints([qb]) for qb in qbs]),
                "qb1m": jnp.stack([ops.pack_ints([(1 - qb) % P])
                                   for qb in qbs])}

    def scan_message(self, mode, bc, x, st):
        if mode == "addr":
            on2 = _mont_consts([0, 2])
            off2 = _mont_consts([1, -1])
            arr = _sham_addr_kernel(x["WS"], st["U"], x["mask"], on2, off2)
            arr = ops.mont_mul(arr, x["chi2"], FR)
        else:
            arr = scan.pair_prod_message([st["E"], st["V"]], 2)
        return ops.mont_mul(arr, st["A"][:, None, :], FR)

    def scan_bind(self, mode, bc, x, st, r):
        st = dict(st)
        if mode == "addr":
            one = ops.ones((1,))
            r_off = ops.sub(one, r, FR)
            st["U"] = _update_u(st["U"], x["mask"], r, r_off)
            st["A"] = ops.mont_mul(st["A"],
                                   _chi_dev(x["qb"], x["qb1m"], r), FR)
        else:
            st["E"] = scan.pair_bind(st["E"], r)
            st["V"] = scan.pair_bind(st["V"], r)
        return st

    def scan_transition(self, prev_mode, next_mode, bc, st):
        return {"E": bc["E0"], "V": scan.to_pair_order(st["U"]),
                "A": st["A"]}

    def scan_shrink_plan(self, mode, n_rounds):
        if mode != "cycle":
            return []
        return scan.default_shrink_plan(n_rounds, self.T)

    def scan_shrink(self, mode, s, bc, st):
        n = self.T >> s
        return {"E": st["E"][..., :n], "V": st["V"][..., :n],
                "A": st["A"]}

    def scan_finals(self, st):
        return {"V": st["V"][:, :1]}


class DenseOpening(ScanFusedInstance):
    """v = sum_x eq(q, x) * P(x) for a dense coefficient vector."""

    degree = 2

    def __init__(self, coeffs: Sequence[int], point: Sequence[int],
                 claim: int, label: str):
        self.n = len(point)
        assert len(coeffs) == 1 << self.n
        self.q = [x % P for x in point]
        self.claim = claim % P
        self.label = label
        self.E = eq.evals(self.q)
        self.Pv = ops.pack_ints(coeffs)
        self.final_openings: Optional[dict] = None

    @property
    def num_rounds(self) -> int:
        return self.n

    def input_claim(self, accumulator: OpeningAccumulator) -> int:
        return self.claim

    def message_evals_dev(self, round: int):
        return _ham_cycle_kernel(self.E, self.Pv), None

    def ingest_challenge(self, r: int, round: int) -> None:
        r_dev = ops.pack_ints([r])
        self.E = dense.bind_high(self.E, r_dev, FR)
        self.Pv = dense.bind_high(self.Pv, r_dev, FR)

    def finalize(self) -> None:
        self.final_openings = {"p": ops.unpack_ints(self.Pv)[0]}

    def cache_openings(self, accumulator: OpeningAccumulator,
                       r_slice: Sequence[int]) -> None:
        accumulator.insert(("joint_opening", self.label), list(r_slice),
                           self.final_openings["p"])

    def expected_output_claim(self, accumulator, r):  # pragma: no cover
        raise NotImplementedError

    # ---- fused (device-transcript) protocol ----------------------------

    def fused_key(self):
        return (self.n,)

    def fused_state(self):
        return {"E": self.E, "Pv": self.Pv}

    def fused_message(self, consts, st, round: int):
        return _ham_cycle_kernel(st["E"], st["Pv"])

    def fused_bind(self, consts, st, r, round: int):
        st = dict(st)
        st["E"] = dense.bind_high(st["E"], r, FR)
        st["Pv"] = dense.bind_high(st["Pv"], r, FR)
        return st

    def fused_finals(self, st):
        return {"Pv": st["Pv"]}

    def fused_store(self, finals) -> None:
        self.Pv = finals["Pv"]

    # ---- scan-fused protocol --------------------------------------------

    def scan_plan(self):
        return [("main", self.num_rounds)]

    def scan_state0(self):
        return {"E": scan.to_pair_order(self.E),
                "Pv": scan.to_pair_order(self.Pv)}

    def scan_message(self, mode, bc, x, st):
        return scan.pair_prod_message([st["E"], st["Pv"]], 2)

    def scan_bind(self, mode, bc, x, st, r):
        return {"E": scan.pair_bind(st["E"], r),
                "Pv": scan.pair_bind(st["Pv"], r)}

    def scan_shrink_plan(self, mode, n_rounds):
        return scan.default_shrink_plan(n_rounds, 1 << self.n)

    def scan_shrink(self, mode, s, bc, st):
        n = (1 << self.n) >> s
        return {k: v[..., :n] for k, v in st.items()}

    def scan_finals(self, st):
        return {"Pv": st["Pv"][:, :1]}


class OpeningReductionVerifier(SumcheckInstance):
    """Verifier twin for both sparse and dense reduction instances."""

    degree = 2

    def __init__(self, num_vars: int, point: Sequence[int], claim: int,
                 p_opening: int):
        self.n = num_vars
        self.q = [x % P for x in point]
        self.claim = claim % P
        self.p_opening = p_opening % P

    @property
    def num_rounds(self) -> int:
        return self.n

    def input_claim(self, accumulator: OpeningAccumulator) -> int:
        return self.claim

    def compute_message(self, round, prev):  # pragma: no cover
        raise NotImplementedError("verifier instance")

    def ingest_challenge(self, r, round):  # pragma: no cover
        raise NotImplementedError("verifier instance")

    def expected_output_claim(self, accumulator: OpeningAccumulator,
                              r: Sequence[int]) -> int:
        return eq.eq_int(self.q, list(r)) * self.p_opening % P


def embedding_factor(r_star: Sequence[int], num_vars: int) -> int:
    """Zero-padding embedding: a 2^n-coefficient poly inside the
    2^max space evaluates at r* to P(r*[-n:]) * prod_high (1 - r*_j)."""
    acc = 1
    for rj in r_star[:len(r_star) - num_vars]:
        acc = acc * ((1 - rj) % P) % P
    return acc
