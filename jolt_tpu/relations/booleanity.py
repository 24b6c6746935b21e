"""Booleanity + Hamming-weight sumchecks for one-hot access matrices,
in O(T + K) space per matrix (no dense K x T materialization).

Reference: `subprotocols/booleanity.rs` (address phase + cycle phase),
`zkvm/ram/hamming_booleanity.rs`, HammingWeight claim reductions.

For each access matrix M over (address k, cycle j) -- registers wa/ra1/ra2,
RAM ra, bytecode ra, instruction ra chunks -- two relations together prove
every column of M is EXACTLY one-hot:

  * booleanity:  0 = sum_{k,j} eq(r_addr,k)*eq(r_cyc,j) * (M(k,j)^2 - M(k,j))
  * hamming weight: 1 = sum_{k,j} eq(r_h, j) * M(k,j)

Sparse structure (the TPU formulation): the witness is the per-cycle index
stream c_j with M(k,j) = [k == c_j].  Binding the ADDRESS variables first,
the partially-bound matrix stays rank-one per cycle:

    M(rho_{<b} || X || k_rest, j) = u_j * chi(X, bit_b(c_j)) * [k_rest == rest(c_j)]

with u_j = prod_{i<b} chi(rho_i, bit_i(c_j)) maintained as one O(T) device
array (one select+mul per round).  The eq(r_addr, .) factor splits the same
way via precomputed suffix products.  Address rounds are degree-3 (bool) /
degree-2 (hamming) messages over O(T) arrays; the log T cycle rounds run on
the dense u vector.  All matrices batch into ONE BatchedSumcheck stage.

Opening points are normalized to the cycle-major order (r_cycle ++ r_addr)
used by the committed polynomial layout.
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
from ..sumcheck import scan
from ..sumcheck.engine import OpeningAccumulator, SumcheckInstance
from ..sumcheck.fused import FusedInstance
from ..sumcheck.scan import ScanFusedInstance

P = FR.modulus


def _chi_dev(rb_mont, rb1m_mont, r, fp=FR):
    """chi(rb, r) = rb*r + (1-rb)*(1-r) on device; rb passed as the
    Montgomery pair (rb, 1-rb)."""
    one = ops.ones((1,), fp)
    return ops.add(ops.mont_mul(rb_mont, r, fp),
                   ops.mont_mul(rb1m_mont, ops.sub(one, r, fp), fp), fp)


@partial(jax.jit, static_argnames=('fp',))
def _sbool_addr_kernel(WS, U, mask, on3, off3, fp=FR):
    """Booleanity address-round evals at X in {0,2,3}:
    sum_j WS_j * (t^2 - t),  t = U_j * chi(X, mask_j).
    WS: (L,T) combined w*suffix weights; on3/off3: (L,3,1) chi constants."""
    sel = jnp.where(mask[None, None, :], on3, off3)        # (L,3,T)
    t = ops.mont_mul(U[:, None, :], sel, fp)
    tt = ops.sub(ops.mont_mul(t, t, fp), t, fp)
    return ops.sum_mod(ops.mont_mul(WS[:, None, :], tt, fp), fp)  # (L,3,1)


@partial(jax.jit, static_argnames=('fp',))
def _sham_addr_kernel(W, U, mask, on2, off2, fp=FR):
    """Hamming address-round evals at X in {0,2}: sum_j W_j*U_j*chi(X,m_j)."""
    sel = jnp.where(mask[None, None, :], on2, off2)
    t = ops.mont_mul(U[:, None, :], sel, fp)
    return ops.sum_mod(ops.mont_mul(W[:, None, :], t, fp), fp)


@partial(jax.jit, static_argnames=('fp',))
def _update_u(U, mask, r_on, r_off, fp=FR):
    return ops.mont_mul(U, jnp.where(mask[None, :], r_on, r_off), fp)


@partial(jax.jit, static_argnames=('fp',))
def _bool_cycle_kernel(E, V, fp=FR):
    e = dense.sumcheck_eval_points_high(E, 3, fp)
    v = dense.sumcheck_eval_points_high(V, 3, fp)
    vv = ops.sub(ops.mont_mul(v, v, fp), v, fp)
    return ops.sum_mod(ops.mont_mul(e, vv, fp), fp)


@partial(jax.jit, static_argnames=('fp',))
def _ham_cycle_kernel(E, V, fp=FR):
    e = dense.sumcheck_eval_points_high(E, 2, fp)
    v = dense.sumcheck_eval_points_high(V, 2, fp)
    return ops.sum_mod(ops.mont_mul(e, v, fp), fp)


def _mont_consts(vals):
    """Host ints -> (L, len, 1) Montgomery constant array."""
    arr = ops.pack_ints([v % P for v in vals])
    return arr[:, :, None]


class Booleanity(ScanFusedInstance):
    """0 = sum eq(r_addr,k)*eq(r_cyc,j)*(M^2 - M); M given as the per-cycle
    one-hot index stream.  Rounds: log_K address vars then log_T cycle vars."""

    degree = 3

    def __init__(self, indices: Sequence[int], K: int, r_addr: Sequence[int],
                 r_cyc: Sequence[int], label: str):
        self.K = K
        self.log_K = K.bit_length() - 1
        self.T = len(indices)
        self.log_T = self.T.bit_length() - 1
        self.r_addr = [r % P for r in r_addr]
        self.r_cyc = [r % P for r in r_cyc]
        assert len(self.r_addr) == self.log_K and len(self.r_cyc) == self.log_T
        self.label = label

        idx = np.asarray(indices, dtype=np.int64)
        # bit_b(c_j) for address var b (big-endian: b=0 is the index MSB)
        self.masks = [jnp.asarray((idx >> (self.log_K - 1 - b)) & 1, jnp.bool_)
                      for b in range(self.log_K)]
        W = eq.evals(self.r_cyc)                      # (L, T) eq(r_cyc, j)
        # suffix products S_b(j) = prod_{i>b} chi(r_addr_i, bit_i(c_j)),
        # premultiplied into W (the kernels only ever see W*S).
        self.WS = [None] * self.log_K
        acc = W
        for b in range(self.log_K - 1, -1, -1):
            self.WS[b] = acc
            if b > 0:
                r_on = ops.pack_ints([self.r_addr[b]])
                r_off = ops.pack_ints([(1 - self.r_addr[b]) % P])
                acc = _update_u(acc, self.masks[b], r_on, r_off)
        self.U = ops.ones((self.T,))
        self.A = 1                                    # prod chi(r_addr_b, rho_b)
        self.E = W                                    # cycle-round eq table
        self.V: Optional[jnp.ndarray] = None
        self.final_openings: Optional[dict] = None

    @property
    def num_rounds(self) -> int:
        return self.log_K + self.log_T

    def input_claim(self, accumulator: OpeningAccumulator) -> int:
        return 0

    def message_evals_dev(self, round: int):
        if round < self.log_K:
            on3 = _mont_consts([0, 2, 3])
            off3 = _mont_consts([1, -1, -2])
            arr = _sbool_addr_kernel(self.WS[round], self.U,
                                     self.masks[round], on3, off3)
            rb = self.r_addr[round]
            A = self.A
            post = lambda evals: [
                A * ((rb * X + (1 - rb) * (1 - X)) % P) % P * e % P
                for X, e in zip((0, 2, 3), evals)]
            return arr, post
        A = self.A
        return (_bool_cycle_kernel(self.E, self.V),
                lambda evals: [A * e % P for e in evals])

    def ingest_challenge(self, r: int, round: int) -> None:
        if round < self.log_K:
            r_on = ops.pack_ints([r])
            r_off = ops.pack_ints([(1 - r) % P])
            self.U = _update_u(self.U, self.masks[round], r_on, r_off)
            ra = self.r_addr[round]
            self.A = self.A * ((ra * r + (1 - ra) * (1 - r)) % P) % P
            if round + 1 == self.log_K:
                self.V = self.U
        else:
            r_dev = ops.pack_ints([r])
            self.E = dense.bind_high(self.E, r_dev, FR)
            self.V = dense.bind_high(self.V, r_dev, FR)

    def finalize(self) -> None:
        self.final_openings = {"m": ops.unpack_ints(self.V)[0]}

    def cache_openings(self, accumulator: OpeningAccumulator,
                       r_slice: Sequence[int]) -> None:
        # normalize to the cycle-major committed layout: (r_cycle, r_addr)
        pt = list(r_slice[self.log_K:]) + list(r_slice[:self.log_K])
        accumulator.insert(("booleanity", self.label), pt,
                           self.final_openings["m"])

    def expected_output_claim(self, accumulator, r):  # pragma: no cover
        raise NotImplementedError

    # ---- fused (device-transcript) protocol ----------------------------
    # The host path's A-scaling `post` hooks move onto the device: A is a
    # (L,1) running product updated per address round, and the per-round
    # chi(r_addr_b, X) factors enter as precomputed constant arrays.

    def fused_key(self):
        return (self.log_K, self.log_T)

    def fused_consts(self):
        chi3 = tuple(
            ops.pack_ints([(1 - rb) % P, (3 * rb - 1) % P,
                           (5 * rb - 2) % P])[:, :, None]
            for rb in self.r_addr)
        rbs = tuple(
            (ops.pack_ints([rb]), ops.pack_ints([(1 - rb) % P]))
            for rb in self.r_addr)
        return {"masks": tuple(self.masks), "WS": tuple(self.WS),
                "chi3": chi3, "rbs": rbs}

    def fused_state(self):
        return {"U": self.U, "A": ops.ones((1,)), "E": self.E}

    def fused_message(self, consts, st, round: int):
        on3 = _mont_consts([0, 2, 3])
        off3 = _mont_consts([1, -1, -2])
        if round < self.log_K:
            arr = _sbool_addr_kernel(consts["WS"][round], st["U"],
                                     consts["masks"][round], on3, off3)
            arr = ops.mont_mul(arr, consts["chi3"][round], FR)
        else:
            arr = _bool_cycle_kernel(st["E"], st["V"])
        return ops.mont_mul(arr, st["A"][:, None, :], FR)

    def fused_bind(self, consts, st, r, round: int):
        st = dict(st)
        if round < self.log_K:
            one = ops.ones((1,))
            r_off = ops.sub(one, r, FR)
            st["U"] = _update_u(st["U"], consts["masks"][round], r, r_off)
            rb_m, rb1m = consts["rbs"][round]
            st["A"] = ops.mont_mul(st["A"], _chi_dev(rb_m, rb1m, r), FR)
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
        rbs = self.r_addr[lo:hi]
        chi3 = jnp.stack([
            ops.pack_ints([(1 - rb) % P, (3 * rb - 1) % P,
                           (5 * rb - 2) % P])[:, :, None] for rb in rbs])
        return {"mask": jnp.stack(self.masks[lo:hi]),
                "WS": jnp.stack(self.WS[lo:hi]),
                "chi3": chi3,
                "rb": jnp.stack([ops.pack_ints([rb]) for rb in rbs]),
                "rb1m": jnp.stack([ops.pack_ints([(1 - rb) % P])
                                   for rb in rbs])}

    def scan_message(self, mode, bc, x, st):
        if mode == "addr":
            on3 = _mont_consts([0, 2, 3])
            off3 = _mont_consts([1, -1, -2])
            arr = _sbool_addr_kernel(x["WS"], st["U"], x["mask"], on3, off3)
            arr = ops.mont_mul(arr, x["chi3"], FR)
        else:
            e = scan.pair_eval_points(st["E"], 3)
            v = scan.pair_eval_points(st["V"], 3)
            vv = ops.sub(ops.mont_mul(v, v, FR), v, FR)
            arr = ops.sum_mod(ops.mont_mul(e, vv, FR), FR)
        return ops.mont_mul(arr, st["A"][:, None, :], FR)

    def scan_bind(self, mode, bc, x, st, r):
        st = dict(st)
        if mode == "addr":
            one = ops.ones((1,))
            r_off = ops.sub(one, r, FR)
            st["U"] = _update_u(st["U"], x["mask"], r, r_off)
            st["A"] = ops.mont_mul(st["A"],
                                   _chi_dev(x["rb"], x["rb1m"], r), FR)
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


class BooleanityVerifier(SumcheckInstance):
    degree = 3

    def __init__(self, log_K: int, log_T: int, r_addr: Sequence[int],
                 r_cyc: Sequence[int], m_opening: int):
        self.log_K, self.log_T = log_K, log_T
        self.r_addr = [r % P for r in r_addr]
        self.r_cyc = [r % P for r in r_cyc]
        self.m_opening = m_opening % P

    @property
    def num_rounds(self) -> int:
        return self.log_K + self.log_T

    def input_claim(self, accumulator: OpeningAccumulator) -> int:
        return 0

    def compute_message(self, round, prev):  # pragma: no cover
        raise NotImplementedError("verifier instance")

    def ingest_challenge(self, r, round):  # pragma: no cover
        raise NotImplementedError("verifier instance")

    def expected_output_claim(self, accumulator: OpeningAccumulator,
                              r: Sequence[int]) -> int:
        rho = list(r[:self.log_K])
        r_cyc2 = list(r[self.log_K:])
        m = self.m_opening
        return (eq.eq_int(self.r_addr, rho) * eq.eq_int(self.r_cyc, r_cyc2)
                % P * ((m * m - m) % P) % P)


class HammingWeight(ScanFusedInstance):
    """1 = sum_{k,j} eq(r_h, j) * M(k,j), M from the index stream."""

    degree = 2

    def __init__(self, indices: Sequence[int], K: int, r_cycle: Sequence[int],
                 label: str):
        self.K = K
        self.log_K = K.bit_length() - 1
        self.T = len(indices)
        self.log_T = self.T.bit_length() - 1
        self.r_cycle = [r % P for r in r_cycle]
        self.label = label
        idx = np.asarray(indices, dtype=np.int64)
        self.masks = [jnp.asarray((idx >> (self.log_K - 1 - b)) & 1, jnp.bool_)
                      for b in range(self.log_K)]
        self.W = eq.evals(self.r_cycle)
        self.U = ops.ones((self.T,))
        self.V: Optional[jnp.ndarray] = None
        self.final_openings: Optional[dict] = None

    @property
    def num_rounds(self) -> int:
        return self.log_K + self.log_T

    def input_claim(self, accumulator: OpeningAccumulator) -> int:
        return 1

    def message_evals_dev(self, round: int):
        if round < self.log_K:
            on2 = _mont_consts([0, 2])
            off2 = _mont_consts([1, -1])
            return _sham_addr_kernel(self.W, self.U, self.masks[round],
                                     on2, off2), None
        return _ham_cycle_kernel(self.W, self.V), None

    def ingest_challenge(self, r: int, round: int) -> None:
        if round < self.log_K:
            r_on = ops.pack_ints([r])
            r_off = ops.pack_ints([(1 - r) % P])
            self.U = _update_u(self.U, self.masks[round], r_on, r_off)
            if round + 1 == self.log_K:
                self.V = self.U
        else:
            r_dev = ops.pack_ints([r])
            self.W = dense.bind_high(self.W, r_dev, FR)
            self.V = dense.bind_high(self.V, r_dev, FR)

    def finalize(self) -> None:
        self.final_openings = {"m": ops.unpack_ints(self.V)[0]}

    def cache_openings(self, accumulator: OpeningAccumulator,
                       r_slice: Sequence[int]) -> None:
        pt = list(r_slice[self.log_K:]) + list(r_slice[:self.log_K])
        accumulator.insert(("hamming", self.label), pt,
                           self.final_openings["m"])

    def expected_output_claim(self, accumulator, r):  # pragma: no cover
        raise NotImplementedError

    # ---- fused (device-transcript) protocol ----------------------------

    def fused_key(self):
        return (self.log_K, self.log_T)

    def fused_consts(self):
        return {"masks": tuple(self.masks)}

    def fused_state(self):
        return {"U": self.U, "W": self.W}

    def fused_message(self, consts, st, round: int):
        on2 = _mont_consts([0, 2])
        off2 = _mont_consts([1, -1])
        if round < self.log_K:
            return _sham_addr_kernel(st["W"], st["U"],
                                     consts["masks"][round], on2, off2)
        return _ham_cycle_kernel(st["W"], st["V"])

    def fused_bind(self, consts, st, r, round: int):
        st = dict(st)
        if round < self.log_K:
            one = ops.ones((1,))
            r_off = ops.sub(one, r, FR)
            st["U"] = _update_u(st["U"], consts["masks"][round], r, r_off)
            if round + 1 == self.log_K:
                st["V"] = st["U"]
        else:
            st["W"] = dense.bind_high(st["W"], r, FR)
            st["V"] = dense.bind_high(st["V"], r, FR)
        return st

    def fused_finals(self, st):
        return {"V": st["V"]}

    def fused_store(self, finals) -> None:
        self.V = finals["V"]

    # ---- scan-fused protocol --------------------------------------------

    def scan_plan(self):
        return [("addr", self.log_K), ("cycle", self.log_T)]

    def scan_state0(self):
        return {"U": self.U, "W": self.W}

    def scan_xs(self, mode, lo, hi):
        if mode != "addr":
            return ()
        return {"mask": jnp.stack(self.masks[lo:hi])}

    def scan_message(self, mode, bc, x, st):
        if mode == "addr":
            on2 = _mont_consts([0, 2])
            off2 = _mont_consts([1, -1])
            return _sham_addr_kernel(st["W"], st["U"], x["mask"], on2, off2)
        return scan.pair_prod_message([st["W"], st["V"]], 2)

    def scan_bind(self, mode, bc, x, st, r):
        st = dict(st)
        if mode == "addr":
            one = ops.ones((1,))
            r_off = ops.sub(one, r, FR)
            st["U"] = _update_u(st["U"], x["mask"], r, r_off)
        else:
            st["W"] = scan.pair_bind(st["W"], r)
            st["V"] = scan.pair_bind(st["V"], r)
        return st

    def scan_transition(self, prev_mode, next_mode, bc, st):
        return {"W": scan.to_pair_order(st["W"]),
                "V": scan.to_pair_order(st["U"])}

    def scan_shrink_plan(self, mode, n_rounds):
        if mode != "cycle":
            return []
        return scan.default_shrink_plan(n_rounds, self.T)

    def scan_shrink(self, mode, s, bc, st):
        n = self.T >> s
        return {"W": st["W"][..., :n], "V": st["V"][..., :n]}

    def scan_finals(self, st):
        return {"V": st["V"][:, :1]}


class HammingWeightVerifier(SumcheckInstance):
    degree = 2

    def __init__(self, log_K: int, log_T: int, r_cycle: Sequence[int],
                 m_opening: int):
        self.log_K, self.log_T = log_K, log_T
        self.r_cycle = [r % P for r in r_cycle]
        self.m_opening = m_opening % P

    @property
    def num_rounds(self) -> int:
        return self.log_K + self.log_T

    def input_claim(self, accumulator: OpeningAccumulator) -> int:
        return 1

    def compute_message(self, round, prev):  # pragma: no cover
        raise NotImplementedError("verifier instance")

    def ingest_challenge(self, r, round):  # pragma: no cover
        raise NotImplementedError("verifier instance")

    def expected_output_claim(self, accumulator: OpeningAccumulator,
                              r: Sequence[int]) -> int:
        r_cyc2 = list(r[self.log_K:])
        return eq.eq_int(self.r_cycle, r_cyc2) * self.m_opening % P
