"""Grouped one-hot sumcheck relations: many matrices / claims, ONE instance.

Stages 7 (booleanity + Hamming weight over every one-hot access matrix) and
8 (opening reduction of every committed-poly claim) naturally contain tens
of structurally-identical sumcheck instances (round 2 reached 42 and ~50).
Each instance is cheap, but a fused/scan stage compiles every instance's
kernels into one XLA module -- compile time explodes with the count, and
even the host engine pays per-instance dispatch.

This module batches same-shape instances protocol-level: a group of m
matrices (shared K, T) with per-matrix opening points folds into ONE
sumcheck instance via a gamma-RLC drawn AFTER all points/claims are fixed:

    combined_claim = sum_q gamma^q claim_q
    message(X)     = sum_q gamma^q message_q(X)

which is the standard batched-sumcheck soundness argument applied inside
the instance; the verifier recomputes sum_q gamma^q expected_q from the
per-matrix openings the prover still emits.

Device layout: every per-matrix array gains a leading matrix axis --
U/S/W: (L, M, T); A/chi consts: (L, M).  The address-round suffix weights
S_b(j) = prod_{i>b} chi(q_i, bit_i(c_j)) are maintained by DIVISION
(S_{b+1} = S_b * inv(chi(q_{b+1}, bit)) with the two per-round scalar
inverses computed host-side) instead of materializing log_K per-round
tables -- O(M*T) state instead of O(log_K * M * T) stacked constants.
This requires chi(q_i, 0/1) != 0, i.e. no point coordinate in {0, 1};
coordinates are 125-bit Fiat-Shamir challenges, so a zero appears with
probability ~2^-124 (construction raises ValueError host-side if hit).

Matrices without an address point (Hamming weight: no eq(r_addr, k)
factor) ride the same code with the affine chi factors pinned to the
constant 1, so Hamming and point-carrying matrices can share a group.

Reference: `subprotocols/booleanity.rs`, `zkvm/ram/hamming_booleanity.rs`,
`poly/opening_proof.rs` (reduction of many claims); the grouping itself is
a TPU-side protocol choice (documented in README) -- it changes the
Fiat-Shamir transcript relative to one-instance-per-matrix batching but
not the statement proved.
"""

from __future__ import annotations

from functools import partial
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..field import FR, ops
from ..poly import dense, eq
from ..poly.univariate import UniPoly
from ..sumcheck import scan
from ..sumcheck.engine import OpeningAccumulator, SumcheckInstance
from ..sumcheck.scan import ScanFusedInstance

P = FR.modulus


def _chi(q: int, bit: int) -> int:
    return (q if bit else (1 - q)) % P


def _pack_col(vals: Sequence[int]) -> jnp.ndarray:
    """(L, M) Montgomery constants from host ints."""
    return ops.pack_ints([v % P for v in vals])


# ---------------------------------------------------------------------------
# device kernels (shared by the host-engine and scan paths)
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnames=('fp',))
def _g_onehot_update_u(U, mask, r_on, r_off, fp=FR):
    """U *= chi(r, bit): (L,M,T) with (M,T) mask, scalar (L,1,1) r terms."""
    return ops.mont_mul(U, jnp.where(mask[None], r_on, r_off), fp)


@partial(jax.jit, static_argnames=('fp',))
def _g_onehot_scale_m(X, c, fp=FR):
    """X (L,M,T) *= per-matrix scalars c (L,M)."""
    return ops.mont_mul(X, c[:, :, None], fp)


@partial(jax.jit, static_argnames=('fp',))
def _gval_addr_kernel(W, S, U, mask, on2, off2, chiX, A, fp=FR):
    """Grouped value/opening address round, X in {0,2}:
    msg(X) = sum_q A_q chiX_q(X) sum_j W S U chi(X, mask).
    W: (L,1|M,T); S/U: (L,M,T); mask: (M,T); on2/off2: (L,2,1,1);
    chiX: (L,2,M); A: (L,M).  Returns (L,2,1).

    Eval points computed SEQUENTIALLY (static loop) so peak transients
    stay (L,M,T)-sized -- the all-points (L,d,M,T) tensor exhausted HBM
    at 2^18 x 19 matrices."""
    npts = on2.shape[1]
    G = ops.mont_mul(ops.mont_mul(W, S, fp), U, fp)          # (L,M,T)
    outs = []
    for x in range(npts):
        sel = jnp.where(mask[None], on2[:, x], off2[:, x])   # (L,M,T)
        part = ops.sum_mod(ops.mont_mul(G, sel, fp), fp)     # (L,M,1)
        part = ops.mont_mul(part[..., 0], chiX[:, x], fp)    # (L,M)
        part = ops.mont_mul(part, A, fp)
        outs.append(ops.sum_mod(part, fp))                   # (L,1)
    return jnp.stack(outs, axis=1)                           # (L,npts,1)


@partial(jax.jit, static_argnames=('fp',))
def _gbool_addr_kernel(W, S, U, mask, on3, off3, chiX, A, fp=FR):
    """Grouped booleanity address round, X in {0,2,3}:
    msg(X) = sum_q A_q chiX_q(X) sum_j W S (t^2 - t),  t = U chi(X, mask).
    Sequential eval points (see _gval_addr_kernel)."""
    npts = on3.shape[1]
    G = ops.mont_mul(W, S, fp)                               # (L,M,T)
    outs = []
    for x in range(npts):
        sel = jnp.where(mask[None], on3[:, x], off3[:, x])
        t = ops.mont_mul(U, sel, fp)
        tt = ops.sub(ops.mont_mul(t, t, fp), t, fp)
        part = ops.sum_mod(ops.mont_mul(G, tt, fp), fp)      # (L,M,1)
        part = ops.mont_mul(part[..., 0], chiX[:, x], fp)
        part = ops.mont_mul(part, A, fp)
        outs.append(ops.sum_mod(part, fp))
    return jnp.stack(outs, axis=1)                           # (L,npts,1)


@partial(jax.jit, static_argnames=('degree', 'booleanity', 'fp'))
def _g_cycle_kernel(E, V, A, degree: int, booleanity: bool, fp=FR):
    """Grouped cycle round on pair-order arrays (E: (L,1|M,T), V: (L,M,T)):
    msg(X) = sum_q A_q sum_pairs E(X) f(V(X)), f = (v^2-v) or v.
    Sequential eval points keep transients (L,M,T/2)-sized."""
    lo_e, hi_e = E[..., 0::2], E[..., 1::2]
    me = ops.sub(hi_e, lo_e, fp)
    lo_v, hi_v = V[..., 0::2], V[..., 1::2]
    mv = ops.sub(hi_v, lo_v, fp)
    e_cur, v_cur = lo_e, lo_v                                # X = 0
    outs = []
    for X in (0, 2, 3)[:degree]:
        if X == 2:
            e_cur = ops.add(hi_e, me, fp)
            v_cur = ops.add(hi_v, mv, fp)
        elif X == 3:
            e_cur = ops.add(e_cur, me, fp)
            v_cur = ops.add(v_cur, mv, fp)
        v_use = (ops.sub(ops.mont_mul(v_cur, v_cur, fp), v_cur, fp)
                 if booleanity else v_cur)
        part = ops.sum_mod(ops.mont_mul(e_cur, v_use, fp), fp)  # (L,M,1)
        part = ops.mont_mul(part[..., 0], A, fp)
        outs.append(ops.sum_mod(part, fp))
    return jnp.stack(outs, axis=1)                           # (L,d,1)


@partial(jax.jit, static_argnames=('fp',))
def _g_cycle_bind(E, V, r, fp=FR):
    r3 = r[:, :, None]    # (L,1,1): broadcast over the matrix axis
    return scan.pair_bind(E, r3, fp), scan.pair_bind(V, r3, fp)


@partial(jax.jit, static_argnames=('fp',))
def _affine_at(c0, c1, r, fp=FR):
    """Per-matrix affine chi at challenge r: c0 + c1*r; (L,M) each."""
    return ops.add(c0, ops.mont_mul(c1, r, fp), fp)


# ---------------------------------------------------------------------------
# the grouped instance
# ---------------------------------------------------------------------------

class GroupedOneHot(ScanFusedInstance):
    """m one-hot matrices over a shared (K, T); per-matrix statement

      booleanity=False:  claim_q = sum_{k,j} eq(pt_q, (k,j)) M_q(k,j)
                         (pt_q = None drops the address factor:
                          claim_q = sum_{k,j} w_q(j) M_q(k,j), Hamming)
      booleanity=True:   0 = sum_{k,j} eq(q_addr,k) w_q(j) (M^2 - M)

    combined with gamma powers into one sumcheck of num_rounds =
    log_K + log_T (address vars first, MSB to LSB, then cycle vars).

    streams:   list of m per-cycle index streams (len T each)
    w_tables:  list of m cycle-weight device tables (L,T) (eq(r_cyc_q, .))
    q_addrs:   list of m address points (len log_K) or None
    claims:    list of m input claims (ints)
    labels:    list of m (opening_id) labels for cache_openings
    """

    def __init__(self, streams, K: int, w_tables, q_addrs, claims, gamma: int,
                 labels, booleanity: bool = False,
                 opening_kind: Optional[str] = None):
        self.M = len(streams)
        assert self.M == len(w_tables) == len(q_addrs) == len(claims) \
            == len(labels)
        self.K = K
        self.log_K = K.bit_length() - 1
        self.T = len(streams[0])
        self.log_T = self.T.bit_length() - 1
        self.booleanity = booleanity
        self.degree = 3 if booleanity else 2
        self.npts = self.degree
        self.gamma = gamma % P
        self.labels = list(labels)
        self.opening_kind = opening_kind
        self.q_addrs = [None if q is None else [x % P for x in q]
                        for q in q_addrs]
        self._claims = [c % P for c in claims]

        idx = np.stack([np.asarray(s, dtype=np.int64) for s in streams])
        assert idx.shape == (self.M, self.T)
        assert self.K <= 256, "one-hot chunks are committed at K <= 256"
        # the scan path ships ONE (M, T) uint8 index array and extracts
        # mask bits on device per round ((idx >> shift) & 1) -- the
        # (log_K, M, T) bool mask stacks were the stage-7/8 upload
        # hotspot (~2*log_K*M*T bytes per instance over the ~20 MB/s
        # axon tunnel); the host-engine path still builds them lazily
        self._idx_np = idx.astype(np.uint8)
        self._idx_dev = jnp.asarray(self._idx_np)
        self._masks = None

        # gamma-weighted cycle tables.  When all matrices share ONE cycle
        # table (stage 7: every member uses the same eq table), keep W as
        # (L, 1, T) and fold the gamma powers into the per-matrix scalar A
        # instead -- at 2^18 x 19 matrices the per-matrix stack was 400 MB
        # per instance of pure duplication.  Identical math either way.
        gams = []
        gam = 1
        for _ in w_tables:
            gams.append(gam)
            gam = gam * self.gamma % P
        shared_w = all(w is w_tables[0] for w in w_tables)
        if shared_w:
            self.W = w_tables[0][:, None, :]
            A0 = _pack_col(gams)
        else:
            self.W = jnp.stack(
                [ops.mont_mul(w, _pack_col([g]))
                 for w, g in zip(w_tables, gams)], axis=1)
            A0 = None

        # per-round host chi data (value side of each address variable)
        self._chi_on = []    # chi(q_b, 1) per matrix (1 when no point)
        self._chi_off = []   # chi(q_b, 0)
        for b in range(self.log_K):
            on, off = [], []
            for q in self.q_addrs:
                if q is None:
                    on.append(1)
                    off.append(1)
                else:
                    cb = q[b]
                    if cb % P in (0, 1):
                        raise ValueError(
                            "grouped one-hot: point coordinate in {0,1} "
                            "(probability ~2^-124 for FS challenges)")
                    on.append(cb)
                    off.append((1 - cb) % P)
            self._chi_on.append(on)
            self._chi_off.append(off)

        # initial suffix products S_0 = prod_{i>0} chi(q_i, bit_i(c_j))
        # (device-extracted mask bits: no (M, T) bool uploads)
        S = ops.ones((self.M, self.T))
        for b in range(self.log_K - 1, 0, -1):
            S = _g_onehot_update_u(S, self._mask_dev(b),
                                   _mcol3(self._chi_on[b]),
                                   _mcol3(self._chi_off[b]))
        self.S = S
        self.U = ops.ones((self.M, self.T))
        self.A = ops.ones((self.M,)) if A0 is None else A0
        self.E: Optional[jnp.ndarray] = None
        self.V: Optional[jnp.ndarray] = None
        self.final_openings: Optional[List[int]] = None

    @property
    def masks(self):
        """(log_K, M, T) bool, bit_b of each stream (b=0 = address MSB);
        host-engine path only -- built lazily."""
        if self._masks is None:
            idx = self._idx_np
            self._masks = np.stack(
                [((idx >> (self.log_K - 1 - b)) & 1).astype(bool)
                 for b in range(self.log_K)])
        return self._masks

    def _mask_dev(self, b: int) -> jnp.ndarray:
        """bit_b mask extracted on device from the resident index array."""
        sh = np.uint8(self.log_K - 1 - b)
        return ((self._idx_dev >> sh) & np.uint8(1)).astype(jnp.bool_)

    # ---- engine interface ------------------------------------------------

    @property
    def num_rounds(self) -> int:
        return self.log_K + self.log_T

    def input_claim(self, accumulator: OpeningAccumulator) -> int:
        acc, gam = 0, 1
        for c in self._claims:
            acc = (acc + gam * c) % P
            gam = gam * self.gamma % P
        return acc

    def _consts_round(self, b: int):
        """(mask_b, chiX (L,d,M), inv_on/off (L,M,1) + mask for the NEXT
        suffix division S_{b+1} = S_b / chi(q_{b+1}, bit_{b+1}))."""
        xs = [0, 2, 3][:self.npts]
        chiX = ops.pack_ints(
            [(off + (on - off) * X) % P
             for X in xs
             for on, off in zip(self._chi_on[b], self._chi_off[b])]
        ).reshape(FR.num_limbs, self.npts, self.M)
        if b + 1 < self.log_K:
            inv_on = _mcol3([pow(v, -1, P) for v in self._chi_on[b + 1]])
            inv_off = _mcol3([pow(v, -1, P) for v in self._chi_off[b + 1]])
            nmask = jnp.asarray(self.masks[b + 1])
        else:
            one = [1] * self.M
            inv_on, inv_off = _mcol3(one), _mcol3(one)
            nmask = jnp.asarray(self.masks[b])   # no-op (inv = 1)
        return jnp.asarray(self.masks[b]), chiX, inv_on, inv_off, nmask

    def message_evals_dev(self, round: int):
        on = _onoff_consts(self.npts, True)
        off = _onoff_consts(self.npts, False)
        if round < self.log_K:
            mask, chiX, _, _, _ = self._consts_round(round)
            k = _gbool_addr_kernel if self.booleanity else _gval_addr_kernel
            return k(self.W, self.S, self.U, mask, on, off, chiX,
                     self.A), None
        return _g_cycle_kernel(self.E, self.V, self.A, self.degree,
                               self.booleanity), None

    def ingest_challenge(self, r: int, round: int) -> None:
        r_dev = ops.pack_ints([r])
        if round < self.log_K:
            mask, _, inv_on, inv_off, nmask = self._consts_round(round)
            one = ops.ones((1,))
            r_on = r_dev[:, :, None]
            r_off = ops.sub(one, r_dev, FR)[:, :, None]
            self.U = _g_onehot_update_u(self.U, mask, r_on, r_off)
            self.S = _g_onehot_update_u(self.S, nmask, inv_on, inv_off)
            # A *= chi_q(r) = off + (on - off) * r  (per matrix)
            c0 = _pack_col(self._chi_off[round])
            c1 = _pack_col([(on - off) % P for on, off in
                            zip(self._chi_on[round],
                                self._chi_off[round])])
            self.A = ops.mont_mul(self.A, _affine_at(c0, c1, r_dev), FR)
            if round + 1 == self.log_K:
                self.V = scan.to_pair_order(self.U)
                self.E = scan.to_pair_order(self.W)
        else:
            self.E, self.V = _g_cycle_bind(self.E, self.V, r_dev)

    def finalize(self) -> None:
        vals = ops.unpack_ints(self.V[..., 0])     # M ints
        self.final_openings = list(vals)

    def cache_openings(self, accumulator: OpeningAccumulator,
                       r_slice: Sequence[int]) -> None:
        if self.opening_kind is None:
            return
        # cycle-major committed layout: (r_cycle ++ r_addr)
        pt = list(r_slice[self.log_K:]) + list(r_slice[:self.log_K])
        for label, v in zip(self.labels, self.final_openings):
            accumulator.insert((self.opening_kind, label), pt, v)

    def expected_output_claim(self, accumulator, r):  # pragma: no cover
        raise NotImplementedError("prover instance")

    # ---- scan-fused protocol ---------------------------------------------

    def fused_key(self):
        return (self.M, self.log_K, self.log_T, self.booleanity)

    def scan_plan(self):
        return [("addr", self.log_K), ("cycle", self.log_T)]

    def scan_bconsts(self):
        return {"W": self.W, "idx": self._idx_dev}

    def scan_state0(self):
        return {"U": self.U, "S": self.S, "A": self.A}

    @staticmethod
    def _xmask(bc, shift) -> jnp.ndarray:
        """Per-round mask extracted on device: (idx >> shift) & 1."""
        return ((bc["idx"] >> shift) & np.uint8(1)).astype(jnp.bool_)

    def scan_xs(self, mode, lo, hi):
        if mode != "addr":
            return ()
        xs_p = [0, 2, 3][:self.npts]
        chiX = jnp.stack([
            ops.pack_ints(
                [(off + (on - off) * X) % P
                 for X in xs_p
                 for on, off in zip(self._chi_on[b], self._chi_off[b])]
            ).reshape(FR.num_limbs, self.npts, self.M)
            for b in range(lo, hi)])
        inv_on_r, inv_off_r, nshift = [], [], []
        for b in range(lo, hi):
            if b + 1 < self.log_K:
                inv_on_r.append(_mcol3([pow(v, -1, P)
                                        for v in self._chi_on[b + 1]]))
                inv_off_r.append(_mcol3([pow(v, -1, P)
                                         for v in self._chi_off[b + 1]]))
                nshift.append(self.log_K - 1 - (b + 1))
            else:
                one = [1] * self.M
                inv_on_r.append(_mcol3(one))
                inv_off_r.append(_mcol3(one))
                nshift.append(self.log_K - 1 - b)   # no-op (inv = 1)
        c0 = jnp.stack([_pack_col(self._chi_off[b]) for b in range(lo, hi)])
        c1 = jnp.stack([_pack_col([(on - off) % P for on, off in
                                   zip(self._chi_on[b], self._chi_off[b])])
                        for b in range(lo, hi)])
        shift = np.array([self.log_K - 1 - b for b in range(lo, hi)],
                         np.uint8)
        return {"shift": jnp.asarray(shift),
                "nshift": jnp.asarray(np.array(nshift, np.uint8)),
                "chiX": chiX,
                "inv_on": jnp.stack(inv_on_r),
                "inv_off": jnp.stack(inv_off_r),
                "c0": c0, "c1": c1}

    def scan_message(self, mode, bc, x, st):
        on = _onoff_consts(self.npts, True)
        off = _onoff_consts(self.npts, False)
        if mode == "addr":
            k = _gbool_addr_kernel if self.booleanity else _gval_addr_kernel
            return k(bc["W"], st["S"], st["U"], self._xmask(bc, x["shift"]),
                     on, off, x["chiX"], st["A"])
        return _g_cycle_kernel(st["E"], st["V"], st["A"], self.degree,
                               self.booleanity)

    def scan_bind(self, mode, bc, x, st, r):
        st = dict(st)
        if mode == "addr":
            one = ops.ones((1,))
            r_on = r[:, :, None]
            r_off = ops.sub(one, r, FR)[:, :, None]
            st["U"] = _g_onehot_update_u(st["U"], self._xmask(bc, x["shift"]),
                                         r_on, r_off)
            st["S"] = _g_onehot_update_u(st["S"],
                                         self._xmask(bc, x["nshift"]),
                                         x["inv_on"], x["inv_off"])
            st["A"] = ops.mont_mul(st["A"], _affine_at(x["c0"], x["c1"], r),
                                   FR)
        else:
            st["E"], st["V"] = _g_cycle_bind(st["E"], st["V"], r)
        return st

    def scan_transition(self, prev_mode, next_mode, bc, st):
        return {"E": scan.to_pair_order(bc["W"]),
                "V": scan.to_pair_order(st["U"]),
                "A": st["A"]}

    def scan_shrink_plan(self, mode, n_rounds):
        # address rounds are inherently O(M*T) each (U/S never shrink)
        if mode != "cycle":
            return []
        return scan.default_shrink_plan(n_rounds, self.M * self.T)

    def scan_shrink(self, mode, s, bc, st):
        n = self.T >> s
        return {"E": st["E"][..., :n], "V": st["V"][..., :n],
                "A": st["A"]}

    def scan_finals(self, st):
        return {"V": st["V"][..., :1]}

    def fused_store(self, finals) -> None:
        self.V = finals["V"]


def _mcol3(vals: Sequence[int]) -> jnp.ndarray:
    """Host ints -> (L, M, 1) Montgomery constants."""
    return _pack_col(vals)[:, :, None]


_ONOFF_CACHE = {}


def _onoff_consts(npts: int, bit_on: bool) -> jnp.ndarray:
    """chi(X, bit) at X in {0,2,3,...}: (L, npts, 1, 1) Montgomery."""
    key = (npts, bit_on)
    got = _ONOFF_CACHE.get(key)
    if got is None or isinstance(got, jax.core.Tracer):
        xs = [0, 2, 3][:npts]
        vals = [(X if bit_on else 1 - X) % P for X in xs]
        got = ops.pack_ints(vals)[:, :, None, None]
        if not isinstance(got, jax.core.Tracer):
            _ONOFF_CACHE[key] = got
    return got


# ---------------------------------------------------------------------------
# verifier twin
# ---------------------------------------------------------------------------

class GroupedOneHotVerifier(SumcheckInstance):
    """Verifier twin: expected = sum_q gamma^q expected_q with the
    per-matrix openings m_q taken from the proof."""

    def __init__(self, M: int, log_K: int, log_T: int, w_evals, q_addrs,
                 claims, gamma: int, m_openings, booleanity: bool = False):
        """w_evals: per-matrix CALLABLE r_cyc -> eq-table evaluation at the
        bound cycle point (host int), or a precomputed host int table
        closure; q_addrs as in the prover (None = no address factor)."""
        self.M = M
        self.log_K, self.log_T = log_K, log_T
        self.degree = 3 if booleanity else 2
        self.booleanity = booleanity
        self.w_evals = w_evals
        self.q_addrs = q_addrs
        self._claims = [c % P for c in claims]
        self.gamma = gamma % P
        self.m_openings = [m % P for m in m_openings]

    @property
    def num_rounds(self) -> int:
        return self.log_K + self.log_T

    def input_claim(self, accumulator: OpeningAccumulator) -> int:
        acc, gam = 0, 1
        for c in self._claims:
            acc = (acc + gam * c) % P
            gam = gam * self.gamma % P
        return acc

    def compute_message(self, round, prev):  # pragma: no cover
        raise NotImplementedError("verifier instance")

    def ingest_challenge(self, r, round):  # pragma: no cover
        raise NotImplementedError("verifier instance")

    def expected_output_claim(self, accumulator: OpeningAccumulator,
                              r: Sequence[int]) -> int:
        r_addr = [x % P for x in r[:self.log_K]]
        r_cyc = [x % P for x in r[self.log_K:]]
        total, gam = 0, 1
        for q, wf, m in zip(self.q_addrs, self.w_evals, self.m_openings):
            a = 1
            if q is not None:
                for qi, ri in zip(q, r_addr):
                    a = a * ((qi * ri + (1 - qi) * (1 - ri)) % P) % P
            w = wf(r_cyc)
            inner = (m * m - m) % P if self.booleanity else m
            total = (total + gam * a % P * w % P * inner) % P
            gam = gam * self.gamma % P
        return total
