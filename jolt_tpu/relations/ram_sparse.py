"""Sparse Twist RAM relations: O(T + K) memory, no dense K x T arrays.

TPU formulation of the reference's sorted sparse read/write matrices
(`subprotocols/read_write_matrix/mod.rs`, `ram.rs` RamCycleMajorEntry) and
the phase structure of `zkvm/ram/read_write_checking.rs`:

  * cycle phase (first log T rounds, LSB-first binding): the K x T matrices
    ra(k,j) / Val(k,j) are represented by one entry per ACCESS (here: one
    per cycle, since idle cycles access the dummy cell k=0).  Binding the
    cycle LSB pairs entries in the same column at adjacent rows; a missing
    partner's implicit coefficients are ra = 0 and Val = the value CARRIED
    between accesses (Val is constant within a column between accesses), so
    each entry tracks the u64 `prev`/`next` carried values exactly as the
    reference's `prev_val`/`next_val`.  Entry count never exceeds T.
  * address phase (last log K rounds, MSB-first binding on dense O(K)
    arrays): after all cycle variables bind, at most one entry per column
    survives; ra / Val materialize as K-length vectors (untouched columns
    keep ra = 0, Val = Init(k)) and the remaining rounds run dense.

The pairing pattern over all rounds depends only on the access positions,
NOT on the challenges, so the whole merge schedule precomputes host-side
with numpy (`RamPairSchedule`); per-round device work is static-shaped
gathers + field ops over at most T lanes.

Four relations share the schedule (all degree <= 3):
  rw checking:  sum eq(r_cyc,j) ra(k,j) ((1+g) Val(k,j) + g inc(j))
  raf:          sum eq(r_cyc,j) ra(k,j) A(k)          (A public affine)
  val eval:     sum LT(j,r_cyc) inc(j) ra(k,j) eqA(r_addr,k)
  output check: sum inc(j) ra(k,j) W(k)               (W public sparse)

Opening points are normalized to the canonical big-endian cycle-major
order (r_cycle ++ r_addr): cycle challenges arrive LSB-first and reverse;
address challenges arrive MSB-first and keep their order.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..field import FR, ops
from ..poly import dense, eq, lt
from ..poly.univariate import UniPoly
from ..sumcheck import scan
from ..sumcheck.engine import OpeningAccumulator, SumcheckInstance
from ..sumcheck.fused import FusedInstance
from ..sumcheck.scan import ScanFusedInstance
from ..witness.ram import address_of_index
from .ram import (RamOutputCheckVerifier, RamRafEvaluationVerifier,
                  RamReadWriteCheckingVerifier, RamValEvaluationVerifier,
                  init_mle_eval, output_region_cells, outputs_as_words)

P = FR.modulus


# ---------------------------------------------------------------------------
# host-side pair schedule
# ---------------------------------------------------------------------------

def _next_pow2(n: int) -> int:
    m = 1
    while m < n:
        m *= 2
    return m


class _Round:
    """One cycle-phase merge round.  Implicit-Val fills are stored as RAW
    u64 words ((2, Epad) uint32 lo/hi): the scan tier ships those and
    lifts on device inside the round body -- the pre-lifted (L, Epad)
    field stacks were 20x the bytes and OOM'd the 2^20 stage modules.
    The host/fused tiers lift lazily via the imp_e/imp_o properties."""

    __slots__ = ("even_src", "odd_src", "has_e", "has_o", "imp_e_u32",
                 "imp_o_u32", "rows", "cols", "n_real",
                 "_imp_e_dev", "_imp_o_dev")

    def __init__(self, even_src, odd_src, has_e, has_o, imp_e_u32,
                 imp_o_u32, rows, cols, n_real):
        self.even_src = even_src    # (Epad,) int32 into previous entries
        self.odd_src = odd_src
        self.has_e = has_e          # (Epad,) bool
        self.has_o = has_o
        self.imp_e_u32 = imp_e_u32  # (2, Epad) uint32: lo/hi words
        self.imp_o_u32 = imp_o_u32
        self.rows = rows            # (Epad,) int32 merged row index g
        self.cols = cols            # (Epad,) int64 column (K = pad sentinel)
        self.n_real = n_real
        self._imp_e_dev = None
        self._imp_o_dev = None

    @property
    def imp_e(self):                # (L, Epad) field (lazy; host/fused tiers)
        if self._imp_e_dev is None:
            self._imp_e_dev = ops.from_u64(
                jnp.asarray(self.imp_e_u32[0]), jnp.asarray(self.imp_e_u32[1]),
                FR)
        return self._imp_e_dev

    @property
    def imp_o(self):
        if self._imp_o_dev is None:
            self._imp_o_dev = ops.from_u64(
                jnp.asarray(self.imp_o_u32[0]), jnp.asarray(self.imp_o_u32[1]),
                FR)
        return self._imp_o_dev


class RamPairSchedule:
    """Precomputed cycle-phase merge schedule for one access stream.

    cols/pre/post: per-cycle accessed column + u64 value before/after
    (k = 0 dummy cell for idle cycles, pre = post = 0).
    """

    def __init__(self, cols: np.ndarray, pre: np.ndarray, post: np.ndarray,
                 K: int, rows: Optional[np.ndarray] = None,
                 T: Optional[int] = None):
        T = T if T is not None else len(cols)
        self.T = T
        self.log_T = T.bit_length() - 1
        self.K = K
        self.rounds: List[_Round] = []

        col = np.asarray(cols, dtype=np.int64)
        row = (np.arange(T, dtype=np.int64) if rows is None
               else np.asarray(rows, dtype=np.int64))
        prev = np.asarray(pre, dtype=np.uint64)
        nxt = np.asarray(post, dtype=np.uint64)

        for _ in range(self.log_T):
            E = len(col)
            order = np.lexsort((row, col))
            col_s, row_s = col[order], row[order]
            prev_s, nxt_s = prev[order], nxt[order]
            g_s = row_s >> 1
            new = np.ones(E, dtype=bool)
            new[1:] = (col_s[1:] != col_s[:-1]) | (g_s[1:] != g_s[:-1])
            gid = np.cumsum(new) - 1
            n_pairs = int(gid[-1]) + 1 if E else 0
            Epad = _next_pow2(max(n_pairs, 1))

            even_m = (row_s & 1) == 0
            even_src = np.full(Epad, -1, dtype=np.int64)
            odd_src = np.full(Epad, -1, dtype=np.int64)
            even_src[gid[even_m]] = order[even_m]
            odd_src[gid[~even_m]] = order[~even_m]
            # per-pair carried values from whichever side is present
            e_prev = np.zeros(Epad, dtype=np.uint64)
            e_next = np.zeros(Epad, dtype=np.uint64)
            o_prev = np.zeros(Epad, dtype=np.uint64)
            o_next = np.zeros(Epad, dtype=np.uint64)
            e_prev[gid[even_m]] = prev_s[even_m]
            e_next[gid[even_m]] = nxt_s[even_m]
            o_prev[gid[~even_m]] = prev_s[~even_m]
            o_next[gid[~even_m]] = nxt_s[~even_m]
            has_e = even_src >= 0
            has_o = odd_src >= 0
            imp_e_u64 = np.where(~has_e, o_prev, 0).astype(np.uint64)
            imp_o_u64 = np.where(~has_o, e_next, 0).astype(np.uint64)

            rows_pair = np.zeros(Epad, dtype=np.int64)
            rows_pair[gid] = g_s
            cols_pair = np.full(Epad, self.K, dtype=np.int64)
            cols_pair[gid] = col_s

            def u32_words(a):
                return np.stack([(a & np.uint64(0xFFFFFFFF)).astype(np.uint32),
                                 (a >> np.uint64(32)).astype(np.uint32)])

            self.rounds.append(_Round(
                even_src=jnp.asarray(np.maximum(even_src, 0), jnp.int32),
                odd_src=jnp.asarray(np.maximum(odd_src, 0), jnp.int32),
                has_e=jnp.asarray(has_e),
                has_o=jnp.asarray(has_o),
                imp_e_u32=u32_words(imp_e_u64),
                imp_o_u32=u32_words(imp_o_u64),
                rows=jnp.asarray(rows_pair, jnp.int32),
                cols=cols_pair,
                n_real=n_pairs,
            ))

            # next round's entries = this round's pairs
            col = cols_pair[:n_pairs].copy()
            row = rows_pair[:n_pairs].copy()
            prev = np.where(has_e[:n_pairs], e_prev[:n_pairs],
                            o_prev[:n_pairs]).astype(np.uint64)
            nxt = np.where(has_o[:n_pairs], o_next[:n_pairs],
                           e_next[:n_pairs]).astype(np.uint64)

        self.final_cols = col           # (n_final,) distinct columns
        self.initial_pre = np.asarray(pre, dtype=np.uint64)
        self.n_entries0 = len(cols)

    def initial_val(self) -> jnp.ndarray:
        lo = jnp.asarray((self.initial_pre & np.uint64(0xFFFFFFFF))
                         .astype(np.uint32))
        hi = jnp.asarray((self.initial_pre >> np.uint64(32)).astype(np.uint32))
        return ops.from_u64(lo, hi, FR)


# ---------------------------------------------------------------------------
# device kernels
# ---------------------------------------------------------------------------

def _evals3(e, o, fp=FR):
    """Univariate evals at X in {0,2,3}: (L,E) pairs -> (L,3,E)."""
    m = ops.sub(o, e, fp)
    v2 = ops.add(o, m, fp)
    v3 = ops.add(v2, m, fp)
    return jnp.stack([e, v2, v3], axis=1)


@partial(jax.jit, static_argnames=('fp',))
def _gather_pairs(X, src_e, src_o, has_e, has_o, fill_e, fill_o, fp=FR):
    """Pairwise gather with implicit fills: (L,E'),(L,E') even/odd lanes."""
    xe = jnp.where(has_e[None, :], X[:, src_e], fill_e)
    xo = jnp.where(has_o[None, :], X[:, src_o], fill_o)
    return xe, xo


@partial(jax.jit, static_argnames=('fp',))
def _rw_cycle_message(RA, VAL, EQ, INC, rnd_src_e, rnd_src_o, has_e, has_o,
                      imp_e, imp_o, rows, one_pg, g, fp=FR):
    zero = jnp.zeros_like(imp_e)
    rae, rao = _gather_pairs(RA, rnd_src_e, rnd_src_o, has_e, has_o,
                             zero, zero, fp)
    vale, valo = _gather_pairs(VAL, rnd_src_e, rnd_src_o, has_e, has_o,
                               imp_e, imp_o, fp)
    eq3 = _evals3(EQ[:, 2 * rows], EQ[:, 2 * rows + 1], fp)
    inc3 = _evals3(INC[:, 2 * rows], INC[:, 2 * rows + 1], fp)
    ra3 = _evals3(rae, rao, fp)
    val3 = _evals3(vale, valo, fp)
    term = ops.add(ops.mont_mul(one_pg[:, None], val3, fp),
                   ops.mont_mul(g[:, None], inc3, fp), fp)
    return ops.sum_mod(ops.mont_mul(eq3, ops.mont_mul(ra3, term, fp), fp), fp)


@partial(jax.jit, static_argnames=('fp',))
def _prod_cycle_message(RA, CYC, AC, rnd_src_e, rnd_src_o, has_e, has_o,
                        rows, fp=FR):
    """sum_pairs AC_pair * ra(X) * prod_f CYC[f](X); CYC: (L,F,T_t)."""
    zero = ops.zeros(rnd_src_e.shape, fp)
    rae, rao = _gather_pairs(RA, rnd_src_e, rnd_src_o, has_e, has_o,
                             zero, zero, fp)
    acc = _evals3(rae, rao, fp)
    F = CYC.shape[1]
    for f in range(F):
        c3 = _evals3(CYC[:, f, 2 * rows], CYC[:, f, 2 * rows + 1], fp)
        acc = ops.mont_mul(acc, c3, fp)
    return ops.sum_mod(ops.mont_mul(AC[:, None, :], acc, fp), fp)


@partial(jax.jit, static_argnames=('fp',))
def _bind_pairs(X, src_e, src_o, has_e, has_o, fill_e, fill_o, r, fp=FR):
    xe, xo = _gather_pairs(X, src_e, src_o, has_e, has_o, fill_e, fill_o, fp)
    return ops.add(xe, ops.mont_mul(r, ops.sub(xo, xe, fp), fp), fp)


@partial(jax.jit, static_argnames=('fp',))
def _rw_addr_message(RA_K, VAL_K, one_pg, ginc, fp=FR):
    """evals at {0,2,3} of sum_k ra(X) * ((1+g) val(X) + g*inc_c)."""
    ra3 = dense.sumcheck_eval_points_high(RA_K, 3, fp)
    val3 = dense.sumcheck_eval_points_high(VAL_K, 3, fp)
    term = ops.add(ops.mont_mul(one_pg[:, None], val3, fp),
                   jnp.broadcast_to(ginc[:, None, :], val3.shape), fp)
    return ops.sum_mod(ops.mont_mul(ra3, term, fp), fp)


@partial(jax.jit, static_argnames=('fp',))
def _prod_addr_message(RA_K, TAB_K, fp=FR):
    ra3 = dense.sumcheck_eval_points_high(RA_K, 3, fp)
    t3 = dense.sumcheck_eval_points_high(TAB_K, 3, fp)
    return ops.sum_mod(ops.mont_mul(ra3, t3, fp), fp)


@partial(jax.jit, static_argnames=('K', 'fp'))
def _materialize(vals, cols, base, K: int, fp=FR):
    """Scatter (L,E) entry values into the (L,K) base table at cols."""
    return base.at[:, cols].set(vals)


def _padE(a: jnp.ndarray, Emax: int) -> jnp.ndarray:
    """Zero/False-pad the last axis to the scan-fixed entry width."""
    pad = Emax - a.shape[-1]
    if pad == 0:
        return a
    widths = [(0, 0)] * a.ndim
    widths[-1] = (0, pad)
    return jnp.pad(a, widths)


def _rw_addr_message_pairs(RA_K, VAL_K, one_pg, ginc, fp=FR):
    """_rw_addr_message twin for pair-order storage (scan path)."""
    ra3 = scan.pair_eval_points(RA_K, 3, fp)
    val3 = scan.pair_eval_points(VAL_K, 3, fp)
    term = ops.add(ops.mont_mul(one_pg[:, None], val3, fp),
                   jnp.broadcast_to(ginc[:, None, :], val3.shape), fp)
    return ops.sum_mod(ops.mont_mul(ra3, term, fp), fp)


# ---------------------------------------------------------------------------
# shared prover base
# ---------------------------------------------------------------------------

class _SparseRamBase(ScanFusedInstance):
    """Cycle phase on the pair schedule, address phase on dense K arrays."""

    degree = 3

    def __init__(self, sched: RamPairSchedule, log_K: int):
        self.sched = sched
        self.log_T = sched.log_T
        self.log_K = log_K
        self.K = 1 << log_K
        self.RA = ops.ones((sched.n_entries0,))
        self.final_openings: Optional[dict] = None
        self.RA_K: Optional[jnp.ndarray] = None

    @property
    def num_rounds(self) -> int:
        return self.log_T + self.log_K

    # -- hooks ----------------------------------------------------------
    def _cycle_message(self, t: int, rnd: _Round) -> jnp.ndarray: ...
    def _cycle_bind(self, rnd: _Round, r_dev) -> None: ...
    def _enter_addr_phase(self) -> None: ...
    def _addr_message(self) -> jnp.ndarray: ...
    def _addr_bind(self, r_dev) -> None: ...
    def _addr_scale(self) -> int:
        return 1

    def message_evals_dev(self, round: int):
        if round < self.log_T:
            return self._cycle_message(round, self.sched.rounds[round]), None
        s = self._addr_scale()
        post = None if s == 1 else (lambda evals: [s * v % P for v in evals])
        return self._addr_message(), post

    def ingest_challenge(self, r: int, round: int) -> None:
        r_dev = ops.pack_ints([r])
        if round < self.log_T:
            rnd = self.sched.rounds[round]
            zero = jnp.zeros_like(rnd.imp_e)
            self.RA = _bind_pairs(self.RA, rnd.even_src, rnd.odd_src,
                                  rnd.has_e, rnd.has_o, zero, zero, r_dev)
            self._cycle_bind(rnd, r_dev)
            if round + 1 == self.log_T:
                n = len(self.sched.final_cols)
                cols = jnp.asarray(self.sched.final_cols, jnp.int32)
                self.RA_K = _materialize(self.RA[:, :n], cols,
                                         ops.zeros((self.K,)), self.K)
                self._enter_addr_phase()
        else:
            self.RA_K = dense.bind_high(self.RA_K, r_dev, FR)
            self._addr_bind(r_dev)

    def normalize_opening_point(self, r: Sequence[int]) -> List[int]:
        r_cyc = list(reversed(r[:self.log_T]))
        return r_cyc + list(r[self.log_T:])

    # ---- fused (device-transcript) protocol ----------------------------
    # Same algebra under one jit dispatch for the whole stage; the host
    # `post` scale factors are applied on device (exact mod-p ops, so the
    # proof bytes are identical).  Subclasses fill the _f_* hooks.

    def fused_key(self):
        return (self.log_T, self.log_K, len(self.sched.final_cols))

    def fused_consts(self):
        sched = tuple(
            (r.even_src, r.odd_src, r.has_e, r.has_o, r.imp_e, r.imp_o,
             r.rows)
            for r in self.sched.rounds)
        return {"sched": sched,
                "cols": jnp.asarray(self.sched.final_cols, jnp.int32),
                **self._f_consts_extra()}

    def _f_consts_extra(self) -> dict:
        return {}

    def _f_cycle_message(self, consts, st, t: int, rnd): ...
    def _f_cycle_bind(self, consts, st, t: int, rnd, r): ...

    def _f_enter_addr(self, consts, st):
        return st

    def _f_addr_message(self, consts, st): ...

    def _f_addr_scale(self, consts, st):
        return None

    def _f_addr_bind(self, consts, st, r): ...

    def fused_message(self, consts, st, round: int):
        if round < self.log_T:
            return self._f_cycle_message(consts, st, round,
                                         consts["sched"][round])
        msg = self._f_addr_message(consts, st)
        scale = self._f_addr_scale(consts, st)
        if scale is not None:
            msg = ops.mont_mul(msg, scale[:, None, :])
        return msg

    def fused_bind(self, consts, st, r, round: int):
        st = dict(st)
        if round < self.log_T:
            rnd = consts["sched"][round]
            e, o, he, ho, ie, io, rows = rnd
            zero = jnp.zeros_like(ie)
            st["RA"] = _bind_pairs(st["RA"], e, o, he, ho, zero, zero, r)
            st = self._f_cycle_bind(consts, st, round, rnd, r)
            if round + 1 == self.log_T:
                n = len(self.sched.final_cols)
                st["RA_K"] = _materialize(st["RA"][:, :n], consts["cols"],
                                          ops.zeros((self.K,)), self.K)
                st = self._f_enter_addr(consts, st)
        else:
            st["RA_K"] = dense.bind_high(st["RA_K"], r, FR)
            st = self._f_addr_bind(consts, st, r)
        return st

    # ---- scan-fused protocol --------------------------------------------
    # Same algebra again, re-rolled for lax.scan: entry buffers live at the
    # fixed width Emax (schedules zero-padded per round, stacked as xs),
    # dense cycle arrays bind with prefix compaction, and the address
    # phase runs on pair-order K arrays.  Subclasses fill the _s_* hooks.

    _s_needs_imp = False   # rw variants gather implicit Val fills

    def _emax(self) -> int:
        return _next_pow2(max(self.sched.n_entries0, 1))

    def scan_plan(self):
        return [("cycle", self.log_T), ("addr", self.log_K)]

    def scan_bconsts(self):
        return {"cols": jnp.asarray(self.sched.final_cols, jnp.int32),
                **self._s_bconsts_extra()}

    def _s_bconsts_extra(self) -> dict:
        return {}

    def scan_state0(self):
        Emax = self._emax()
        st = {"RA": _padE(self.RA, Emax)}
        st.update(self._s_state0_extra(Emax))
        return st

    def _s_state0_extra(self, Emax: int) -> dict:
        return {}

    def scan_xs(self, mode, lo, hi):
        if mode != "cycle":
            return ()
        Emax = self._chunk_emax(lo)
        rounds = self.sched.rounds[lo:hi]
        xs = {
            "e": jnp.stack([_padE(r.even_src, Emax) for r in rounds]),
            "o": jnp.stack([_padE(r.odd_src, Emax) for r in rounds]),
            "he": jnp.stack([_padE(r.has_e, Emax) for r in rounds]),
            "ho": jnp.stack([_padE(r.has_o, Emax) for r in rounds]),
            "rows": jnp.stack([_padE(r.rows, Emax) for r in rounds]),
        }
        if self._s_needs_imp:
            # RAW u64 words ((rounds, 2, Emax) uint32); lifted to field
            # form on device inside the round body -- 20x fewer bytes
            # than the pre-lifted limb stacks
            xs["ie"] = jnp.stack(
                [_padE(jnp.asarray(r.imp_e_u32), Emax) for r in rounds])
            xs["io"] = jnp.stack(
                [_padE(jnp.asarray(r.imp_o_u32), Emax) for r in rounds])
        xs.update(self._s_xs_extra(lo, hi, Emax))
        return xs

    def _s_xs_extra(self, lo: int, hi: int, Emax: int) -> dict:
        return {}

    def _s_cycle_message(self, bc, x, st): ...
    def _s_cycle_bind(self, bc, x, st, r): ...

    def _s_enter_addr(self, bc, st, out):
        return out

    def _s_addr_message(self, bc, st): ...

    def _s_addr_scale(self, bc, st):
        return None

    def _s_addr_bind(self, bc, st, r):
        return st

    def scan_message(self, mode, bc, x, st):
        if mode == "cycle":
            return self._s_cycle_message(bc, x, st)
        msg = self._s_addr_message(bc, st)
        sc = self._s_addr_scale(bc, st)
        if sc is not None:
            msg = ops.mont_mul(msg, sc[:, None, :])
        return msg

    def scan_bind(self, mode, bc, x, st, r):
        st = dict(st)
        if mode == "cycle":
            zero = ops.zeros((x["e"].shape[-1],))
            st["RA"] = _bind_pairs(st["RA"], x["e"], x["o"], x["he"],
                                   x["ho"], zero, zero, r)
            return self._s_cycle_bind(bc, x, st, r)
        st["RA_K"] = scan.pair_bind(st["RA_K"], r)
        return self._s_addr_bind(bc, st, r)

    def scan_transition(self, prev_mode, next_mode, bc, st):
        n = len(self.sched.final_cols)
        RA_K = _materialize(st["RA"][:, :n], bc["cols"],
                            ops.zeros((self.K,)), self.K)
        out = {"RA_K": scan.to_pair_order(RA_K)}
        return self._s_enter_addr(bc, st, out)

    # ---- shrink points (scan segments restart with sliced state) --------

    _S_ENTRY_KEYS = ("RA", "VAL", "WA", "RA1", "RA2")
    _S_CYC_KEYS = ("EQ", "INC", "LT")

    def _e_need(self, s: int) -> int:
        """Entry-buffer bound for cycle rounds >= s: the prefix holding
        round s-1's merged entries plus every later round's output pad."""
        pads = [int(r.even_src.shape[0]) for r in self.sched.rounds[s:]]
        prev = (_next_pow2(max(self.sched.rounds[s - 1].n_real, 1))
                if s > 0 else self._emax())
        return max([prev] + pads)

    def _chunk_emax(self, lo: int) -> int:
        s = max([0] + [p for p in
                       self.scan_shrink_plan("cycle", self.log_T)
                       if p <= lo])
        return self._e_need(s) if s > 0 else self._emax()

    def scan_shrink_plan(self, mode, n_rounds):
        if mode == "cycle":
            return scan.sparse_shrink_plan(n_rounds, self.sched.T)
        return scan.default_shrink_plan(n_rounds, self.K)

    def scan_shrink(self, mode, s, bc, st):
        st = dict(st)
        if mode == "cycle":
            En = self._e_need(s)
            Tn = self.sched.T >> s
            for k, v in st.items():
                if k in self._S_ENTRY_KEYS:
                    st[k] = v[..., :En]
                elif k in self._S_CYC_KEYS:
                    st[k] = v[..., :Tn]
        else:
            Kn = self.K >> s
            for k, v in st.items():
                if k.endswith("_K"):
                    st[k] = v[..., :Kn]
        return st


def _norm_split(r: Sequence[int], log_T: int):
    """Raw LSB-first cycle + MSB-first address challenges -> big-endian."""
    return list(reversed(r[:log_T])), list(r[log_T:])


# ---------------------------------------------------------------------------
# the four relations
# ---------------------------------------------------------------------------

class SparseRamReadWriteChecking(_SparseRamBase):
    """rv + g*wv = sum eq(r_cyc,j) ra(k,j) ((1+g) Val(k,j) + g inc(j)).

    Mirrors `zkvm/ram/read_write_checking.rs` with the sparse matrices of
    `read_write_matrix/ram.rs`."""

    def __init__(self, sched: RamPairSchedule, log_K: int,
                 init_vals: Dict[int, int], inc: Sequence[int], gamma: int,
                 r_cycle: Sequence[int], rv_claim: int, wv_claim: int):
        super().__init__(sched, log_K)
        self.gamma = gamma % P
        self.r_cycle = [x % P for x in r_cycle]
        self.rv_claim, self.wv_claim = rv_claim % P, wv_claim % P
        self.init_vals = init_vals
        self.VAL = sched.initial_val()
        self.EQ = eq.evals(self.r_cycle)
        self.INC = ops.pack_ints(inc)
        self.g = ops.pack_ints([self.gamma])
        self.one_pg = ops.pack_ints([(1 + self.gamma) % P])
        self.VAL_K: Optional[jnp.ndarray] = None
        self.ginc: Optional[jnp.ndarray] = None

    def input_claim(self, accumulator: OpeningAccumulator) -> int:
        return (self.rv_claim + self.gamma * self.wv_claim) % P

    def _cycle_message(self, t: int, rnd: _Round) -> jnp.ndarray:
        return _rw_cycle_message(self.RA, self.VAL, self.EQ, self.INC,
                                 rnd.even_src, rnd.odd_src, rnd.has_e,
                                 rnd.has_o, rnd.imp_e, rnd.imp_o, rnd.rows,
                                 self.one_pg, self.g)

    def _cycle_bind(self, rnd: _Round, r_dev) -> None:
        self.VAL = _bind_pairs(self.VAL, rnd.even_src, rnd.odd_src,
                               rnd.has_e, rnd.has_o, rnd.imp_e, rnd.imp_o,
                               r_dev)
        self.EQ = dense.bind_low(self.EQ, r_dev, FR)
        self.INC = dense.bind_low(self.INC, r_dev, FR)

    def _enter_addr_phase(self) -> None:
        # untouched columns: Val(k, *) == Init(k) (constant in j, so its
        # cycle binding is itself)
        base = np.zeros(self.K, dtype=np.uint64)
        for k, v in self.init_vals.items():
            if k < self.K:
                base[k] = v
        lo = jnp.asarray((base & np.uint64(0xFFFFFFFF)).astype(np.uint32))
        hi = jnp.asarray((base >> np.uint64(32)).astype(np.uint32))
        base_dev = ops.from_u64(lo, hi, FR)
        n = len(self.sched.final_cols)
        cols = jnp.asarray(self.sched.final_cols, jnp.int32)
        self.VAL_K = _materialize(self.VAL[:, :n], cols, base_dev, self.K)
        self.ginc = ops.mont_mul(self.g, self.INC[:, :1], FR)  # (L, 1)

    def _addr_message(self) -> jnp.ndarray:
        return _rw_addr_message(self.RA_K, self.VAL_K, self.one_pg, self.ginc)

    def _addr_bind(self, r_dev) -> None:
        self.VAL_K = dense.bind_high(self.VAL_K, r_dev, FR)

    def _addr_scale(self) -> int:
        return ops.unpack_ints(self.EQ[:, :1])[0]  # fully-bound eq factor

    def finalize(self) -> None:
        self.final_openings = {
            "ra": ops.unpack_ints(self.RA_K)[0],
            "val": ops.unpack_ints(self.VAL_K)[0],
            "inc": ops.unpack_ints(self.INC[:, :1])[0],
        }

    def cache_openings(self, accumulator: OpeningAccumulator,
                       r_slice: Sequence[int]) -> None:
        r_cyc, r_addr = _norm_split(r_slice, self.log_T)
        full = r_cyc + r_addr
        accumulator.insert(("ram", "ra"), full, self.final_openings["ra"])
        accumulator.insert(("ram", "val"), full, self.final_openings["val"])
        accumulator.insert(("ram", "inc"), r_cyc, self.final_openings["inc"])

    def expected_output_claim(self, accumulator, r):  # pragma: no cover
        raise NotImplementedError

    # ---- fused hooks ----------------------------------------------------

    def _f_consts_extra(self) -> dict:
        base = np.zeros(self.K, dtype=np.uint64)
        for k, v in self.init_vals.items():
            if k < self.K:
                base[k] = v
        lo = jnp.asarray((base & np.uint64(0xFFFFFFFF)).astype(np.uint32))
        hi = jnp.asarray((base >> np.uint64(32)).astype(np.uint32))
        return {"val_base": ops.from_u64(lo, hi, FR),
                "g": self.g, "one_pg": self.one_pg}

    def fused_state(self):
        return {"RA": self.RA, "VAL": self.VAL, "EQ": self.EQ,
                "INC": self.INC}

    def _f_cycle_message(self, consts, st, t, rnd):
        e, o, he, ho, ie, io, rows = rnd
        return _rw_cycle_message(st["RA"], st["VAL"], st["EQ"], st["INC"],
                                 e, o, he, ho, ie, io, rows,
                                 consts["one_pg"], consts["g"])

    def _f_cycle_bind(self, consts, st, t, rnd, r):
        e, o, he, ho, ie, io, rows = rnd
        st["VAL"] = _bind_pairs(st["VAL"], e, o, he, ho, ie, io, r)
        st["EQ"] = dense.bind_low(st["EQ"], r, FR)
        st["INC"] = dense.bind_low(st["INC"], r, FR)
        return st

    def _f_enter_addr(self, consts, st):
        n = len(self.sched.final_cols)
        st["VAL_K"] = _materialize(st["VAL"][:, :n], consts["cols"],
                                   consts["val_base"], self.K)
        st["ginc"] = ops.mont_mul(consts["g"], st["INC"][:, :1], FR)
        return st

    def _f_addr_message(self, consts, st):
        return _rw_addr_message(st["RA_K"], st["VAL_K"], consts["one_pg"],
                                st["ginc"])

    def _f_addr_scale(self, consts, st):
        return st["EQ"][:, :1]

    def _f_addr_bind(self, consts, st, r):
        st["VAL_K"] = dense.bind_high(st["VAL_K"], r, FR)
        return st

    def fused_finals(self, st):
        return {"RA_K": st["RA_K"], "VAL_K": st["VAL_K"],
                "INC": st["INC"][:, :1]}

    def fused_store(self, finals) -> None:
        self.RA_K = finals["RA_K"]
        self.VAL_K = finals["VAL_K"]
        self.INC = finals["INC"]

    # ---- scan hooks -----------------------------------------------------

    _s_needs_imp = True

    def _s_bconsts_extra(self) -> dict:
        return self._f_consts_extra()   # val_base, g, one_pg

    def _s_state0_extra(self, Emax):
        return {"VAL": _padE(self.VAL, Emax), "EQ": self.EQ,
                "INC": self.INC}

    def _s_cycle_message(self, bc, x, st):
        ie = ops.from_u64(x["ie"][0], x["ie"][1], FR)
        io = ops.from_u64(x["io"][0], x["io"][1], FR)
        return _rw_cycle_message(st["RA"], st["VAL"], st["EQ"], st["INC"],
                                 x["e"], x["o"], x["he"], x["ho"],
                                 ie, io, x["rows"],
                                 bc["one_pg"], bc["g"])

    def _s_cycle_bind(self, bc, x, st, r):
        ie = ops.from_u64(x["ie"][0], x["ie"][1], FR)
        io = ops.from_u64(x["io"][0], x["io"][1], FR)
        st["VAL"] = _bind_pairs(st["VAL"], x["e"], x["o"], x["he"],
                                x["ho"], ie, io, r)
        st["EQ"] = scan.lowbind_compact(st["EQ"], r)
        st["INC"] = scan.lowbind_compact(st["INC"], r)
        return st

    def _s_enter_addr(self, bc, st, out):
        n = len(self.sched.final_cols)
        VAL_K = _materialize(st["VAL"][:, :n], bc["cols"],
                             bc["val_base"], self.K)
        out["VAL_K"] = scan.to_pair_order(VAL_K)
        out["ginc"] = ops.mont_mul(bc["g"], st["INC"][:, :1], FR)
        out["EQ1"] = st["EQ"][:, :1]
        out["INC1"] = st["INC"][:, :1]
        return out

    def _s_addr_message(self, bc, st):
        return _rw_addr_message_pairs(st["RA_K"], st["VAL_K"],
                                      bc["one_pg"], st["ginc"])

    def _s_addr_scale(self, bc, st):
        return st["EQ1"]

    def _s_addr_bind(self, bc, st, r):
        st["VAL_K"] = scan.pair_bind(st["VAL_K"], r)
        return st

    def scan_finals(self, st):
        return {"RA_K": st["RA_K"][:, :1], "VAL_K": st["VAL_K"][:, :1],
                "INC": st["INC1"]}


class SparseRamRafEvaluation(_SparseRamBase):
    """address_claim = sum eq(r_cyc,j) ra(k,j) A(k); A public affine."""

    def __init__(self, sched: RamPairSchedule, log_K: int, witness_base: int,
                 r_cycle: Sequence[int], addr_claim: int):
        super().__init__(sched, log_K)
        self.addr_claim = addr_claim % P
        self.EQ = eq.evals([x % P for x in r_cycle])
        addrs = np.arange(self.K, dtype=np.uint64)
        a_u64 = np.where(addrs == 0, 0, witness_base + 8 * (addrs - 1))
        lo = jnp.asarray((a_u64 & np.uint64(0xFFFFFFFF)).astype(np.uint32))
        hi = jnp.asarray((a_u64 >> np.uint64(32)).astype(np.uint32))
        self.A_K = ops.from_u64(lo, hi, FR)
        self._percol = [self._col_consts(rnd) for rnd in sched.rounds]

    def _col_consts(self, rnd: _Round) -> jnp.ndarray:
        cols = jnp.asarray(np.minimum(rnd.cols, self.K - 1), jnp.int32)
        live = jnp.asarray(rnd.cols < self.K)
        return jnp.where(live[None, :], self.A_K[:, cols], 0)

    def input_claim(self, accumulator: OpeningAccumulator) -> int:
        return self.addr_claim

    def _cycle_message(self, t: int, rnd: _Round) -> jnp.ndarray:
        return _prod_cycle_message(self.RA, self.EQ[:, None, :],
                                   self._percol[t], rnd.even_src,
                                   rnd.odd_src, rnd.has_e, rnd.has_o,
                                   rnd.rows)

    def _cycle_bind(self, rnd: _Round, r_dev) -> None:
        self.EQ = dense.bind_low(self.EQ, r_dev, FR)

    def _enter_addr_phase(self) -> None:
        pass

    def _addr_message(self) -> jnp.ndarray:
        return _prod_addr_message(self.RA_K, self.A_K)

    def _addr_bind(self, r_dev) -> None:
        self.A_K = dense.bind_high(self.A_K, r_dev, FR)

    def _addr_scale(self) -> int:
        return ops.unpack_ints(self.EQ[:, :1])[0]

    def finalize(self) -> None:
        self.final_openings = {"ra": ops.unpack_ints(self.RA_K)[0]}

    def cache_openings(self, accumulator: OpeningAccumulator,
                       r_slice: Sequence[int]) -> None:
        r_cyc, r_addr = _norm_split(r_slice, self.log_T)
        accumulator.insert(("ram_raf", "ra"), r_cyc + r_addr,
                           self.final_openings["ra"])

    def expected_output_claim(self, accumulator, r):  # pragma: no cover
        raise NotImplementedError

    # ---- fused hooks ----------------------------------------------------

    def _f_consts_extra(self) -> dict:
        return {"percol": tuple(self._percol)}

    def fused_state(self):
        return {"RA": self.RA, "EQ": self.EQ, "A_K": self.A_K}

    def _f_cycle_message(self, consts, st, t, rnd):
        e, o, he, ho, ie, io, rows = rnd
        return _prod_cycle_message(st["RA"], st["EQ"][:, None, :],
                                   consts["percol"][t], e, o, he, ho, rows)

    def _f_cycle_bind(self, consts, st, t, rnd, r):
        st["EQ"] = dense.bind_low(st["EQ"], r, FR)
        return st

    def _f_addr_message(self, consts, st):
        return _prod_addr_message(st["RA_K"], st["A_K"])

    def _f_addr_scale(self, consts, st):
        return st["EQ"][:, :1]

    def _f_addr_bind(self, consts, st, r):
        st["A_K"] = dense.bind_high(st["A_K"], r, FR)
        return st

    def fused_finals(self, st):
        return {"RA_K": st["RA_K"]}

    def fused_store(self, finals) -> None:
        self.RA_K = finals["RA_K"]

    # ---- scan hooks -----------------------------------------------------

    def _s_state0_extra(self, Emax):
        return {"EQ": self.EQ, "A_K": self.A_K}

    def _s_xs_extra(self, lo, hi, Emax):
        return {"percol": jnp.stack([_padE(c, Emax)
                                     for c in self._percol[lo:hi]])}

    def _s_cycle_message(self, bc, x, st):
        return _prod_cycle_message(st["RA"], st["EQ"][:, None, :],
                                   x["percol"], x["e"], x["o"], x["he"],
                                   x["ho"], x["rows"])

    def _s_cycle_bind(self, bc, x, st, r):
        st["EQ"] = scan.lowbind_compact(st["EQ"], r)
        return st

    def _s_enter_addr(self, bc, st, out):
        out["A_K"] = scan.to_pair_order(st["A_K"])
        out["EQ1"] = st["EQ"][:, :1]
        return out

    def _s_addr_message(self, bc, st):
        return scan.pair_prod_message([st["RA_K"], st["A_K"]], 3)

    def _s_addr_scale(self, bc, st):
        return st["EQ1"]

    def _s_addr_bind(self, bc, st, r):
        st["A_K"] = scan.pair_bind(st["A_K"], r)
        return st

    def scan_finals(self, st):
        return {"RA_K": st["RA_K"][:, :1]}


class SparseRamValEvaluation(_SparseRamBase):
    """Val(r) - Init(r_addr) = sum LT(j,r_cyc) inc(j) ra(k,j) eq(r_addr,k)."""

    def __init__(self, sched: RamPairSchedule, log_K: int,
                 init_vals: Dict[int, int], inc: Sequence[int],
                 r_addr: Sequence[int], r_cyc: Sequence[int],
                 val_claim: int):
        super().__init__(sched, log_K)
        init_eval = init_mle_eval(init_vals, r_addr)
        self._input_claim = (val_claim - init_eval) % P
        self.LT = lt.evals([x % P for x in r_cyc])
        self.INC = ops.pack_ints(inc)
        self.EA_K = eq.evals([x % P for x in r_addr])
        self._percol = [self._col_consts(rnd) for rnd in sched.rounds]

    def _col_consts(self, rnd: _Round) -> jnp.ndarray:
        cols = jnp.asarray(np.minimum(rnd.cols, self.K - 1), jnp.int32)
        live = jnp.asarray(rnd.cols < self.K)
        return jnp.where(live[None, :], self.EA_K[:, cols], 0)

    def input_claim(self, accumulator: OpeningAccumulator) -> int:
        return self._input_claim

    def _cycle_message(self, t: int, rnd: _Round) -> jnp.ndarray:
        CYC = jnp.stack([self.LT, self.INC], axis=1)
        return _prod_cycle_message(self.RA, CYC, self._percol[t],
                                   rnd.even_src, rnd.odd_src, rnd.has_e,
                                   rnd.has_o, rnd.rows)

    def _cycle_bind(self, rnd: _Round, r_dev) -> None:
        self.LT = dense.bind_low(self.LT, r_dev, FR)
        self.INC = dense.bind_low(self.INC, r_dev, FR)

    def _enter_addr_phase(self) -> None:
        pass

    def _addr_message(self) -> jnp.ndarray:
        return _prod_addr_message(self.RA_K, self.EA_K)

    def _addr_bind(self, r_dev) -> None:
        self.EA_K = dense.bind_high(self.EA_K, r_dev, FR)

    def _addr_scale(self) -> int:
        c = ops.mont_mul(self.LT[:, :1], self.INC[:, :1], FR)
        return ops.unpack_ints(c)[0]

    def finalize(self) -> None:
        self.final_openings = {
            "ra": ops.unpack_ints(self.RA_K)[0],
            "inc": ops.unpack_ints(self.INC[:, :1])[0],
        }

    def cache_openings(self, accumulator: OpeningAccumulator,
                       r_slice: Sequence[int]) -> None:
        r_cyc, r_addr = _norm_split(r_slice, self.log_T)
        accumulator.insert(("ram_val_eval", "ra"), r_cyc + r_addr,
                           self.final_openings["ra"])
        accumulator.insert(("ram_val_eval", "inc"), r_cyc,
                           self.final_openings["inc"])

    def expected_output_claim(self, accumulator, r):  # pragma: no cover
        raise NotImplementedError

    # ---- fused hooks ----------------------------------------------------

    def _f_consts_extra(self) -> dict:
        return {"percol": tuple(self._percol)}

    def fused_state(self):
        return {"RA": self.RA, "LT": self.LT, "INC": self.INC,
                "EA_K": self.EA_K}

    def _f_cycle_message(self, consts, st, t, rnd):
        e, o, he, ho, ie, io, rows = rnd
        CYC = jnp.stack([st["LT"], st["INC"]], axis=1)
        return _prod_cycle_message(st["RA"], CYC, consts["percol"][t],
                                   e, o, he, ho, rows)

    def _f_cycle_bind(self, consts, st, t, rnd, r):
        st["LT"] = dense.bind_low(st["LT"], r, FR)
        st["INC"] = dense.bind_low(st["INC"], r, FR)
        return st

    def _f_addr_message(self, consts, st):
        return _prod_addr_message(st["RA_K"], st["EA_K"])

    def _f_addr_scale(self, consts, st):
        return ops.mont_mul(st["LT"][:, :1], st["INC"][:, :1], FR)

    def _f_addr_bind(self, consts, st, r):
        st["EA_K"] = dense.bind_high(st["EA_K"], r, FR)
        return st

    def fused_finals(self, st):
        return {"RA_K": st["RA_K"], "INC": st["INC"][:, :1]}

    def fused_store(self, finals) -> None:
        self.RA_K = finals["RA_K"]
        self.INC = finals["INC"]

    # ---- scan hooks -----------------------------------------------------

    def _s_state0_extra(self, Emax):
        return {"LT": self.LT, "INC": self.INC, "EA_K": self.EA_K}

    def _s_xs_extra(self, lo, hi, Emax):
        return {"percol": jnp.stack([_padE(c, Emax)
                                     for c in self._percol[lo:hi]])}

    def _s_cycle_message(self, bc, x, st):
        CYC = jnp.stack([st["LT"], st["INC"]], axis=1)
        return _prod_cycle_message(st["RA"], CYC, x["percol"], x["e"],
                                   x["o"], x["he"], x["ho"], x["rows"])

    def _s_cycle_bind(self, bc, x, st, r):
        st["LT"] = scan.lowbind_compact(st["LT"], r)
        st["INC"] = scan.lowbind_compact(st["INC"], r)
        return st

    def _s_enter_addr(self, bc, st, out):
        out["EA_K"] = scan.to_pair_order(st["EA_K"])
        out["sc"] = ops.mont_mul(st["LT"][:, :1], st["INC"][:, :1], FR)
        out["INC1"] = st["INC"][:, :1]
        return out

    def _s_addr_message(self, bc, st):
        return scan.pair_prod_message([st["RA_K"], st["EA_K"]], 3)

    def _s_addr_scale(self, bc, st):
        return st["sc"]

    def _s_addr_bind(self, bc, st, r):
        st["EA_K"] = scan.pair_bind(st["EA_K"], r)
        return st

    def scan_finals(self, st):
        return {"RA_K": st["RA_K"][:, :1], "INC": st["INC1"]}


class SparseRamOutputCheck(_SparseRamBase):
    """outputs - W.Init = sum inc(j) ra(k,j) W(k); W sparse public."""

    def __init__(self, sched: RamPairSchedule, log_K: int,
                 init_vals: Dict[int, int], inc: Sequence[int], layout,
                 witness_base: int, z: int, outputs: bytes):
        super().__init__(sched, log_K)
        out_cells = output_region_cells(layout, witness_base, self.K)
        out_words = outputs_as_words(outputs, layout)
        lhs, init_term, zp = 0, 0, 1
        w_sparse: Dict[int, int] = {}
        for k in out_cells:
            w_sparse[k] = zp
            lhs = (lhs + zp * out_words.get(k, 0)) % P
            init_term = (init_term + zp * init_vals.get(k, 0)) % P
            zp = zp * z % P
        self._input_claim = (lhs - init_term) % P
        self.INC = ops.pack_ints(inc)
        W_K = ops.zeros((self.K,))
        if w_sparse:
            cells = jnp.asarray(sorted(w_sparse), jnp.int32)
            vals = ops.pack_ints([w_sparse[k] for k in sorted(w_sparse)])
            W_K = W_K.at[:, cells].set(vals)
        self.W_K = W_K
        self._percol = [self._col_consts(rnd) for rnd in sched.rounds]

    def _col_consts(self, rnd: _Round) -> jnp.ndarray:
        cols = jnp.asarray(np.minimum(rnd.cols, self.K - 1), jnp.int32)
        live = jnp.asarray(rnd.cols < self.K)
        return jnp.where(live[None, :], self.W_K[:, cols], 0)

    def input_claim(self, accumulator: OpeningAccumulator) -> int:
        return self._input_claim

    def _cycle_message(self, t: int, rnd: _Round) -> jnp.ndarray:
        return _prod_cycle_message(self.RA, self.INC[:, None, :],
                                   self._percol[t], rnd.even_src,
                                   rnd.odd_src, rnd.has_e, rnd.has_o,
                                   rnd.rows)

    def _cycle_bind(self, rnd: _Round, r_dev) -> None:
        self.INC = dense.bind_low(self.INC, r_dev, FR)

    def _enter_addr_phase(self) -> None:
        pass

    def _addr_message(self) -> jnp.ndarray:
        return _prod_addr_message(self.RA_K, self.W_K)

    def _addr_bind(self, r_dev) -> None:
        self.W_K = dense.bind_high(self.W_K, r_dev, FR)

    def _addr_scale(self) -> int:
        return ops.unpack_ints(self.INC[:, :1])[0]

    def finalize(self) -> None:
        self.final_openings = {
            "ra": ops.unpack_ints(self.RA_K)[0],
            "inc": ops.unpack_ints(self.INC[:, :1])[0],
        }

    def cache_openings(self, accumulator: OpeningAccumulator,
                       r_slice: Sequence[int]) -> None:
        r_cyc, r_addr = _norm_split(r_slice, self.log_T)
        accumulator.insert(("ram_output", "ra"), r_cyc + r_addr,
                           self.final_openings["ra"])
        accumulator.insert(("ram_output", "inc"), r_cyc,
                           self.final_openings["inc"])

    def expected_output_claim(self, accumulator, r):  # pragma: no cover
        raise NotImplementedError

    # ---- fused hooks ----------------------------------------------------

    def _f_consts_extra(self) -> dict:
        return {"percol": tuple(self._percol)}

    def fused_state(self):
        return {"RA": self.RA, "INC": self.INC, "W_K": self.W_K}

    def _f_cycle_message(self, consts, st, t, rnd):
        e, o, he, ho, ie, io, rows = rnd
        return _prod_cycle_message(st["RA"], st["INC"][:, None, :],
                                   consts["percol"][t], e, o, he, ho, rows)

    def _f_cycle_bind(self, consts, st, t, rnd, r):
        st["INC"] = dense.bind_low(st["INC"], r, FR)
        return st

    def _f_addr_message(self, consts, st):
        return _prod_addr_message(st["RA_K"], st["W_K"])

    def _f_addr_scale(self, consts, st):
        return st["INC"][:, :1]

    def _f_addr_bind(self, consts, st, r):
        st["W_K"] = dense.bind_high(st["W_K"], r, FR)
        return st

    def fused_finals(self, st):
        return {"RA_K": st["RA_K"], "INC": st["INC"][:, :1]}

    def fused_store(self, finals) -> None:
        self.RA_K = finals["RA_K"]
        self.INC = finals["INC"]

    # ---- scan hooks -----------------------------------------------------

    def _s_state0_extra(self, Emax):
        return {"INC": self.INC, "W_K": self.W_K}

    def _s_xs_extra(self, lo, hi, Emax):
        return {"percol": jnp.stack([_padE(c, Emax)
                                     for c in self._percol[lo:hi]])}

    def _s_cycle_message(self, bc, x, st):
        return _prod_cycle_message(st["RA"], st["INC"][:, None, :],
                                   x["percol"], x["e"], x["o"], x["he"],
                                   x["ho"], x["rows"])

    def _s_cycle_bind(self, bc, x, st, r):
        st["INC"] = scan.lowbind_compact(st["INC"], r)
        return st

    def _s_enter_addr(self, bc, st, out):
        out["W_K"] = scan.to_pair_order(st["W_K"])
        out["INC1"] = st["INC"][:, :1]
        return out

    def _s_addr_message(self, bc, st):
        return scan.pair_prod_message([st["RA_K"], st["W_K"]], 3)

    def _s_addr_scale(self, bc, st):
        return st["INC1"]

    def _s_addr_bind(self, bc, st, r):
        st["W_K"] = scan.pair_bind(st["W_K"], r)
        return st

    def scan_finals(self, st):
        return {"RA_K": st["RA_K"][:, :1], "INC": st["INC1"]}


# ---------------------------------------------------------------------------
# verifier twins: same algebra as the dense twins, LSB-first cycle order
# ---------------------------------------------------------------------------

class _SparseNorm:
    def _split(self, r: Sequence[int]):
        return (list(reversed(r[:self.log_T])), list(r[self.log_T:]))


class SparseRamReadWriteCheckingVerifier(_SparseNorm,
                                         RamReadWriteCheckingVerifier):
    def expected_output_claim(self, accumulator: OpeningAccumulator,
                              r: Sequence[int]) -> int:
        r_cyc, _ = self._split(r)
        o = self.openings
        g = self.gamma
        term = ((1 + g) * o["val"] + g * o["inc"]) % P
        return eq.eq_int(self.r_cycle, r_cyc) * o["ra"] % P * term % P


class SparseRamRafEvaluationVerifier(_SparseNorm, RamRafEvaluationVerifier):
    def expected_output_claim(self, accumulator: OpeningAccumulator,
                              r: Sequence[int]) -> int:
        from .ram import addr_mle_eval
        r_cyc, r_addr = self._split(r)
        a_eval = addr_mle_eval(r_addr, self.witness_base)
        return (eq.eq_int(self.r_cycle, r_cyc) * self.openings["ra"] % P
                * a_eval % P)


class SparseRamValEvaluationVerifier(_SparseNorm, RamValEvaluationVerifier):
    def expected_output_claim(self, accumulator: OpeningAccumulator,
                              r: Sequence[int]) -> int:
        r_cyc_new, r_addr_new = self._split(r)
        o = self.openings
        lt_eval = lt.lt_point_int(r_cyc_new, self.r_cyc)
        eq_addr = eq.eq_int(self.r_addr, r_addr_new)
        return lt_eval * eq_addr % P * o["ra"] % P * o["inc"] % P


class SparseRamOutputCheckVerifier(_SparseNorm, RamOutputCheckVerifier):
    def expected_output_claim(self, accumulator: OpeningAccumulator,
                              r: Sequence[int]) -> int:
        _, r_addr = self._split(r)
        w_eval = init_mle_eval(self.w_sparse, r_addr)
        o = self.openings
        return w_eval * o["ra"] % P * o["inc"] % P


# ---------------------------------------------------------------------------
# generic one-hot x public-table relation (registers raf, bytecode read-raf)
# ---------------------------------------------------------------------------

class SparseOneHotTableEval(_SparseRamBase):
    """claim = sum_{k,j} eq(r_cycle,j) * M(k,j) * TAB(k) for a one-hot M
    given by its per-cycle index stream and a PUBLIC dense table TAB.

    Covers the register raf instances (TAB(k) = k) and the bytecode
    read-raf Shout (TAB = gamma-combined decoded-program columns,
    `zkvm/bytecode/read_raf_checking.rs`)."""

    def __init__(self, sched: RamPairSchedule, log_K: int,
                 TAB_K: jnp.ndarray, r_cycle: Sequence[int], claim: int,
                 opening_id, opening_key: str = "ra"):
        super().__init__(sched, log_K)
        self.claim = claim % P
        self.EQ = eq.evals([x % P for x in r_cycle])
        self.TAB_K = TAB_K
        self.opening_id = opening_id
        self.opening_key = opening_key
        self._percol = [self._col_consts(rnd) for rnd in sched.rounds]

    def _col_consts(self, rnd: _Round) -> jnp.ndarray:
        cols = jnp.asarray(np.minimum(rnd.cols, self.K - 1), jnp.int32)
        live = jnp.asarray(rnd.cols < self.K)
        return jnp.where(live[None, :], self.TAB_K[:, cols], 0)

    def input_claim(self, accumulator: OpeningAccumulator) -> int:
        return self.claim

    def _cycle_message(self, t: int, rnd: _Round) -> jnp.ndarray:
        return _prod_cycle_message(self.RA, self.EQ[:, None, :],
                                   self._percol[t], rnd.even_src,
                                   rnd.odd_src, rnd.has_e, rnd.has_o,
                                   rnd.rows)

    def _cycle_bind(self, rnd: _Round, r_dev) -> None:
        self.EQ = dense.bind_low(self.EQ, r_dev, FR)

    def _enter_addr_phase(self) -> None:
        pass

    def _addr_message(self) -> jnp.ndarray:
        return _prod_addr_message(self.RA_K, self.TAB_K)

    def _addr_bind(self, r_dev) -> None:
        self.TAB_K = dense.bind_high(self.TAB_K, r_dev, FR)

    def _addr_scale(self) -> int:
        return ops.unpack_ints(self.EQ[:, :1])[0]

    def finalize(self) -> None:
        self.final_openings = {
            self.opening_key: ops.unpack_ints(self.RA_K)[0]}

    def cache_openings(self, accumulator: OpeningAccumulator,
                       r_slice: Sequence[int]) -> None:
        r_cyc, r_addr = _norm_split(r_slice, self.log_T)
        accumulator.insert(self.opening_id, r_cyc + r_addr,
                           self.final_openings[self.opening_key])

    def expected_output_claim(self, accumulator, r):  # pragma: no cover
        raise NotImplementedError

    # ---- fused hooks ----------------------------------------------------

    def _f_consts_extra(self) -> dict:
        return {"percol": tuple(self._percol)}

    def fused_state(self):
        return {"RA": self.RA, "EQ": self.EQ, "TAB_K": self.TAB_K}

    def _f_cycle_message(self, consts, st, t, rnd):
        e, o, he, ho, ie, io, rows = rnd
        return _prod_cycle_message(st["RA"], st["EQ"][:, None, :],
                                   consts["percol"][t], e, o, he, ho, rows)

    def _f_cycle_bind(self, consts, st, t, rnd, r):
        st["EQ"] = dense.bind_low(st["EQ"], r, FR)
        return st

    def _f_addr_message(self, consts, st):
        return _prod_addr_message(st["RA_K"], st["TAB_K"])

    def _f_addr_scale(self, consts, st):
        return st["EQ"][:, :1]

    def _f_addr_bind(self, consts, st, r):
        st["TAB_K"] = dense.bind_high(st["TAB_K"], r, FR)
        return st

    def fused_finals(self, st):
        return {"RA_K": st["RA_K"]}

    def fused_store(self, finals) -> None:
        self.RA_K = finals["RA_K"]

    # ---- scan hooks -----------------------------------------------------

    def _s_state0_extra(self, Emax):
        return {"EQ": self.EQ, "TAB_K": self.TAB_K}

    def _s_xs_extra(self, lo, hi, Emax):
        return {"percol": jnp.stack([_padE(c, Emax)
                                     for c in self._percol[lo:hi]])}

    def _s_cycle_message(self, bc, x, st):
        return _prod_cycle_message(st["RA"], st["EQ"][:, None, :],
                                   x["percol"], x["e"], x["o"], x["he"],
                                   x["ho"], x["rows"])

    def _s_cycle_bind(self, bc, x, st, r):
        st["EQ"] = scan.lowbind_compact(st["EQ"], r)
        return st

    def _s_enter_addr(self, bc, st, out):
        out["TAB_K"] = scan.to_pair_order(st["TAB_K"])
        out["EQ1"] = st["EQ"][:, :1]
        return out

    def _s_addr_message(self, bc, st):
        return scan.pair_prod_message([st["RA_K"], st["TAB_K"]], 3)

    def _s_addr_scale(self, bc, st):
        return st["EQ1"]

    def _s_addr_bind(self, bc, st, r):
        st["TAB_K"] = scan.pair_bind(st["TAB_K"], r)
        return st

    def scan_finals(self, st):
        return {"RA_K": st["RA_K"][:, :1]}


def index_table(K: int) -> jnp.ndarray:
    """TAB(k) = k, device field array (registers raf)."""
    idx = np.arange(K, dtype=np.uint64)
    lo = jnp.asarray((idx & np.uint64(0xFFFFFFFF)).astype(np.uint32))
    hi = jnp.asarray((idx >> np.uint64(32)).astype(np.uint32))
    return ops.from_u64(lo, hi, FR)


def combined_table_dev(table, entry: int, K: int, gamma: int,
                       columns=None) -> jnp.ndarray:
    """Device table for the bytecode read-raf (bytecode.py combined_table)."""
    from .bytecode import combined_table
    return ops.pack_ints(combined_table(table, entry, K, gamma, columns))


# ---------------------------------------------------------------------------
# registers: read/write checking (3 ports) + Val evaluation
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnames=('fp',))
def _reg_rw_cycle_message(WA, RA1, RA2, VAL, EQ, INC, src_e, src_o, has_e,
                          has_o, imp_e, imp_o, rows, g1, g2, fp=FR):
    zero = jnp.zeros_like(imp_e)
    wae, wao = _gather_pairs(WA, src_e, src_o, has_e, has_o, zero, zero, fp)
    r1e, r1o = _gather_pairs(RA1, src_e, src_o, has_e, has_o, zero, zero, fp)
    r2e, r2o = _gather_pairs(RA2, src_e, src_o, has_e, has_o, zero, zero, fp)
    vle, vlo = _gather_pairs(VAL, src_e, src_o, has_e, has_o, imp_e, imp_o,
                             fp)
    eq3 = _evals3(EQ[:, 2 * rows], EQ[:, 2 * rows + 1], fp)
    inc3 = _evals3(INC[:, 2 * rows], INC[:, 2 * rows + 1], fp)
    wa3 = _evals3(wae, wao, fp)
    ra13 = _evals3(r1e, r1o, fp)
    ra23 = _evals3(r2e, r2o, fp)
    val3 = _evals3(vle, vlo, fp)
    reads = ops.add(ops.mont_mul(g1[:, None], ra13, fp),
                    ops.mont_mul(g2[:, None], ra23, fp), fp)
    summand = ops.add(ops.mont_mul(wa3, ops.add(inc3, val3, fp), fp),
                      ops.mont_mul(reads, val3, fp), fp)
    return ops.sum_mod(ops.mont_mul(eq3, summand, fp), fp)


@partial(jax.jit, static_argnames=('fp',))
def _reg_rw_addr_message(WA_K, RA1_K, RA2_K, VAL_K, incc, g1, g2, fp=FR):
    wa3 = dense.sumcheck_eval_points_high(WA_K, 3, fp)
    ra13 = dense.sumcheck_eval_points_high(RA1_K, 3, fp)
    ra23 = dense.sumcheck_eval_points_high(RA2_K, 3, fp)
    val3 = dense.sumcheck_eval_points_high(VAL_K, 3, fp)
    reads = ops.add(ops.mont_mul(g1[:, None], ra13, fp),
                    ops.mont_mul(g2[:, None], ra23, fp), fp)
    inc_b = jnp.broadcast_to(incc[:, None, :], val3.shape)
    summand = ops.add(ops.mont_mul(wa3, ops.add(inc_b, val3, fp), fp),
                      ops.mont_mul(reads, val3, fp), fp)
    return ops.sum_mod(summand, fp)


@partial(jax.jit, static_argnames=('fp',))
def _reg_rw_addr_message_pairs(WA_K, RA1_K, RA2_K, VAL_K, incc, g1, g2,
                               fp=FR):
    """_reg_rw_addr_message twin for pair-order storage (scan path)."""
    wa3 = scan.pair_eval_points(WA_K, 3, fp)
    ra13 = scan.pair_eval_points(RA1_K, 3, fp)
    ra23 = scan.pair_eval_points(RA2_K, 3, fp)
    val3 = scan.pair_eval_points(VAL_K, 3, fp)
    reads = ops.add(ops.mont_mul(g1[:, None], ra13, fp),
                    ops.mont_mul(g2[:, None], ra23, fp), fp)
    inc_b = jnp.broadcast_to(incc[:, None, :], val3.shape)
    summand = ops.add(ops.mont_mul(wa3, ops.add(inc_b, val3, fp), fp),
                      ops.mont_mul(reads, val3, fp), fp)
    return ops.sum_mod(summand, fp)


class SparseRegistersReadWriteChecking(_SparseRamBase):
    """rd_wv + g*rs1_rv + g^2*rs2_rv = sum_{k,j} eq(r_cyc,j) *
    [wa(k,j)(inc(j)+Val(k,j)) + (g*ra1 + g^2*ra2)(k,j) * Val(k,j)].

    Entries: <=3 per cycle (the registers touched by rd/rs1/rs2, merged
    when ports coincide), sharing one Val carried-value chain per register.
    Mirrors `zkvm/registers/read_write_checking.rs` with the sparse
    matrices of `read_write_matrix/registers.rs`."""

    def __init__(self, log: "RegisterLog", gamma: int,
                 r_cycle: Sequence[int], claims: Sequence[int]):
        from ..witness.registers import LOG_K as REG_LOG_K
        sched = RamPairSchedule(log.cols, log.prev, log.post, 1 << REG_LOG_K,
                                rows=log.rows, T=log.T)
        super().__init__(sched, REG_LOG_K)
        self.gamma = gamma % P
        self.g2i = self.gamma * self.gamma % P
        self.r_cycle = [x % P for x in r_cycle]
        self.claims = list(claims)

        def flags_dev(f):
            lo = jnp.asarray(f.astype(np.uint32))
            hi = jnp.zeros_like(lo)
            return ops.from_u64(lo, hi, FR)

        self.WA = flags_dev(log.wa_flag)
        self.RA1 = flags_dev(log.ra1_flag)
        self.RA2 = flags_dev(log.ra2_flag)
        self.VAL = sched.initial_val()
        self.EQ = eq.evals(self.r_cycle)
        self.INC = ops.pack_ints(log.inc)
        self.g1_dev = ops.pack_ints([self.gamma])
        self.g2_dev = ops.pack_ints([self.g2i])
        self.WA_K = self.RA1_K = self.RA2_K = self.VAL_K = None
        self.incc = None

    def input_claim(self, accumulator: OpeningAccumulator) -> int:
        rd, rs1, rs2 = self.claims
        return (rd + self.gamma * rs1 + self.g2i * rs2) % P

    def _cycle_message(self, t: int, rnd: _Round) -> jnp.ndarray:
        return _reg_rw_cycle_message(
            self.WA, self.RA1, self.RA2, self.VAL, self.EQ, self.INC,
            rnd.even_src, rnd.odd_src, rnd.has_e, rnd.has_o, rnd.imp_e,
            rnd.imp_o, rnd.rows, self.g1_dev, self.g2_dev)

    def ingest_challenge(self, r: int, round: int) -> None:
        r_dev = ops.pack_ints([r])
        if round < self.log_T:
            rnd = self.sched.rounds[round]
            zero = jnp.zeros_like(rnd.imp_e)
            bind = lambda X, fe, fo: _bind_pairs(
                X, rnd.even_src, rnd.odd_src, rnd.has_e, rnd.has_o, fe, fo,
                r_dev)
            self.WA = bind(self.WA, zero, zero)
            self.RA1 = bind(self.RA1, zero, zero)
            self.RA2 = bind(self.RA2, zero, zero)
            self.VAL = bind(self.VAL, rnd.imp_e, rnd.imp_o)
            self.EQ = dense.bind_low(self.EQ, r_dev, FR)
            self.INC = dense.bind_low(self.INC, r_dev, FR)
            if round + 1 == self.log_T:
                n = len(self.sched.final_cols)
                cols = jnp.asarray(self.sched.final_cols, jnp.int32)
                zK = ops.zeros((self.K,))
                self.WA_K = _materialize(self.WA[:, :n], cols, zK, self.K)
                self.RA1_K = _materialize(self.RA1[:, :n], cols, zK, self.K)
                self.RA2_K = _materialize(self.RA2[:, :n], cols, zK, self.K)
                # registers start at 0: untouched columns keep Val = 0
                self.VAL_K = _materialize(self.VAL[:, :n], cols, zK, self.K)
                self.incc = self.INC[:, :1]
        else:
            b = partial(dense.bind_high, fp=FR)
            r2 = r_dev
            self.WA_K, self.RA1_K = b(self.WA_K, r2), b(self.RA1_K, r2)
            self.RA2_K, self.VAL_K = b(self.RA2_K, r2), b(self.VAL_K, r2)

    def _addr_message(self) -> jnp.ndarray:
        return _reg_rw_addr_message(self.WA_K, self.RA1_K, self.RA2_K,
                                    self.VAL_K, self.incc, self.g1_dev,
                                    self.g2_dev)

    def _addr_scale(self) -> int:
        return ops.unpack_ints(self.EQ[:, :1])[0]

    def finalize(self) -> None:
        self.final_openings = {
            "wa": ops.unpack_ints(self.WA_K)[0],
            "ra1": ops.unpack_ints(self.RA1_K)[0],
            "ra2": ops.unpack_ints(self.RA2_K)[0],
            "val": ops.unpack_ints(self.VAL_K)[0],
            "inc": ops.unpack_ints(self.INC[:, :1])[0],
        }

    def cache_openings(self, accumulator: OpeningAccumulator,
                       r_slice: Sequence[int]) -> None:
        r_cyc, r_addr = _norm_split(r_slice, self.log_T)
        full = r_cyc + r_addr
        for name in ("wa", "ra1", "ra2", "val"):
            accumulator.insert(("registers", name), full,
                               self.final_openings[name])
        accumulator.insert(("registers", "inc"), r_cyc,
                           self.final_openings["inc"])

    def expected_output_claim(self, accumulator, r):  # pragma: no cover
        raise NotImplementedError

    # ---- fused hooks (3-port layout; overrides the base RA handling) ----

    def _f_consts_extra(self) -> dict:
        return {"g1": self.g1_dev, "g2": self.g2_dev}

    def fused_state(self):
        return {"WA": self.WA, "RA1": self.RA1, "RA2": self.RA2,
                "VAL": self.VAL, "EQ": self.EQ, "INC": self.INC}

    def fused_message(self, consts, st, round: int):
        if round < self.log_T:
            e, o, he, ho, ie, io, rows = consts["sched"][round]
            return _reg_rw_cycle_message(
                st["WA"], st["RA1"], st["RA2"], st["VAL"], st["EQ"],
                st["INC"], e, o, he, ho, ie, io, rows,
                consts["g1"], consts["g2"])
        msg = _reg_rw_addr_message(st["WA_K"], st["RA1_K"], st["RA2_K"],
                                   st["VAL_K"], st["incc"],
                                   consts["g1"], consts["g2"])
        return ops.mont_mul(msg, st["EQ"][:, :1][:, None, :])

    def fused_bind(self, consts, st, r, round: int):
        st = dict(st)
        if round < self.log_T:
            e, o, he, ho, ie, io, rows = consts["sched"][round]
            zero = jnp.zeros_like(ie)
            bind = lambda X, fe, fo: _bind_pairs(X, e, o, he, ho, fe, fo, r)
            st["WA"] = bind(st["WA"], zero, zero)
            st["RA1"] = bind(st["RA1"], zero, zero)
            st["RA2"] = bind(st["RA2"], zero, zero)
            st["VAL"] = bind(st["VAL"], ie, io)
            st["EQ"] = dense.bind_low(st["EQ"], r, FR)
            st["INC"] = dense.bind_low(st["INC"], r, FR)
            if round + 1 == self.log_T:
                n = len(self.sched.final_cols)
                zK = ops.zeros((self.K,))
                cols = consts["cols"]
                st["WA_K"] = _materialize(st["WA"][:, :n], cols, zK, self.K)
                st["RA1_K"] = _materialize(st["RA1"][:, :n], cols, zK,
                                           self.K)
                st["RA2_K"] = _materialize(st["RA2"][:, :n], cols, zK,
                                           self.K)
                st["VAL_K"] = _materialize(st["VAL"][:, :n], cols, zK,
                                           self.K)
                st["incc"] = st["INC"][:, :1]
        else:
            for kname in ("WA_K", "RA1_K", "RA2_K", "VAL_K"):
                st[kname] = dense.bind_high(st[kname], r, FR)
        return st

    def fused_finals(self, st):
        return {"WA_K": st["WA_K"], "RA1_K": st["RA1_K"],
                "RA2_K": st["RA2_K"], "VAL_K": st["VAL_K"],
                "INC": st["INC"][:, :1]}

    def fused_store(self, finals) -> None:
        self.WA_K = finals["WA_K"]
        self.RA1_K = finals["RA1_K"]
        self.RA2_K = finals["RA2_K"]
        self.VAL_K = finals["VAL_K"]
        self.INC = finals["INC"]

    # ---- scan hooks (3-port layout; overrides the base RA handling) -----

    _s_needs_imp = True

    def _s_bconsts_extra(self) -> dict:
        return {"g1": self.g1_dev, "g2": self.g2_dev}

    def scan_state0(self):
        Emax = self._emax()
        return {"WA": _padE(self.WA, Emax), "RA1": _padE(self.RA1, Emax),
                "RA2": _padE(self.RA2, Emax), "VAL": _padE(self.VAL, Emax),
                "EQ": self.EQ, "INC": self.INC}

    def scan_message(self, mode, bc, x, st):
        if mode == "cycle":
            ie = ops.from_u64(x["ie"][0], x["ie"][1], FR)
            io = ops.from_u64(x["io"][0], x["io"][1], FR)
            return _reg_rw_cycle_message(
                st["WA"], st["RA1"], st["RA2"], st["VAL"], st["EQ"],
                st["INC"], x["e"], x["o"], x["he"], x["ho"], ie,
                io, x["rows"], bc["g1"], bc["g2"])
        msg = _reg_rw_addr_message_pairs(
            st["WA_K"], st["RA1_K"], st["RA2_K"], st["VAL_K"], st["incc"],
            bc["g1"], bc["g2"])
        return ops.mont_mul(msg, st["EQ1"][:, None, :])

    def scan_bind(self, mode, bc, x, st, r):
        st = dict(st)
        if mode == "cycle":
            zero = ops.zeros((x["e"].shape[-1],))
            ie = ops.from_u64(x["ie"][0], x["ie"][1], FR)
            io = ops.from_u64(x["io"][0], x["io"][1], FR)
            bind = lambda X, fe, fo: _bind_pairs(X, x["e"], x["o"],
                                                 x["he"], x["ho"], fe, fo, r)
            st["WA"] = bind(st["WA"], zero, zero)
            st["RA1"] = bind(st["RA1"], zero, zero)
            st["RA2"] = bind(st["RA2"], zero, zero)
            st["VAL"] = bind(st["VAL"], ie, io)
            st["EQ"] = scan.lowbind_compact(st["EQ"], r)
            st["INC"] = scan.lowbind_compact(st["INC"], r)
        else:
            for k in ("WA_K", "RA1_K", "RA2_K", "VAL_K"):
                st[k] = scan.pair_bind(st[k], r)
        return st

    def scan_transition(self, prev_mode, next_mode, bc, st):
        n = len(self.sched.final_cols)
        zK = ops.zeros((self.K,))
        out = {}
        for k, src in (("WA_K", "WA"), ("RA1_K", "RA1"),
                       ("RA2_K", "RA2"), ("VAL_K", "VAL")):
            out[k] = scan.to_pair_order(
                _materialize(st[src][:, :n], bc["cols"], zK, self.K))
        out["incc"] = st["INC"][:, :1]
        out["EQ1"] = st["EQ"][:, :1]
        return out

    def scan_finals(self, st):
        return {"WA_K": st["WA_K"][:, :1], "RA1_K": st["RA1_K"][:, :1],
                "RA2_K": st["RA2_K"][:, :1], "VAL_K": st["VAL_K"][:, :1],
                "INC": st["incc"]}


class SparseRegistersValEvaluation(SparseRamValEvaluation):
    """Registers Val-evaluation: same prefix-sum identity over the WRITE
    port only (wa entries), zero initial register file."""

    def __init__(self, log: "RegisterLog", r_addr: Sequence[int],
                 r_cyc: Sequence[int], val_claim: int):
        from ..witness.registers import LOG_K as REG_LOG_K
        wa_cols = np.asarray(log.rd_eff, dtype=np.int64)
        sched = RamPairSchedule(wa_cols, log.wa_pre, log.wa_post,
                                1 << REG_LOG_K)
        super().__init__(sched, REG_LOG_K, {}, log.inc, r_addr, r_cyc,
                         val_claim)

    def finalize(self) -> None:
        super().finalize()
        self.final_openings = {"wa": self.final_openings["ra"],
                               "inc": self.final_openings["inc"]}

    def cache_openings(self, accumulator: OpeningAccumulator,
                       r_slice: Sequence[int]) -> None:
        r_cyc, r_addr = _norm_split(r_slice, self.log_T)
        accumulator.insert(("registers_val_eval", "wa"), r_cyc + r_addr,
                           self.final_openings["wa"])
        accumulator.insert(("registers_val_eval", "inc"), r_cyc,
                           self.final_openings["inc"])


# ---------------------------------------------------------------------------
# verifier twins (LSB-first cycle normalization)
# ---------------------------------------------------------------------------

class SparseRegistersReadWriteCheckingVerifier(_SparseNorm, SumcheckInstance):
    def __init__(self, log_T: int, gamma: int, r_cycle: Sequence[int],
                 claims: Sequence[int], openings: dict):
        from ..witness.registers import LOG_K as REG_LOG_K
        self.log_T = log_T
        self.log_K = REG_LOG_K
        self.gamma = gamma
        self.r_cycle = list(r_cycle)
        self.claims = list(claims)
        self.openings = openings

    degree = 3

    @property
    def num_rounds(self) -> int:
        return self.log_T + self.log_K

    def input_claim(self, accumulator: OpeningAccumulator) -> int:
        rd, rs1, rs2 = self.claims
        return (rd + self.gamma * rs1 + self.gamma * self.gamma % P * rs2) % P

    def compute_message(self, round, prev):  # pragma: no cover
        raise NotImplementedError("verifier instance")

    def ingest_challenge(self, r, round):  # pragma: no cover
        raise NotImplementedError("verifier instance")

    def expected_output_claim(self, accumulator: OpeningAccumulator,
                              r: Sequence[int]) -> int:
        r_cyc, _ = self._split(r)
        o = self.openings
        g, g2 = self.gamma, self.gamma * self.gamma % P
        inner = (o["wa"] * ((o["inc"] + o["val"]) % P)
                 + g * o["ra1"] % P * o["val"]
                 + g2 * o["ra2"] % P * o["val"]) % P
        return eq.eq_int(self.r_cycle, r_cyc) * inner % P


class SparseRegistersValEvaluationVerifier(_SparseNorm, SumcheckInstance):
    def __init__(self, log_T: int, r_addr: Sequence[int],
                 r_cyc: Sequence[int], val_claim: int, openings: dict):
        from ..witness.registers import LOG_K as REG_LOG_K
        self.log_T = log_T
        self.log_K = REG_LOG_K
        self.r_addr = list(r_addr)
        self.r_cyc = list(r_cyc)
        self.val_claim = val_claim
        self.openings = openings

    degree = 3

    @property
    def num_rounds(self) -> int:
        return self.log_T + self.log_K

    def input_claim(self, accumulator: OpeningAccumulator) -> int:
        return self.val_claim % P

    def compute_message(self, round, prev):  # pragma: no cover
        raise NotImplementedError("verifier instance")

    def ingest_challenge(self, r, round):  # pragma: no cover
        raise NotImplementedError("verifier instance")

    def expected_output_claim(self, accumulator: OpeningAccumulator,
                              r: Sequence[int]) -> int:
        r_cyc_new, r_addr_new = self._split(r)
        o = self.openings
        lt_eval = lt.lt_point_int(r_cyc_new, self.r_cyc)
        eq_addr = eq.eq_int(self.r_addr, r_addr_new)
        return lt_eval * eq_addr % P * o["wa"] % P * o["inc"] % P


class SparseRegistersRafVerifier(_SparseNorm, SumcheckInstance):
    def __init__(self, log_T: int, r_cycle, index_claim: int,
                 m_opening: int):
        from ..witness.registers import LOG_K as REG_LOG_K
        self.log_T = log_T
        self.log_K = REG_LOG_K
        self.r_cycle = list(r_cycle)
        self.index_claim = index_claim
        self.m_opening = m_opening

    degree = 3

    @property
    def num_rounds(self) -> int:
        return self.log_T + self.log_K

    def input_claim(self, accumulator: OpeningAccumulator) -> int:
        return self.index_claim % P

    def compute_message(self, round, prev):  # pragma: no cover
        raise NotImplementedError("verifier instance")

    def ingest_challenge(self, r, round):  # pragma: no cover
        raise NotImplementedError("verifier instance")

    def expected_output_claim(self, accumulator: OpeningAccumulator,
                              r: Sequence[int]) -> int:
        from .registers_rw import index_mle_eval
        r_cyc, r_addr = self._split(r)
        return (eq.eq_int(self.r_cycle, r_cyc) * self.m_opening % P
                * index_mle_eval(r_addr) % P)


class SparseBytecodeReadRafVerifier(_SparseNorm, SumcheckInstance):
    def __init__(self, log_T: int, log_K: int, gamma: int,
                 r_cycle: Sequence[int], claims: Sequence[int],
                 program, openings: dict, columns=None):
        self.log_T, self.log_K = log_T, log_K
        self.gamma = gamma
        self.r_cycle = list(r_cycle)
        self.claims = list(claims)
        self.program = program
        self.openings = openings
        self.columns = columns

    degree = 3

    @property
    def num_rounds(self) -> int:
        return self.log_T + self.log_K

    def input_claim(self, accumulator: OpeningAccumulator) -> int:
        acc, g = 0, 1
        for c in self.claims:
            acc = (acc + g * c) % P
            g = g * self.gamma % P
        return acc

    def compute_message(self, round, prev):  # pragma: no cover
        raise NotImplementedError("verifier instance")

    def ingest_challenge(self, r, round):  # pragma: no cover
        raise NotImplementedError("verifier instance")

    def expected_output_claim(self, accumulator: OpeningAccumulator,
                              r: Sequence[int]) -> int:
        from .bytecode import combined_table_eval
        r_cyc, r_addr = self._split(r)
        tab_eval = combined_table_eval(self.program, 1 << self.log_K,
                                       self.gamma, r_addr, self.columns)
        return (eq.eq_int(self.r_cycle, r_cyc) * self.openings["ra"] % P
                * tab_eval % P)
