"""Instruction-execution Shout: the read + raf batched sumcheck over the
2^128 lookup-index space.

Reference: `zkvm/instruction_lookups/read_raf_checking.rs:68-133` and
`poly/prefix_suffix.rs`.  Statement proved, for the stage-1 opening point
r_cycle and gamma drawn at stage start:

  rv + g*left_op + g^2*right_op
    = sum_{j, k} eq(j; r_cycle) * ra(k, j) * (Val_j(k) + g*RafVal_j(k))

where k ranges over 2^128, ra(k,j) = prod_i ra_i(k_i, j) factors into D=16
committed one-hot 8-bit chunk selectors, Val_j(k) is the lookup-table MLE
selected by cycle j's instruction (0 if none), and

  RafVal_j(k) = (1-raf_j) * (Left(k) + g*Right(k)) + raf_j * g * Identity(k)

ties the one-hot index to the R1CS lookup-operand columns (raf_j = 1 on the
non-interleaved add/sub/mul path).

Prover structure (TPU split):
  * first LOG_K=128 address rounds: host-side prefix-suffix machinery --
    per-phase suffix polynomials Q (size 256, integer-weighted u_evals
    accumulation), incremental prefix checkpoints, expanding tables v.
    Degree-2 messages: O(#tables * 128) host field ops per round.
  * last log_T cycle rounds: one stacked device array (L, 18, T) holding
    [eq, combined_val, ra_0..ra_15]; a single fused kernel evaluates the
    degree-18 univariate and one bind halves the whole stack.

Output claims: InstructionRa(i) openings (committed chunk polys),
LookupTableFlag(t) and raf-flag virtual openings at the cycle point
(proven against the public bytecode by the stage-6 flags instance).
"""

from __future__ import annotations

from functools import partial
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from ..field import FR, ops
from ..lookups import tables as LT
from ..poly import dense, eq
from ..poly.univariate import UniPoly
from ..sumcheck.engine import OpeningAccumulator, SumcheckInstance
from ..witness.instruction_lookups import D, LOG_M, M, InstructionLookupWitness

P = FR.modulus
LOG_K = LT.LOG_K  # 128
PAIRS_PER_PHASE = LOG_M // 2  # 4

# every prefix family the table set + raf paths use
_ALL_PREFIXES = sorted(set(
    [p for t in LT.TABLES.values() for _, p, _ in t["terms"]]
    + ["left", "right", "id", "one"]))


def host_eq_evals(point: Sequence[int]) -> List[int]:
    """eq table over 2^n as host ints (doubling; O(2^n) mults)."""
    tab = [1]
    for r in point:
        r = r % P
        nxt = []
        for w in tab:
            wr = w * r % P
            nxt.append((w - wr) % P)
            nxt.append(wr)
        tab = nxt
    return tab


@partial(jax.jit, static_argnames=('nf', 'fp'))
def _cycle_message_kernel(S, nf: int = D + 2, fp=FR):
    """Degree-(nf) univariate evals at X in {0,2,...,nf} of
    sum_j prod_f S[:, f, j]; S: (L, nf, T)."""
    ev = dense.sumcheck_eval_points_high(S, nf, fp)     # (L, nf_pts, nf, T/2)
    ev = jnp.moveaxis(ev, 2, 0)                         # (nf, L, pts, T/2)

    def step(acc, x):
        return ops.mont_mul(acc, x, fp), None

    prod, _ = jax.lax.scan(step, ev[0], ev[1:])
    return ops.sum_mod(prod, fp)                        # (L, pts, 1)


class InstructionReadRaf(SumcheckInstance):
    degree = D + 2

    def __init__(self, wit: InstructionLookupWitness, gamma: int,
                 r_cycle: Sequence[int], rv_claim: int, left_claim: int,
                 right_claim: int):
        self.wit = wit
        self.T = wit.T
        self.log_T = self.T.bit_length() - 1
        self.gamma = gamma % P
        self.g2 = gamma * gamma % P
        self.r_cycle = [r % P for r in r_cycle]
        self.claims = (rv_claim % P, left_claim % P, right_claim % P)

        # per-cycle data
        self.u_evals = host_eq_evals(self.r_cycle)          # mutated per phase
        self.x_full = [0] * self.T
        self.y_full = [0] * self.T
        for j, idx in enumerate(wit.indices):
            self.x_full[j], self.y_full[j] = LT.uninterleave_bits(idx)
        self.buckets: List[List[int]] = [[] for _ in range(LT.NUM_TABLES)]
        for j, t in enumerate(wit.table_ids):
            if t >= 0:
                self.buckets[t].append(j)
        self.il_cycles = [j for j in range(self.T) if wit.interleaved[j]]
        self.id_cycles = [j for j in range(self.T) if not wit.interleaved[j]]

        # raf pseudo-tables: (terms, bucket)
        g, g2 = self.gamma, self.g2
        self.raf_groups = {
            "raf_il": ([(g, "left", "one"), (g, "one", "left"),
                        (g2, "right", "one"), (g2, "one", "right")],
                       self.il_cycles),
            "raf_id": ([(g2, "id", "one"), (g2, "one", "id")],
                       self.id_cycles),
        }

        # prefix checkpoint states (completed pairs folded in)
        self.pstates = {n: LT.PREFIXES[n].init() for n in _ALL_PREFIXES}
        self.r_hist: List[int] = []

        self.v_done: List[List[int]] = []   # finished phase tables
        self.cur_v: List[int] = [1]
        self.QP: Dict[str, List[int]] = {}
        self._init_phase(0)

        # cycle-round state
        self.S: Optional[jnp.ndarray] = None
        self.final_openings: Optional[dict] = None
        self.flag_claims: Optional[List[int]] = None
        self.raf_flag_claim: Optional[int] = None

    # ---- phase machinery ------------------------------------------------

    def _groups(self):
        """Active (group_key, terms, bucket) triples."""
        out = []
        for t, bucket in enumerate(self.buckets):
            if bucket:
                out.append((LT.TABLE_NAMES[t], LT.TABLES[LT.TABLE_NAMES[t]]["terms"],
                            bucket))
        for key, (terms, bucket) in self.raf_groups.items():
            if bucket:
                out.append((key, terms, bucket))
        return out

    def _init_phase(self, phase: int) -> None:
        if phase > 0:
            v = self.v_done[phase - 1]
            chunk = self.wit.chunks[phase - 1]
            for j in range(self.T):
                self.u_evals[j] = self.u_evals[j] * v[int(chunk[j])] % P
        L = LOG_K - LOG_M * (phase + 1)      # suffix bit length
        half = L // 2
        mask_s = (1 << L) - 1
        mask_h = (1 << half) - 1
        chunk_col = self.wit.chunks[phase]
        # Build per-(group, suffix) tables, then AGGREGATE by prefix family:
        # the round message only ever consumes sum_{key,suf->pre} coef * Q,
        # and suffix binding commutes with that linear combination, so the
        # per-round b-loop runs over ~13 prefix tables instead of ~45
        # (group, term) pairs.
        self.QP: Dict[str, List[int]] = {}
        for key, terms, bucket in self._groups():
            sufs = sorted({s for _, _, s in terms})
            local = {s: [0] * M for s in sufs}
            fns = {s: LT.SUFFIXES[s] for s in sufs}
            for j in bucket:
                u = self.u_evals[j]
                if u == 0:
                    continue
                c = int(chunk_col[j])
                s_tail = self.wit.indices[j] & mask_s
                xs = self.x_full[j] & mask_h
                ys = self.y_full[j] & mask_h
                for s in sufs:
                    sv = fns[s](xs, ys, s_tail, L)
                    if sv:
                        local[s][c] = (local[s][c] + u * sv) % P
            for coef, pre, suf in terms:
                q = local[suf]
                agg = self.QP.get(pre)
                if agg is None:
                    agg = [0] * M
                    self.QP[pre] = agg
                for c in range(M):
                    if q[c]:
                        agg[c] = (agg[c] + coef * q[c]) % P
        self.cur_v = [1]

    # ---- engine interface -----------------------------------------------

    @property
    def num_rounds(self) -> int:
        return LOG_K + self.log_T

    def input_claim(self, accumulator: OpeningAccumulator) -> int:
        rv, lo, ro = self.claims
        return (rv + self.gamma * lo + self.g2 * ro) % P

    def _prefix_eval(self, X: int, b: int, nb: int, rnd: int) -> Dict[str, int]:
        """All prefix family values over the prefix domain ending at the
        current phase boundary, at current var = X and in-phase bits b."""
        tail = [X] + [(b >> (nb - 1 - i)) & 1 for i in range(nb)]
        if rnd % 2 == 1:
            tail = [self.r_hist[-1]] + tail
        pair_t = 63 - (rnd // 2)
        states = LT.fold_prefixes(tail, _ALL_PREFIXES, states=self.pstates,
                                  t_start=pair_t)
        return {n: LT.PREFIXES[n].value(s) for n, s in states.items()}

    def message_evals_dev(self, round: int):
        # cycle rounds run on device; the 128 address rounds are host-side
        # prefix-suffix algebra (tiny) and use the compute_message path
        if round >= LOG_K:
            return _cycle_message_kernel(self.S), None
        return None

    def compute_message(self, round: int, previous_claim: int) -> UniPoly:
        if round >= LOG_K:
            evals = ops.unpack_ints(_cycle_message_kernel(self.S))
            return UniPoly.from_evals_and_hint(previous_claim, evals, P)

        rip = round % LOG_M
        length = M >> rip
        half = length // 2
        nb = (LOG_M - 1 - rip)  # in-phase bits below the current var
        s0 = 0
        s2l = 0
        s2r = 0
        items = list(self.QP.items())
        for b in range(half):
            p0 = None
            for pre, q in items:
                qb, qh = q[b], q[b + half]
                if qb == 0 and qh == 0:
                    continue
                if p0 is None:
                    p0 = self._prefix_eval(0, b, nb, round)
                    p2 = self._prefix_eval(2, b, nb, round)
                s0 += p0[pre] * qb
                p2v = p2[pre]
                s2l += p2v * qb
                s2r += p2v * qh
        s0 %= P
        s2 = (2 * s2r - s2l) % P
        return UniPoly.from_evals_and_hint(previous_claim, [s0, s2], P)

    def ingest_challenge(self, r: int, round: int) -> None:
        if round >= LOG_K:
            r_dev = ops.pack_ints([r])[:, :, None]   # (L,1,1) for 3-D stack
            self.S = dense.bind_high(self.S, r_dev, FR)
            return

        r = r % P
        self.r_hist.append(r)
        rip = round % LOG_M
        length = M >> rip
        half = length // 2
        # bind the aggregated suffix polys (host, tiny)
        for k in self.QP:
            q = self.QP[k]
            self.QP[k] = [(q[i] + r * (q[i + half] - q[i])) % P
                          for i in range(half)]
        # expanding table: append the new bound bit at the LSB end
        rm = (1 - r) % P
        self.cur_v = [w * m % P
                      for w in self.cur_v for m in (rm, r)]
        # checkpoints: fold the completed pair every two rounds
        if round % 2 == 1:
            rx, ry = self.r_hist[-2], self.r_hist[-1]
            pair_t = 63 - (round // 2)
            for n in _ALL_PREFIXES:
                self.pstates[n] = LT.PREFIXES[n].update(
                    self.pstates[n], rx, ry, pair_t)
        # phase boundary
        if rip == LOG_M - 1:
            self.v_done.append(self.cur_v)
            phase = round // LOG_M
            if phase + 1 < D:
                self._init_phase(phase + 1)
            else:
                self._init_cycle_rounds()

    def _init_cycle_rounds(self) -> None:
        # final condensation of the last phase into u_evals
        v = self.v_done[D - 1]
        chunk = self.wit.chunks[D - 1]
        for j in range(self.T):
            self.u_evals[j] = self.u_evals[j] * v[int(chunk[j])] % P

        pvals = {n: LT.PREFIXES[n].value(s) for n, s in self.pstates.items()}
        empty = LT.suffix_values(0, 0)
        tval = [LT.table_value_from_parts(name, pvals, empty)
                for name in LT.TABLE_NAMES]
        raf_il = (self.gamma * pvals["left"] + self.g2 * pvals["right"]) % P
        raf_id = self.g2 * pvals["id"] % P

        val_col = [0] * self.T
        for j in range(self.T):
            t = self.wit.table_ids[j]
            acc = tval[t] if t >= 0 else 0
            acc += raf_il if self.wit.interleaved[j] else raf_id
            val_col[j] = acc % P

        arrays = [eq.evals(self.r_cycle), ops.pack_ints(val_col)]
        for i in range(D):
            v_i = self.v_done[i]
            col = self.wit.chunks[i]
            arrays.append(ops.pack_ints([v_i[int(col[j])]
                                         for j in range(self.T)]))
        self.S = jnp.stack(arrays, axis=1)          # (L, D+2, T)

    def finalize(self) -> None:
        vals = ops.unpack_ints(self.S)              # (L, D+2, 1) -> 18 ints
        self.final_openings = {"eq": vals[0], "val": vals[1]}
        for i in range(D):
            self.final_openings[f"ra{i}"] = vals[2 + i]

    def cache_openings(self, accumulator: OpeningAccumulator,
                       r_slice: Sequence[int]) -> None:
        r_addr = list(r_slice[:LOG_K])
        r_cyc2 = list(r_slice[LOG_K:])
        # flag claims at the new cycle point (verified by the stage-6
        # bytecode flags instance)
        e2 = host_eq_evals(r_cyc2)
        self.flag_claims = [
            sum(e2[j] for j in bucket) % P for bucket in self.buckets]
        self.raf_flag_claim = sum(e2[j] for j in self.id_cycles) % P
        for t, name in enumerate(LT.TABLE_NAMES):
            accumulator.insert(("instr_flag", name), r_cyc2,
                               self.flag_claims[t])
        accumulator.insert(("instr_flag", "raf"), r_cyc2, self.raf_flag_claim)
        for i in range(D):
            # committed chunk layout is cycle-major: point = (cycle, addr_i)
            pt = r_cyc2 + r_addr[LOG_M * i: LOG_M * (i + 1)]
            accumulator.insert(("instr_ra", i), pt,
                               self.final_openings[f"ra{i}"])

    def expected_output_claim(self, accumulator, r):  # pragma: no cover
        raise NotImplementedError


class InstructionReadRafVerifier(SumcheckInstance):
    degree = D + 2

    def __init__(self, log_T: int, gamma: int, r_cycle: Sequence[int],
                 rv_claim: int, left_claim: int, right_claim: int,
                 openings: dict):
        """openings: ra0..ra{D-1}, flag_<TableName> per table, raf_flag."""
        self.log_T = log_T
        self.gamma = gamma % P
        self.g2 = gamma * gamma % P
        self.r_cycle = [x % P for x in r_cycle]
        self.claims = (rv_claim % P, left_claim % P, right_claim % P)
        self.openings = openings

    @property
    def num_rounds(self) -> int:
        return LOG_K + self.log_T

    def input_claim(self, accumulator: OpeningAccumulator) -> int:
        rv, lo, ro = self.claims
        return (rv + self.gamma * lo + self.g2 * ro) % P

    def compute_message(self, round, prev):  # pragma: no cover
        raise NotImplementedError("verifier instance")

    def ingest_challenge(self, r, round):  # pragma: no cover
        raise NotImplementedError("verifier instance")

    def expected_output_claim(self, accumulator: OpeningAccumulator,
                              r: Sequence[int]) -> int:
        r_addr = [x % P for x in r[:LOG_K]]
        r_cyc2 = [x % P for x in r[LOG_K:]]
        o = self.openings
        states = LT.fold_prefixes(r_addr, _ALL_PREFIXES)
        pvals = {n: LT.PREFIXES[n].value(s) for n, s in states.items()}
        empty = LT.suffix_values(0, 0)
        val = 0
        for name in LT.TABLE_NAMES:
            val = (val + o[f"flag_{name}"]
                   * LT.table_value_from_parts(name, pvals, empty)) % P
        raf = o["raf_flag"] % P
        il = (1 - raf) % P
        val = (val
               + il * ((self.gamma * pvals["left"]
                        + self.g2 * pvals["right"]) % P)
               + raf * (self.g2 * pvals["id"] % P)) % P
        ra_prod = 1
        for i in range(D):
            ra_prod = ra_prod * (o[f"ra{i}"] % P) % P
        return (eq.eq_int(self.r_cycle, r_cyc2) * ra_prod % P * val % P)
