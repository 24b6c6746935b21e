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
  * first LOG_K=128 address rounds: the per-phase suffix tables Q are built
    ON DEVICE -- vectorized numpy suffix evaluation (lookups/suffix_vec.py)
    feeds ONE jitted kernel (reused across all 16 phases) that lifts the
    suffix streams to Montgomery form, weights them by the running u_evals
    column, segment-sums by chunk value, and aggregates per prefix family.
    The per-ROUND message/bind algebra stays host-side (tiny: ~13 tables of
    <=256 entries), as do the incremental prefix checkpoints.
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
import numpy as np

from ..field import FR, ops
from ..lookups import tables as LT
from ..lookups.suffix_vec import eval_suffix
from ..poly import dense, eq
from ..poly.univariate import UniPoly
from ..sumcheck.engine import OpeningAccumulator, SumcheckInstance
from ..witness.instruction_lookups import D, LOG_M, M, InstructionLookupWitness

P = FR.modulus
LOG_K = LT.LOG_K  # 128
PAIRS_PER_PHASE = LOG_M // 2  # 4
_U64 = np.uint64

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

@partial(jax.jit, static_argnames=('n_streams',))
def _suffix_tables_kernel(u: jnp.ndarray, v_tab: jnp.ndarray,
                          chunk_prev: jnp.ndarray, u_idx: jnp.ndarray,
                          lo32a, lo32b, hi32a, hi32b,
                          seg_ids: jnp.ndarray, coef_mat: jnp.ndarray,
                          n_streams: int):
    """Per-phase suffix-table build, ONE dispatch for everything:

      1. fold the previous phase's expanding table into the running weight
         column:  u *= v_tab[chunk_prev]  (v_tab = all-ones on phase 0)
      2. limb-decompose the raw u64x2 suffix values (shipped as four u32
         word arrays -- 5x less relay traffic than pre-built limb rows)
      3. weight, segment-sum by (stream, chunk), aggregate per prefix

    COMPACT entry layout: entry e is (cycle u_idx[e], suffix value, target
    segment seg_ids[e] = stream*M + chunk); only in-bucket cycles appear,
    so device work is O(sum of bucket sizes), not O(S*T).

    mont_mul(Montgomery u, raw sv) = u*sv in CANONICAL form, so the whole
    aggregation runs without lifting sv; one final mont_mul by R^2 restores
    Montgomery form for the (tiny) Q output.

    Returns (u_new, Q) with Q: (L, n_pre, M):
    Q[p][c] = sum_s coef[p,s] * sum_{j: chunk_j=c, j in bucket_s} u_j*sv_{s,j}."""
    u = ops.mont_mul(u, jnp.take(v_tab, chunk_prev, axis=1))
    words = (lo32a, lo32b, hi32a, hi32b)
    lb, nl = FR.limb_bits, FR.num_limbs
    limbs = []
    for l in range(nl):
        bit = l * lb
        if bit >= 128:
            limbs.append(jnp.zeros_like(lo32a))
            continue
        wi, off = bit // 32, bit % 32
        v = words[wi] >> np.uint32(off)
        if off + lb > 32 and wi + 1 < 4:
            v = v | (words[wi + 1] << np.uint32(32 - off))
        limbs.append(v & np.uint32((1 << lb) - 1))
    sv_limbs = jnp.stack(limbs, axis=0)                      # (L, N) raw
    w = ops.mont_mul(jnp.take(u, u_idx, axis=1), sv_limbs)   # canonical
    seg = ops.segment_sum_mod(w, seg_ids, n_streams * M)
    seg = seg.reshape((FR.num_limbs, n_streams, M))
    # coef (mont) x seg (canonical) -> canonical products
    prod = ops.mont_mul(coef_mat[:, :, :, None], seg[:, None, :, :])
    q = ops.sum_mod(jnp.swapaxes(prod, 2, 3))[..., 0]        # (L, n_pre, M)
    r2 = jnp.asarray(FR.r2_limbs, dtype=jnp.uint32).reshape(
        (FR.num_limbs, 1, 1))
    return u, ops.mont_mul(q, jnp.broadcast_to(r2, q.shape))


@jax.jit
def _flag_claims_kernel(e2: jnp.ndarray, table_ids1: jnp.ndarray,
                        inter01: jnp.ndarray):
    """Table-flag claims at the bound cycle point: segment-sums of the eq
    column by table id (bucket 0 = no-table) and by interleave class."""
    flags = ops.segment_sum_mod(e2, table_ids1, LT.NUM_TABLES + 1)
    raf = ops.segment_sum_mod(e2, inter01, 2)
    return flags, raf


@partial(jax.jit, static_argnames=('nf', 'fp'))
def _cycle_message_kernel(S, nf: int = D + 2, fp=FR):
    """Degree-(nf) univariate evals at X in {0,2,...,nf} of
    sum_j prod_f S[:, f, j]; S: (L, nf, T).

    Eval points run SEQUENTIALLY so peak transients stay (L, nf, T/2):
    the all-points tensor (L, nf, nf, T/2) was ~3.6 GB at 2^18 -- pure
    HBM write+read traffic that dominated the cycle rounds."""
    half = S.shape[-1] // 2
    lo, hi = S[..., :half], S[..., half:]
    m = ops.sub(hi, lo, fp)

    def prodsum(e):                                     # e: (L, nf, half)
        ef = jnp.moveaxis(e, 1, 0)                      # (nf, L, half)

        def step(acc, x):
            return ops.mont_mul(acc, x, fp), None

        prod, _ = jax.lax.scan(step, ef[0], ef[1:])
        return ops.sum_mod(prod, fp)                    # (L, 1)

    outs = [prodsum(lo)]                                # X = 0
    cur = ops.add(hi, m, fp)                            # X = 2
    outs.append(prodsum(cur))
    for _ in range(3, nf + 1):
        cur = ops.add(cur, m, fp)
        outs.append(prodsum(cur))
    return jnp.stack([o[..., 0] for o in outs], axis=1)[..., None]


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

        # per-cycle data: numpy views from the witness + the running u_evals
        # column on DEVICE (u_j = eq(j; r_cycle) * prod of finished-phase
        # expanding tables at j's chunks)
        self.u_dev = eq.evals(self.r_cycle)
        tid = wit.table_ids_np
        inter = wit.inter_np
        self.table_masks = {int(t): tid == t for t in np.unique(tid)
                            if t >= 0}

        # raf pseudo-tables: (terms, bucket mask)
        g, g2 = self.gamma, self.g2
        self.raf_groups = {
            "raf_il": ([(g, "left", "one"), (g, "one", "left"),
                        (g2, "right", "one"), (g2, "one", "right")],
                       inter),
            "raf_id": ([(g2, "id", "one"), (g2, "one", "id")],
                       ~inter),
        }

        # phase-invariant stream plan: one (bucket, suffix) stream per
        # entry, a compact concatenated cycle-index layout, and the
        # prefix-aggregation coefficient matrix
        self._streams: List[Tuple[np.ndarray, str]] = []  # (bucket_js, suf)
        coef_entries: List[Tuple[int, int, int]] = []   # (pre_idx, s, coef)
        pre_used: List[str] = []
        pre_index: Dict[str, int] = {}
        for key, terms, mask in self._groups():
            js = np.nonzero(mask)[0].astype(np.int32)
            if js.size == 0:
                continue
            sufs = sorted({s for _, _, s in terms})
            s_idx = {}
            for s in sufs:
                s_idx[s] = len(self._streams)
                self._streams.append((js, s))
            for coef, pre, suf in terms:
                pi = pre_index.get(pre)
                if pi is None:
                    pi = pre_index[pre] = len(pre_used)
                    pre_used.append(pre)
                coef_entries.append((pi, s_idx[suf], coef % P))
        self._pre_used = pre_used
        n_pre, S = len(pre_used), len(self._streams)
        cmat = [[0] * S for _ in range(n_pre)]
        for pi, si, c in coef_entries:
            cmat[pi][si] = (cmat[pi][si] + c) % P
        flat = [c for row in cmat for c in row]
        self._coef_mat = ops.pack_ints(flat).reshape(
            (FR.num_limbs, n_pre, S))
        self._u_idx_np = np.concatenate([js for js, _ in self._streams])
        self._stream_of = np.concatenate(
            [np.full(js.size, si, np.int32)
             for si, (js, _) in enumerate(self._streams)])
        self._u_idx = jnp.asarray(self._u_idx_np)

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
        """Active (group_key, terms, bucket_mask) triples."""
        out = []
        for t, mask in self.table_masks.items():
            name = LT.TABLE_NAMES[t]
            out.append((name, LT.TABLES[name]["terms"], mask))
        for key, (terms, mask) in self.raf_groups.items():
            out.append((key, terms, mask))
        return out

    def _init_phase(self, phase: int) -> None:
        """Build this phase's per-prefix suffix tables Q on device.

        The round message only ever consumes sum_{key,suf->pre} coef * Q,
        and suffix binding commutes with that linear combination, so the
        per-round b-loop runs over ~13 prefix tables instead of ~45
        (group, term) pairs.  All O(T) work -- the u_evals fold, the
        Montgomery lift of the suffix streams, and the chunk segment-sums --
        happens in two device dispatches; the host only evaluates the u64
        suffix closed forms (vectorized numpy) and unpacks the (n_pre, M)
        result."""
        wit = self.wit
        if phase > 0:
            v_tab = ops.pack_ints(self.v_done[phase - 1])
            chunk_prev = jnp.asarray(wit.chunks[phase - 1].astype(np.int32))
        else:
            v_tab = ops.ones((256,))
            chunk_prev = jnp.zeros(self.T, jnp.int32)
        L = LOG_K - LOG_M * (phase + 1)      # suffix bit length
        half = L // 2
        mask_h = _U64(((1 << half) - 1) & ((1 << 64) - 1))
        if L >= 64:
            s_lo = wit.idx_lo
            s_hi = (wit.idx_hi & _U64((1 << (L - 64)) - 1) if L > 64
                    else np.zeros_like(wit.idx_hi))
        else:
            s_lo = wit.idx_lo & _U64((1 << L) - 1)
            s_hi = np.zeros_like(wit.idx_hi)
        xs_all = wit.x64 & mask_h
        ys_all = wit.y64 & mask_h

        # numpy releases the GIL inside the u64 vector ops, so the
        # per-stream closed-form evaluations thread cleanly (~2-3x on the
        # 4-core host; this is ~4-6 s of per-prove wall at 2^18 serial)
        from concurrent.futures import ThreadPoolExecutor
        def _one(arg):
            js, suf = arg
            return eval_suffix(suf, xs_all[js], ys_all[js], s_lo[js],
                               s_hi[js], L)
        if len(self._streams) > 3:
            with ThreadPoolExecutor(max_workers=4) as _tp:
                parts = list(_tp.map(_one, self._streams))
        else:
            parts = [_one(a) for a in self._streams]
        lo = np.concatenate([p[0] for p in parts])
        hi = np.concatenate([p[1] for p in parts])
        m32 = _U64(0xFFFFFFFF)
        chunk = wit.chunks[phase].astype(np.int32)
        seg_ids = jnp.asarray(self._stream_of * M + chunk[self._u_idx_np])
        self.u_dev, q = _suffix_tables_kernel(
            self.u_dev, v_tab, chunk_prev, self._u_idx,
            jnp.asarray((lo & m32).astype(np.uint32)),
            jnp.asarray((lo >> _U64(32)).astype(np.uint32)),
            jnp.asarray((hi & m32).astype(np.uint32)),
            jnp.asarray((hi >> _U64(32)).astype(np.uint32)),
            seg_ids, self._coef_mat, len(self._streams))
        q_ints = ops.unpack_ints(q)          # row-major (n_pre, M)
        self.QP = {}
        for pi, pre in enumerate(self._pre_used):
            row = q_ints[pi * M:(pi + 1) * M]
            if any(row):
                self.QP[pre] = row
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
        pvals = {n: LT.PREFIXES[n].value(s) for n, s in self.pstates.items()}
        empty = LT.suffix_values(0, 0)
        tval = [LT.table_value_from_parts(name, pvals, empty)
                for name in LT.TABLE_NAMES]
        raf_il = (self.gamma * pvals["left"] + self.g2 * pvals["right"]) % P
        raf_id = self.g2 * pvals["id"] % P

        # val column: per-cycle table value + raf term (object-numpy
        # gathers; one vectorized pack)
        tval_arr = np.array(tval + [0], dtype=object)
        tid = self.wit.table_ids_np.astype(np.int64)
        val_col = tval_arr[np.where(tid >= 0, tid, LT.NUM_TABLES)]
        raf_arr = np.array([raf_id, raf_il], dtype=object)
        val_col = val_col + raf_arr[self.wit.inter_np.astype(np.int64)]
        arrays = [eq.evals(self.r_cycle),
                  ops.pack_ints([int(v) % P for v in val_col])]
        # ra_i columns: device gathers from the 256-entry expanding tables
        for i in range(D):
            v_tab = ops.pack_ints(self.v_done[i])
            col = jnp.asarray(self.wit.chunks[i].astype(np.int32))
            arrays.append(jnp.take(v_tab, col, axis=1))
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
        # bytecode flags instance): device segment-sums of the eq column
        e2 = eq.evals(r_cyc2)
        tid1 = jnp.asarray((self.wit.table_ids_np + 1).astype(np.int32))
        inter01 = jnp.asarray(self.wit.inter_np.astype(np.int32))
        flags_dev, raf_dev = _flag_claims_kernel(e2, tid1, inter01)
        flag_ints = ops.unpack_ints(flags_dev)
        self.flag_claims = [flag_ints[t + 1] for t in range(LT.NUM_TABLES)]
        self.raf_flag_claim = ops.unpack_ints(raf_dev)[0]
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
