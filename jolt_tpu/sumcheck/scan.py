"""Scan-fused sumcheck stages: whole round loop on device, compile-light.

The unrolled fused driver (fused.py) removes the per-round host round-trip
but pays XLA compile proportional to TOTAL ROUNDS (~203 s for one 15-round
instance on XLA:CPU).  This driver re-rolls the loop as `lax.scan` over
rounds, so a stage compiles ONE round body per *segment* (a maximal run of
rounds in which every instance's mode is constant) -- compile cost is
O(segments), independent of trace length.

Shape invariance inside a scan segment is achieved with two devices:

  * **pair order + zero-tail compaction** for dense bind-high arrays: an
    array bound HighToLow is stored bit-reversed, so the (lo, hi) companion
    pair of every variable is ADJACENT (stride-2 slicing, static shapes).
    Binding writes the combined halves into the array's prefix and zero
    into the tail; zero tails propagate through the field ops, and every
    relation's message multiplies by a zero-tailed weight array, so dead
    pairs contribute nothing.  Arrays keep their full allocated size for
    the whole segment (round t does O(N) instead of O(N/2^t) work -- on
    the MXU-fed VPU this is bandwidth noise compared to a 65 ms dispatch).
  * **stacked per-round constants** (xs): pair schedules, masks, and
    challenge-derived weights are padded to a common per-round shape and
    stacked with a leading round axis that `lax.scan` consumes.

The Fiat-Shamir transcript lives on device (transcript/device.py); after
the single dispatch the host replays its own transcript over the fetched
round coefficients and asserts the challenges agree, so proofs are
byte-identical to the host engine by construction.

Instance protocol: `ScanFusedInstance` below.  A stage falls back to
prove_fused / BatchedSumcheck when any instance doesn't implement it.
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..field import ops
from ..field.params import FR
from ..transcript import Blake2bTranscript
from ..transcript import device as dt
from .engine import BatchedSumcheck, OpeningAccumulator, SumcheckInstance
from .fused import (FusedInstance, _coeffs_from_evals, _horner,
                    _label_payload_words, _mont, _shape_sig, prove_fused)

P = FR.modulus
_INV2 = pow(2, -1, P)
_SCAN_CACHE: dict = {}
_BITREV_CACHE: dict = {}


# ---------------------------------------------------------------------------
# pair-order helpers (shared by relation scan hooks)
# ---------------------------------------------------------------------------

def bitrev_perm(n: int) -> np.ndarray:
    """Bit-reversal permutation over n = 2^k indices (numpy, cached)."""
    if n not in _BITREV_CACHE:
        k = n.bit_length() - 1
        idx = np.arange(n, dtype=np.int64)
        rev = np.zeros(n, dtype=np.int64)
        for b in range(k):
            rev |= ((idx >> b) & 1) << (k - 1 - b)
        _BITREV_CACHE[n] = rev.astype(np.int32)
    return _BITREV_CACHE[n]


def to_pair_order(X: jnp.ndarray) -> jnp.ndarray:
    """Gather a bind-high array into bit-reversed (pair) order."""
    return X[..., jnp.asarray(bitrev_perm(X.shape[-1]))]


def pair_eval_points(Pv: jnp.ndarray, degree: int, fp=FR) -> jnp.ndarray:
    """sumcheck_eval_points_high twin for pair-order storage: companions
    are adjacent, so lo/hi are the stride-2 slices.  (L, deg, N/2)."""
    lo, hi = Pv[..., 0::2], Pv[..., 1::2]
    outs = [lo]
    if degree >= 2:
        m = ops.sub(hi, lo, fp)
        cur = ops.add(hi, m, fp)
        outs.append(cur)
        for _ in range(3, degree + 1):
            cur = ops.add(cur, m, fp)
            outs.append(cur)
    return jnp.stack(outs, axis=1)


def pair_bind(Pv: jnp.ndarray, r: jnp.ndarray, fp=FR) -> jnp.ndarray:
    """Bind-high in pair order with prefix compaction: the combined halves
    land in the prefix, zeros fill the tail (same allocated shape)."""
    lo, hi = Pv[..., 0::2], Pv[..., 1::2]
    new = ops.add(lo, ops.mont_mul(r, ops.sub(hi, lo, fp), fp), fp)
    return jnp.concatenate([new, jnp.zeros_like(new)], axis=-1)


def lowbind_compact(Pv: jnp.ndarray, r: jnp.ndarray, fp=FR) -> jnp.ndarray:
    """bind_low with prefix compaction at fixed allocated size (the sparse
    cycle phases index EQ/INC pairs as (2*rows, 2*rows+1), which stays
    valid on the compacted prefix)."""
    lo, hi = Pv[..., 0::2], Pv[..., 1::2]
    new = ops.add(lo, ops.mont_mul(r, ops.sub(hi, lo, fp), fp), fp)
    return jnp.concatenate([new, jnp.zeros_like(new)], axis=-1)


def default_shrink_plan(n_rounds: int, width: int = 1 << 30) -> List[int]:
    """Shrink points at local rounds 2 and 6: rounds 0-1 run at full width
    N, 2-5 at N/4, the rest at N/64 -- ~6x less per-mode work for +2
    compiled segments (measured on the axon TPU: compile cost tracks array
    width, so narrower late segments also compile faster).  Modes shorter
    than 4 rounds or narrower than 4096 lanes aren't worth the extra
    segments (each costs one more compiled scan body)."""
    if width < 4096:
        return []
    return [s for s in (2, 6) if s + 2 <= n_rounds]


def sparse_shrink_plan(n_rounds: int, width: int = 1 << 30) -> List[int]:
    """Pair-schedule modes get ONE shrink point only: every extra segment
    re-pads and re-compiles the gather schedules, which dominated stage-6
    compile when given the dense plan."""
    if width < 4096 or n_rounds < 6:
        return []
    return [4]


def pair_prod_message(ws: Sequence[jnp.ndarray], degree: int,
                      fp=FR) -> jnp.ndarray:
    """Round message sum_pairs prod_i w_i(X) for pair-order arrays: each
    w in ws contributes its univariate evals; returns (L, degree, 1)."""
    acc = pair_eval_points(ws[0], degree, fp)
    for w in ws[1:]:
        acc = ops.mont_mul(acc, pair_eval_points(w, degree, fp), fp)
    return ops.sum_mod(acc, fp)


# ---------------------------------------------------------------------------
# instance protocol
# ---------------------------------------------------------------------------

class ScanFusedInstance(FusedInstance):
    """Scan-compatible fused instance: fixed state shapes within a mode,
    per-round constants delivered as stacked xs."""

    def scan_plan(self) -> List[Tuple[str, int]]:
        """[(mode, n_rounds), ...] covering num_rounds, in round order."""
        raise NotImplementedError

    def scan_bconsts(self):
        """Round-invariant device constants (pytree; jit argument)."""
        return ()

    def scan_state0(self):
        """State entering the first mode (pytree of device arrays)."""
        raise NotImplementedError

    def scan_xs(self, mode: str, lo: int, hi: int):
        """Per-round xs pytree for LOCAL rounds [lo, hi) of `mode`; every
        leaf has leading dimension hi - lo.  () if none."""
        return ()

    def scan_message(self, mode: str, bc, x, st):
        """(L, degree, 1) message evals at X in {0,2,..}, scale factors
        already applied."""
        raise NotImplementedError

    def scan_bind(self, mode: str, bc, x, st, r):
        """Bind to challenge r; same pytree structure/shapes as st."""
        raise NotImplementedError

    def scan_transition(self, prev_mode: str, next_mode: str, bc, st):
        """Straight-line state rewrite between modes (inside the jit)."""
        return st

    def scan_shrink_plan(self, mode: str, n_rounds: int):
        """Mode-local rounds at which the driver should call scan_shrink
        (a new scan segment starts there with smaller state shapes).
        Balance: each point cuts the remaining rounds' per-round work but
        adds one compiled segment."""
        return []

    def scan_shrink(self, mode: str, local_round: int, bc, st):
        """Slice the state down to its active prefix at `local_round` of
        `mode` (inside the jit, between scan segments)."""
        return st

    def scan_finals(self, st):
        """Small sub-pytree fetched once at stage end for fused_store."""
        raise NotImplementedError


def _supports_scan(instances) -> bool:
    from ..parallel.mesh import active_mesh
    mode = os.environ.get("JOLT_TPU_FUSE")
    if mode == "0":
        return False
    if mode != "1" and mode != "scan":
        # auto: scan fusion on for real accelerator platforms, off for the
        # CPU test platform (each stage shape still costs one round-body
        # compile; the suite runs hundreds of tiny shapes)
        if jax.default_backend() == "cpu":
            return False
    if active_mesh() is not None:
        return False
    if any(getattr(i, "force_host", False) for i in instances):
        # backend registry per-slot tier override (kernels/registry.py):
        # a host-forced slot drops its whole batched stage to the host
        # engine -- proof bytes are backend-invariant either way
        return False
    if any(getattr(i, "prefer_stepped", False) for i in instances):
        # stage opted into the per-round stepped driver (stage 8: the
        # whole-stage scan module blew the remote compiler)
        return False
    return all(isinstance(i, ScanFusedInstance) for i in instances)


# ---------------------------------------------------------------------------
# driver
# ---------------------------------------------------------------------------

def _segment_modes(instances, offs, max_rounds):
    """Global segmentation: returns (segments, seg_modes, shrink_sets).
    seg_modes[s][i] is (mode, local_round_of_mode_at_segment_start) or
    None (dormant); shrink_sets[i] is the instance's set of global rounds
    where scan_shrink fires (always segment starts)."""
    edges = {0, max_rounds}
    plans = [inst.scan_plan() for inst in instances]
    shrink_sets = []
    for off, plan, inst in zip(offs, plans, instances):
        assert sum(n for _, n in plan) == inst.num_rounds, \
            f"{type(inst).__name__} plan != num_rounds"
        acc = off
        edges.add(acc)
        shrinks = set()
        for mode, n in plan:
            for s in inst.scan_shrink_plan(mode, n):
                if 0 < s < n:
                    shrinks.add(acc + s)
            acc += n
            edges.add(acc)
        edges |= shrinks
        shrink_sets.append(shrinks)
    bounds = sorted(edges)
    segments = list(zip(bounds[:-1], bounds[1:]))

    seg_modes = []
    for a, b in segments:
        row = []
        for off, plan in zip(offs, plans):
            if a < off:
                row.append(None)
                continue
            pos = off
            hit = None
            for mode, n in plan:
                if pos <= a < pos + n:
                    hit = (mode, a - pos)
                    break
                pos += n
            row.append(hit)
        seg_modes.append(row)
    return segments, seg_modes, shrink_sets


def prove_scan(instances: Sequence[SumcheckInstance],
               accumulator: OpeningAccumulator,
               transcript: Blake2bTranscript,
               ) -> Tuple[List[List[int]], List[int]]:
    """Drop-in replacement for BatchedSumcheck.prove: byte-identical
    output, one device dispatch per stage, O(segments) compile."""
    if not _supports_scan(instances):
        from ..parallel.mesh import active_mesh as _am
        if (any(getattr(i, "prefer_stepped", False) for i in instances)
                and not any(getattr(i, "force_host", False)
                            for i in instances)
                and _am() is None):
            from .stepped import prove_stepped, supports_stepped
            if supports_stepped(instances):
                return prove_stepped(instances, accumulator, transcript)
        return prove_fused(instances, accumulator, transcript)
    from ..utils.profiling import active as _prof_active
    _prof = _prof_active()

    max_rounds = max(i.num_rounds for i in instances)
    n_inst = len(instances)

    for inst in instances:
        transcript.append_scalar(b"sumcheck_claim",
                                 inst.input_claim(accumulator))
    coeffs_host = transcript.challenge_vector(n_inst)

    claims0 = [
        (inst.input_claim(accumulator) << (max_rounds - inst.num_rounds)) % P
        for inst in instances
    ]
    degrees = [getattr(i, "degree", 3) for i in instances]
    max_degree = max(degrees)
    n_coeff = max_degree + 1
    offs = [i.round_offset(max_rounds) for i in instances]
    segments, seg_modes, shrink_sets = _segment_modes(instances, offs,
                                                      max_rounds)

    label_words = jnp.asarray(_label_payload_words(b"sumcheck_poly",
                                                   n_coeff - 1))
    inv2 = _mont(_INV2)

    def stage(state0, n0, claim_arr, coeff_arr, bcs, st0s, xs_all):
        sts = list(st0s)
        state, n = state0, n0
        claims = [claim_arr[:, i:i + 1] for i in range(n_inst)]
        c_mont = [coeff_arr[:, i:i + 1] for i in range(n_inst)]
        all_comp, all_r = [], []
        prev_mode: List[Optional[str]] = [None] * n_inst

        for s, ((a, b), row) in enumerate(zip(segments, seg_modes)):
            # transitions / shrinks into this segment's modes
            for i, inst in enumerate(instances):
                m = row[i][0] if row[i] else None
                pm = prev_mode[i]
                if m is not None and pm is not None and m != pm:
                    sts[i] = inst.scan_transition(pm, m, bcs[i], sts[i])
                elif m is not None and a in shrink_sets[i]:
                    sts[i] = inst.scan_shrink(m, row[i][1], bcs[i], sts[i])
                prev_mode[i] = m

            def body(carry, x, _row=row):
                st_, n_, cl, ss = carry
                ss = list(ss)
                cl = list(cl)
                batched = [jnp.zeros_like(cl[0]) for _ in range(n_coeff)]
                inst_coeffs = [None] * n_inst
                for i, inst in enumerate(instances):
                    if _row[i] is None:
                        cs = [ops.mont_mul(cl[i], inv2)]
                    else:
                        ev = inst.scan_message(_row[i][0], bcs[i], x[i],
                                               ss[i])
                        if ev.ndim == 2:
                            ev = ev[:, :, None]
                        cs = _coeffs_from_evals(ev, cl[i], degrees[i])
                    inst_coeffs[i] = cs
                    for k, c in enumerate(cs):
                        batched[k] = ops.add(batched[k],
                                             ops.mont_mul(c, c_mont[i]))
                compressed = [batched[0]] + batched[2:]
                st_, n_ = dt.absorb32(st_, n_, label_words)
                for c in compressed:
                    st_, n_ = dt.absorb32(st_, n_, dt.canonical_words_be(c))
                st_, n_ = dt.squeeze(st_, n_)
                r = dt.challenge125_to_mont(st_)
                for i, inst in enumerate(instances):
                    cl[i] = _horner(inst_coeffs[i], r)
                    if _row[i] is not None:
                        ss[i] = inst.scan_bind(_row[i][0], bcs[i], x[i],
                                               ss[i], r)
                comp_flat = jnp.concatenate(compressed, axis=1)
                return (st_, n_, tuple(cl), tuple(ss)), (comp_flat, r)

            carry0 = (state, n, tuple(claims), tuple(sts))
            (state, n, claims, sts), (comp_seg, r_seg) = jax.lax.scan(
                body, carry0, xs_all[s], length=b - a)
            claims = list(claims)
            sts = list(sts)
            all_comp.append(comp_seg)
            all_r.append(r_seg)

        flat_comp = jnp.concatenate(all_comp, axis=0)   # (R, L, n_c)
        flat_r = jnp.concatenate(all_r, axis=0)         # (R, L, 1)
        finals = tuple(
            inst.scan_finals(st) for inst, st in zip(instances, sts))
        return state, n, flat_comp, flat_r, finals

    _sp = _prof.span(f"scan_prep[{'+'.join(type(i).__name__ for i in instances)}]")
    _sp.__enter__()
    bcs0 = tuple(inst.scan_bconsts() for inst in instances)
    st00 = tuple(inst.scan_state0() for inst in instances)
    xs_all0 = []
    for (a, b), row in zip(segments, seg_modes):
        xs_all0.append(tuple(
            inst.scan_xs(row[i][0], row[i][1], row[i][1] + (b - a))
            if row[i] else ()
            for i, inst in enumerate(instances)))
    xs_all0 = tuple(xs_all0)

    state0 = jnp.asarray(dt.state_to_words(transcript.state))
    n0 = jnp.asarray(transcript.n_rounds, jnp.uint32)
    claim_arr = ops.pack_ints(claims0)
    coeff_arr = ops.pack_ints(coeffs_host)

    key = (tuple(type(i).__name__ for i in instances), max_rounds,
           tuple(degrees), tuple(offs), tuple(segments),
           tuple(tuple(r) for r in seg_modes),
           tuple(i.fused_key() for i in instances),
           _shape_sig(bcs0), _shape_sig(st00), _shape_sig(xs_all0))
    fn = _SCAN_CACHE.get(key)
    if fn is None:
        fn = jax.jit(stage)
        _SCAN_CACHE[key] = fn
    _sp.__exit__(None, None, None)
    with _prof.span("scan_dispatch_fetch"):
        state_f, n_f, flat_comp, flat_r, finals_f = fn(
            state0, n0, claim_arr, coeff_arr, bcs0, st00, xs_all0)

        # ---- ONE fetch, host transcript replay + self-check --------------
        comp_np, r_np, state_np, finals_np = jax.device_get(
            (flat_comp, flat_r, state_f, finals_f))

    compressed_polys: List[List[int]] = []
    r_sumcheck: List[int] = []
    n_c = n_coeff - 1
    for rnd in range(max_rounds):
        compressed = ops.np_unpack_ints(comp_np[rnd])
        transcript.append_scalars(b"sumcheck_poly", compressed)
        r_j = transcript.challenge_scalar_optimized()
        if r_j != ops.np_unpack_ints(r_np[rnd])[0]:
            raise AssertionError(
                f"device transcript diverged at round {rnd}")
        r_sumcheck.append(r_j)
        compressed_polys.append(compressed)
    assert dt.words_to_state(state_np) == transcript.state

    with _prof.span("scan_post"):
        for inst, fin in zip(instances, finals_np):
            inst.fused_store(fin)
        for inst in instances:
            inst.finalize()
        for inst, off in zip(instances, offs):
            inst.cache_openings(accumulator,
                                r_sumcheck[off:off + inst.num_rounds])
        accumulator.flush_to_transcript(transcript)

    return compressed_polys, r_sumcheck
