"""Stepped sumcheck driver: ONE batched device dispatch per round.

The middle tier between the host engine (engine.py: per-instance eager
dispatches, ~50 ms each on the axon relay -- a 20-instance stage pays
20 x 2 dispatches per round) and the scan driver (scan.py: the whole
stage in one dispatch, but the XLA module contains every segment's round
body -- at stage-8's ~20 heterogeneous instances the single remote
compile exceeded 35 minutes at 2^18).

This driver reuses the `ScanFusedInstance` protocol but keeps the
Fiat-Shamir transcript on the HOST and compiles one *round body per
segment* as its own small module:

    per round:  msg_fn(bcs, sts, xs, t)        -> all messages, 1 dispatch
                fetch (one device_get)
                host: UniPoly recovery, RLC, absorb, challenge  [engine.py
                      code paths -- proof bytes are host-engine-identical]
                sts = bind_fn(bcs, sts, xs, t, r)               1 dispatch

Per-round cost is 2 dispatches + 1 fetch (~0.15 s on the relay)
regardless of instance count; compile cost is O(segments) SMALL modules
(each ~1/segments the size of the scan module, compiled + cached
independently), which is what makes it viable for the stage-8 joint
reduction.  Reference economics: `subprotocols/sumcheck.rs:87-155` (the
round loop is latency-bound, not FLOP-bound, at production sizes).
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp

from ..field import ops
from ..field.params import FR
from ..poly.univariate import UniPoly
from ..transcript import Blake2bTranscript
from .engine import BatchedSumcheck, OpeningAccumulator, SumcheckInstance
from .fused import _shape_sig
from .scan import ScanFusedInstance, _segment_modes

P = FR.modulus
_INV2 = pow(2, -1, P)
_STEP_CACHE: dict = {}


def supports_stepped(instances) -> bool:
    return all(isinstance(i, ScanFusedInstance) for i in instances)


def prove_stepped(instances: Sequence[SumcheckInstance],
                  accumulator: OpeningAccumulator,
                  transcript: Blake2bTranscript,
                  ) -> Tuple[List[List[int]], List[int]]:
    """Drop-in replacement for BatchedSumcheck.prove: byte-identical
    output, 2 device dispatches per round, O(segments) small compiles."""
    if not supports_stepped(instances):
        return BatchedSumcheck.prove(instances, accumulator, transcript)
    from ..utils.profiling import active as _prof_active
    _prof = _prof_active()

    max_rounds = max(i.num_rounds for i in instances)
    n_inst = len(instances)

    for inst in instances:
        transcript.append_scalar(b"sumcheck_claim",
                                 inst.input_claim(accumulator))
    coeffs = transcript.challenge_vector(n_inst)
    claims = [
        (inst.input_claim(accumulator) << (max_rounds - inst.num_rounds)) % P
        for inst in instances
    ]
    degrees = [getattr(i, "degree", 3) for i in instances]
    offs = [i.round_offset(max_rounds) for i in instances]
    segments, seg_modes, shrink_sets = _segment_modes(instances, offs,
                                                      max_rounds)

    with _prof.span(
            f"stepped_prep[{'+'.join(type(i).__name__ for i in instances)}]"):
        bcs = tuple(inst.scan_bconsts() for inst in instances)
        sts = tuple(inst.scan_state0() for inst in instances)

    type_key = (tuple(type(i).__name__ for i in instances), max_rounds,
                tuple(degrees), tuple(offs),
                tuple(i.fused_key() for i in instances))

    def _jit(tag, seg_idx, fn, *shape_args):
        # NB no buffer donation: instances legitimately share state leaves
        # (shared eq tables, broadcast zeros), and donating an aliased
        # buffer twice is an XLA execute error.
        key = (type_key, tag, seg_idx,
               tuple(_shape_sig(a) for a in shape_args))
        hit = _STEP_CACHE.get(key)
        if hit is None:
            hit = jax.jit(fn)
            _STEP_CACHE[key] = hit
        return hit

    compressed_polys: List[List[int]] = []
    r_sumcheck: List[int] = []
    two_inv = _INV2
    prev_mode: List[object] = [None] * n_inst

    for s, ((a, b), row) in enumerate(zip(segments, seg_modes)):
        # ---- segment entry: transitions + shrinks, ONE dispatch ----------
        trans = []
        for i, inst in enumerate(instances):
            m = row[i][0] if row[i] else None
            pm = prev_mode[i]
            if m is not None and pm is not None and m != pm:
                trans.append((i, "t", pm, m))
            elif m is not None and a in shrink_sets[i]:
                trans.append((i, "s", m, row[i][1]))
            prev_mode[i] = m
        if trans:
            def enter(bcs_, sts_, _trans=trans):
                new = list(sts_)
                for i, kind, x1, x2 in _trans:
                    if kind == "t":
                        new[i] = instances[i].scan_transition(
                            x1, x2, bcs_[i], new[i])
                    else:
                        new[i] = instances[i].scan_shrink(
                            x1, x2, bcs_[i], new[i])
                return tuple(new)
            sts = _jit("enter", s, enter, bcs, sts)(bcs, sts)

        xs = tuple(
            inst.scan_xs(row[i][0], row[i][1], row[i][1] + (b - a))
            if row[i] else ()
            for i, inst in enumerate(instances))
        active = [i for i in range(n_inst) if row[i] is not None]

        # ---- per-round bodies (compiled once per segment) ----------------
        def _x_at(xs_, i, t):
            if xs_[i] == () or xs_[i] is None:
                return ()
            return jax.tree_util.tree_map(lambda leaf: leaf[t], xs_[i])

        def msg_fn(bcs_, sts_, xs_, t, _row=row, _act=active):
            outs = []
            for i in _act:
                ev = instances[i].scan_message(
                    _row[i][0], bcs_[i], _x_at(xs_, i, t), sts_[i])
                if ev.ndim == 2:
                    ev = ev[:, :, None]
                outs.append(ev)
            return jnp.concatenate(outs, axis=1) if outs else jnp.zeros(
                (FR.num_limbs, 0, 1), jnp.uint32)

        def bind_fn(bcs_, sts_, xs_, t, r, _row=row, _act=active):
            new = list(sts_)
            for i in _act:
                new[i] = instances[i].scan_bind(
                    _row[i][0], bcs_[i], _x_at(xs_, i, t), new[i], r)
            return tuple(new)

        jf_msg = _jit("msg", s, msg_fn, bcs, sts, xs)
        jf_bind = _jit("bind", s, bind_fn, bcs, sts, xs)

        for rnd in range(a, b):
            t = jnp.uint32(rnd - a)
            with _prof.span("stepped_msg"):
                ev_all = jf_msg(bcs, sts, xs, t)
                ev_np = ops.np_unpack_ints(jax.device_get(ev_all))
            polys: List[UniPoly] = []
            pos = 0
            for i in range(n_inst):
                if row[i] is None:
                    polys.append(UniPoly([claims[i] * two_inv % P]))
                else:
                    evals = ev_np[pos:pos + degrees[i]]
                    pos += degrees[i]
                    polys.append(UniPoly.from_evals_and_hint(
                        claims[i], evals, P))
            batched = UniPoly([0])
            for poly, c in zip(polys, coeffs):
                batched = batched.add(poly.scale(c))
            compressed = batched.compress()
            transcript.append_scalars(b"sumcheck_poly", compressed)
            r_j = transcript.challenge_scalar_optimized()
            r_sumcheck.append(r_j)
            compressed_polys.append(compressed)
            claims = [poly.evaluate(r_j) for poly in polys]
            with _prof.span("stepped_bind"):
                sts = jf_bind(bcs, sts, xs, t, ops.pack_ints([r_j]))

    # ---- finals: ONE fetch ------------------------------------------------
    with _prof.span("stepped_finals"):
        finals = jax.device_get(tuple(
            inst.scan_finals(st) for inst, st in zip(instances, sts)))
    for inst, fin in zip(instances, finals):
        inst.fused_store(fin)
    for inst in instances:
        inst.finalize()
    for inst, off in zip(instances, offs):
        inst.cache_openings(accumulator,
                            r_sumcheck[off:off + inst.num_rounds])
    accumulator.flush_to_transcript(transcript)
    return compressed_polys, r_sumcheck
