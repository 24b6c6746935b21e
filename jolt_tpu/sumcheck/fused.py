"""Fused sumcheck stages: the whole round loop under ONE jit dispatch.

The host engine (engine.py) pays one device round-trip per round (message
fetch) -- ~65 ms on the axon TPU relay -- so a prove is RTT-bound at ~15
rounds/s regardless of trace size.  This driver moves the Fiat-Shamir
transcript itself onto the device (transcript/device.py, bit-exact
Blake2b) and runs message -> coefficient recovery -> RLC -> absorb ->
challenge -> claim update -> bind for ALL rounds of a stage inside one
jitted call.  One fetch at the end returns every round's compressed
coefficients and challenges; the host then REPLAYS its own transcript over
the fetched values and asserts the replayed challenges equal the device's
-- proofs are byte-identical to the host engine by construction, and any
device-transcript divergence is caught immediately.

An instance opts in by implementing the `FusedInstance` protocol below;
stages containing a non-fused instance (or running under a device mesh, or
with JOLT_TPU_FUSE=0) fall back to BatchedSumcheck unchanged.

Purity contract: `fused_message` / `fused_bind` may read ONLY the
`consts` / `st` pytrees passed in (all trace- and challenge-dependent
device data must flow through them) plus universal constants; compiled
stage graphs are cached across proves keyed on (instance types,
fused_key, pytree structure + leaf shapes).
"""

from __future__ import annotations

import os
from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..field import ops
from ..field.params import FR
from ..transcript import Blake2bTranscript
from ..transcript import device as dt
from .engine import BatchedSumcheck, OpeningAccumulator, SumcheckInstance

P = FR.modulus
_INV2 = pow(2, -1, P)
_INV6 = pow(6, -1, P)
_FUSED_CACHE: dict = {}


def _mont(v: int):
    return ops.pack_ints([v % P])


def _coeffs_from_evals(evals, claim, degree: int, fp=FR):
    """Device twin of UniPoly.from_evals_and_hint (+_degree2/_degree3):
    evals (L, d, 1) at X in {0, 2, .., d}; claim = s(0)+s(1) (L, 1).
    Returns list of d+1 (L, 1) coefficient arrays."""
    e0 = evals[:, 0]
    e1 = ops.sub(claim, e0, fp)
    if degree == 1:
        return [e0, ops.sub(e1, e0, fp)]
    if degree == 2:
        e2 = evals[:, 1]
        inv2 = _mont(_INV2)
        c0 = e0
        s = ops.sub(ops.add(e0, e2, fp), ops.add(e1, e1, fp), fp)
        c2 = ops.mont_mul(s, inv2, fp)
        c1 = ops.sub(ops.sub(e1, e0, fp), c2, fp)
        return [c0, c1, c2]
    if degree == 3:
        e2, e3 = evals[:, 1], evals[:, 2]
        inv2, inv6 = _mont(_INV2), _mont(_INV6)
        c0 = e0
        d12 = ops.sub(e1, e2, fp)
        t = ops.add(ops.sub(e3, e0, fp),
                    ops.add(d12, ops.add(d12, d12, fp), fp), fp)
        c3 = ops.mont_mul(t, inv6, fp)
        s = ops.sub(ops.add(e0, e2, fp), ops.add(e1, e1, fp), fp)
        c2 = ops.sub(ops.mont_mul(s, inv2, fp),
                     ops.add(c3, ops.add(c3, c3, fp), fp), fp)
        c1 = ops.sub(ops.sub(ops.sub(e1, e0, fp), c2, fp), c3, fp)
        return [c0, c1, c2, c3]
    raise NotImplementedError(f"fused degree {degree}")


def _horner(coeffs, r, fp=FR):
    acc = coeffs[-1]
    for c in reversed(coeffs[:-1]):
        acc = ops.add(ops.mont_mul(acc, r, fp), c, fp)
    return acc


class FusedInstance(SumcheckInstance):
    """Mixin protocol: device-resident round loop support."""

    def fused_consts(self):
        """Read-only device data (pytree): schedules, masks, tables,
        challenge-derived weights.  Not returned from the jit."""
        return ()

    def fused_state(self):
        """The instance's mutable device state (pytree of arrays)."""
        raise NotImplementedError

    def fused_message(self, consts, st, round: int):
        """(L, degree, 1) message evals at X in {0,2,..,d} (static round),
        ALREADY including any scale factors the host path applies in its
        `post` hook (done on device here)."""
        raise NotImplementedError

    def fused_bind(self, consts, st, r_mont, round: int):
        """Bind the current variable to r; returns the new state pytree."""
        raise NotImplementedError

    def fused_finals(self, st):
        """Select the (small) sub-pytree of the final state that
        finalize()/cache_openings need; fetched with ONE device_get."""
        return st

    def fused_store(self, finals) -> None:
        """Write the fetched final arrays back so finalize() works."""
        raise NotImplementedError

    def fused_key(self):
        """Extra static identity for the compile cache (anything that
        changes the traced graph but not the pytree shapes)."""
        return ()


def _supports_fused(instances) -> bool:
    from ..parallel.mesh import active_mesh
    if os.environ.get("JOLT_TPU_FUSE") != "1":
        # OPT-IN: fusion removes every per-round host-device round-trip
        # (~65 ms each on the axon relay) but pays one huge XLA compile per
        # stage shape -- measured 203 s for a single 15-round instance on
        # XLA:CPU (run time 0.12 s).  Until the round loop is re-rolled as
        # a lax.scan over masked fixed-size tables, the host engine's
        # one-fetch-per-round batching is the better default everywhere.
        return False
    if active_mesh() is not None:
        return False   # sharded path stays on the host engine
    return all(isinstance(i, FusedInstance) for i in instances)


def _label_payload_words(label: bytes, length: int) -> np.ndarray:
    """Static absorb payload for append_scalars' label_with_len prefix."""
    packed = label + b"\x00" * (24 - len(label)) + length.to_bytes(8, "big")
    w = np.frombuffer(packed, dtype="<u8")
    return np.stack([(w & 0xFFFFFFFF).astype(np.uint32),
                     (w >> 32).astype(np.uint32)], axis=1)


def _shape_sig(tree):
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    return (str(treedef),
            tuple((tuple(l.shape), str(l.dtype)) for l in leaves))


def prove_fused(instances: Sequence[SumcheckInstance],
                accumulator: OpeningAccumulator,
                transcript: Blake2bTranscript,
                ) -> Tuple[List[List[int]], List[int]]:
    """Drop-in replacement for BatchedSumcheck.prove: byte-identical
    output, one device dispatch for the whole round loop."""
    if not _supports_fused(instances):
        return BatchedSumcheck.prove(instances, accumulator, transcript)

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

    label_words = jnp.asarray(_label_payload_words(b"sumcheck_poly",
                                                   n_coeff - 1))
    inv2 = _mont(_INV2)

    def stage(state0, n0, claim_arr, coeff_arr, consts_in, st_in):
        # per-prove data (claims, RLC coefficients, witnesses, schedules)
        # enters as ARGUMENTS so the compiled graph is reusable across
        # proves (cache below)
        sts = list(st_in)
        state, n = state0, n0
        claims = [claim_arr[:, i:i + 1] for i in range(n_inst)]
        c_mont = [coeff_arr[:, i:i + 1] for i in range(n_inst)]
        out_compressed = []   # per round: list of (L,1) mont coeffs
        out_r = []

        for rnd in range(max_rounds):
            batched = [jnp.zeros_like(claims[0]) for _ in range(n_coeff)]
            inst_coeffs = [None] * n_inst
            for i, inst in enumerate(instances):
                if offs[i] <= rnd < offs[i] + inst.num_rounds:
                    ev = inst.fused_message(consts_in[i], sts[i],
                                            rnd - offs[i])
                    if ev.ndim == 2:
                        ev = ev[:, :, None]
                    cs = _coeffs_from_evals(ev, claims[i], degrees[i])
                else:
                    cs = [ops.mont_mul(claims[i], inv2)]
                inst_coeffs[i] = cs
                for k, c in enumerate(cs):
                    batched[k] = ops.add(
                        batched[k], ops.mont_mul(c, c_mont[i]))
            # compress: drop linear coefficient
            compressed = [batched[0]] + batched[2:]
            out_compressed.append(compressed)
            # absorb: label_with_len, then each scalar (BE bytes)
            state, n = dt.absorb32(state, n, label_words)
            for c in compressed:
                state, n = dt.absorb32(state, n, dt.canonical_words_be(c))
            # challenge (125-bit, Montgomery form)
            state, n = dt.squeeze(state, n)
            r = dt.challenge125_to_mont(state)
            out_r.append(r)
            # claim + bind updates
            for i, inst in enumerate(instances):
                claims[i] = _horner(inst_coeffs[i], r)
                if offs[i] <= rnd < offs[i] + inst.num_rounds:
                    sts[i] = inst.fused_bind(consts_in[i], sts[i], r,
                                             rnd - offs[i])

        flat_comp = jnp.concatenate(
            [jnp.concatenate(cs, axis=1) for cs in out_compressed], axis=1)
        flat_r = jnp.concatenate(out_r, axis=1)
        finals = tuple(inst.fused_finals(st)
                       for inst, st in zip(instances, sts))
        return state, n, flat_comp, flat_r, finals

    consts0 = tuple(inst.fused_consts() for inst in instances)
    st0 = tuple(inst.fused_state() for inst in instances)
    state0 = jnp.asarray(dt.state_to_words(transcript.state))
    n0 = jnp.asarray(transcript.n_rounds, jnp.uint32)
    claim_arr = ops.pack_ints(claims0)
    coeff_arr = ops.pack_ints(coeffs_host)

    # Cache compiled stage graphs across proves: the closure only reads
    # static instance attributes + the argument pytrees (the FusedInstance
    # purity contract), so a graph keyed on (types, static keys, pytree
    # structure + shapes) is reusable with fresh witness data.
    key = (tuple(type(i).__name__ for i in instances), max_rounds,
           tuple(degrees), tuple(offs),
           tuple(i.fused_key() for i in instances),
           _shape_sig(consts0), _shape_sig(st0))
    fused = _FUSED_CACHE.get(key)
    if fused is None:
        fused = jax.jit(stage)
        _FUSED_CACHE[key] = fused
    state_f, n_f, flat_comp, flat_r, finals_f = fused(
        state0, n0, claim_arr, coeff_arr, consts0, st0)

    # ---- ONE fetch for the whole stage ----------------------------------
    comp_np, r_np, state_np, finals_np = jax.device_get(
        (flat_comp, flat_r, state_f, finals_f))
    comp_ints = ops.np_unpack_ints(comp_np)
    r_ints = ops.np_unpack_ints(r_np)

    # ---- host transcript replay + challenge self-check ------------------
    compressed_polys: List[List[int]] = []
    r_sumcheck: List[int] = []
    n_c = n_coeff - 1   # compressed length (linear coefficient dropped)
    for rnd in range(max_rounds):
        compressed = comp_ints[rnd * n_c:(rnd + 1) * n_c]
        transcript.append_scalars(b"sumcheck_poly", compressed)
        r_j = transcript.challenge_scalar_optimized()
        if r_j != r_ints[rnd]:
            raise AssertionError(
                f"device transcript diverged at round {rnd}")
        r_sumcheck.append(r_j)
        compressed_polys.append(compressed)
    assert dt.words_to_state(state_np) == transcript.state

    for inst, fin in zip(instances, finals_np):
        inst.fused_store(fin)
    for inst in instances:
        inst.finalize()
    for inst, off in zip(instances, offs):
        inst.cache_openings(accumulator,
                            r_sumcheck[off:off + inst.num_rounds])
    accumulator.flush_to_transcript(transcript)

    return compressed_polys, r_sumcheck
