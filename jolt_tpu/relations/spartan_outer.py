"""Spartan outer sumcheck over the uniform RV64 R1CS, with univariate skip.

Proves  0 = sum_{k,j} weight(k) * eq(tau, j) * (Az(k,j)*Bz(k,j) - Cz(k,j))
over the constraint axis (k in [22]) and cycle axis (j in [T]).

Round-2 redesign to the reference's stage-1 shape
(`zkvm/spartan/outer.rs`, `subprotocols/univariate_skip.rs:29-131`):
the constraint axis is NOT walked as 5 boolean sumcheck rounds over a
padded 32-row grid.  Instead the 22 rows split into 2 groups of 11; the
slot-in-group index maps to the symmetric integer window {-5..5} and the
first round sends ONE univariate

    s1(Y) = L(tau_high, Y) * t1(Y),        deg(s1) <= 30 (31 coeffs)
    t1(y) = sum_{g,x} eq(tau_g,g) eq(tau_cyc,x) (Az*Bz - Cz)(y,g,x)

where Az(y,g,x) interpolates the group's 11 rows along y.  t1 vanishes on
the base window (satisfied constraints), so the prover only evaluates the
10 extrapolated targets {-6,6,...,-10,10} (`uniskip_targets`).  After the
skip challenge r0, the remaining sumcheck runs 1 + log T rounds (group bit
then cycle bits) over arrays of length 2T -- 16x less device data than the
round-1 padded 32T layout, and the constraint rounds collapse from 5 to
the single group round.

The reference's analogous constants are degree 9 / domain 10 / 28 coeffs
for its 19 eq-only constraints (`r1cs/constraints.rs:413-422`); ours are
degree 10 / domain 11 / 31 coeffs because the 3 product-virtual rows stay
in stage 1 (Cz rides the same univariate -- sound for any t1 that vanishes
on the base window).

Device work: Az/Bz/Cz row combos are evaluated ON DEVICE as sparse linear
combinations of the 38 packed input columns (one lax.scan over terms with
raw-uint32 lazy accumulation) -- the round-1 host bigint materialization
loop is gone.  Host work: transcript, Lagrange algebra (<=31-point,
`poly/lagrange.py`), verifier algebra.
"""

from __future__ import annotations

from functools import partial
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..field import FR, ops
from ..poly import dense, eq
from ..poly import lagrange as lag
from ..r1cs import constraints as C
from ..sumcheck import scan
from ..sumcheck.engine import OpeningAccumulator, SumcheckInstance
from ..witness.r1cs_inputs import NUM_VARS, R1CSCycleInputs, VAR_NAMES

P = FR.modulus

# constraint-axis geometry: 22 rows = 2 groups x 11 slots
UNISKIP_DOMAIN = 11
UNISKIP_DEGREE = 10                      # extended targets outside the window
UNISKIP_NUM_COEFFS = 3 * UNISKIP_DEGREE + 1   # deg(L * t1) <= 30
NUM_GROUPS = 2
assert C.NUM_CONSTRAINTS == NUM_GROUPS * UNISKIP_DOMAIN


def num_stage1_rounds(log_T: int) -> int:
    """Remaining-sumcheck rounds after the uni-skip first round."""
    return 1 + log_T


# ---------------------------------------------------------------------------
# device evaluation of sparse row combos
# ---------------------------------------------------------------------------

def _lift_body(lo32a, lo32b, hi32a, hi32b, sign_mask):
    vlo = ops.from_u64(lo32a, lo32b)
    vhi = ops.from_u64(hi32a, hi32b)
    two64 = ops.const_mont(1 << 64, batch_shape=vlo.shape[1:])
    val = ops.add(vlo, ops.mont_mul(vhi, two64))
    two128 = ops.const_mont(1 << 128, batch_shape=vlo.shape[1:])
    corr = jnp.where(sign_mask[None], jnp.broadcast_to(two128, val.shape),
                     jnp.zeros_like(val))
    return ops.sub(val, corr)


@jax.jit
def _lift_columns_kernel(lo32a, lo32b, hi32a, hi32b, sign_mask):
    """(lo, hi) u64 columns (as u32 word pairs) -> Montgomery limb array;
    value = hi*2^64 + lo - sign_mask*2^128 (exact signed semantics)."""
    return _lift_body(lo32a, lo32b, hi32a, hi32b, sign_mask)


def pack_input_columns(inputs: R1CSCycleInputs) -> jnp.ndarray:
    """All 38 columns as one Montgomery limb array (L, 38, T): the u64
    (lo, hi) witness arrays lift on DEVICE (no per-int host serialization)."""
    from ..witness.r1cs_inputs import SIGNED_COLS
    lo, hi = inputs.lo, inputs.hi
    m32 = np.uint64(0xFFFFFFFF)
    signed_rows = np.zeros(NUM_VARS, bool)
    for v in SIGNED_COLS:
        signed_rows[v] = True
    sign_mask = signed_rows[:, None] & ((hi >> np.uint64(63)) == 1)
    return _lift_columns_kernel(
        jnp.asarray((lo & m32).astype(np.uint32)),
        jnp.asarray((lo >> np.uint64(32)).astype(np.uint32)),
        jnp.asarray((hi & m32).astype(np.uint32)),
        jnp.asarray((hi >> np.uint64(32)).astype(np.uint32)),
        jnp.asarray(sign_mask))


def _combo_terms(w_rows: Sequence[Tuple[int, Dict[int, int]]]):
    """Flatten [(out_idx, {var: coeff})] into device term arrays."""
    Wv, vi, oi = [], [], []
    for out_idx, lc in w_rows:
        for v, coeff in sorted(lc.items()):
            if coeff % P == 0:
                continue
            Wv.append(coeff % P)
            vi.append(v)
            oi.append(out_idx)
    Wvals = ops.pack_ints(Wv) if Wv else ops.pack_ints([0])
    return (jnp.moveaxis(Wvals, -1, 0),                 # (n_terms, L)
            jnp.asarray(vi or [0], dtype=jnp.int32),
            jnp.asarray(oi or [0], dtype=jnp.int32))


def _combo_body(cols, Wvals, v_idx, out_idx, n_out, fp=FR):
    L_, _, T = cols.shape
    acc0 = jnp.zeros((n_out, L_, T), dtype=jnp.uint32)

    def body(acc, t):
        w, vi, oi = t
        col = jax.lax.dynamic_index_in_dim(cols, vi, axis=1, keepdims=False)
        prod = ops.mont_mul(w[:, None], col, fp)        # (L, T)
        cur = jax.lax.dynamic_index_in_dim(acc, oi, axis=0, keepdims=False)
        return jax.lax.dynamic_update_index_in_dim(
            acc, cur + prod, oi, axis=0), None

    acc, _ = jax.lax.scan(body, acc0, (Wvals, v_idx, out_idx))
    return ops.reduce_lazy_cols(jnp.moveaxis(acc, 0, 1), fp)   # (L, n_out, T)


@partial(jax.jit, static_argnames=("n_out", "fp"))
def _combo_kernel(cols, Wvals, v_idx, out_idx, n_out, fp=FR):
    """out[:, o, :] = sum_{t: out_idx[t]=o} Wvals[t] * cols[:, v_idx[t], :]

    One lax.scan over terms; Montgomery products accumulate as raw uint32
    limb sums (<= 38 terms per output << the 2^18 lazy budget), then one
    wide reduction."""
    return _combo_body(cols, Wvals, v_idx, out_idx, n_out, fp)


# ---------------------------------------------------------------------------
# streaming (chunked) tier: the stage-1 column stack never materializes in
# Montgomery form.  The u64 (lo, hi) columns stay device-resident (16 bytes
# per value vs 80 for limbs); every consumer -- the uni-skip extended
# evaluations, the Y=r0 bound matrices, and the final input openings --
# lifts and combines one cycle-chunk at a time under a sequential lax.map.
# This is the analog of the reference's windowed first rounds
# (`subprotocols/streaming_schedule.rs`): peak HBM for stage 1 drops from
# O(38 * T * limbs) (12.7 GB at 2^22) to O(38 * T * 16B + chunk), and the
# 2^22 reference-scale trace cap fits a single chip.
# ---------------------------------------------------------------------------

# chunk length for the streaming tier (power of two)
STREAM_CHUNK = 1 << 16
# materialized-tier threshold: stream when T exceeds this
STREAM_THRESHOLD = 1 << 19


def pack_u64_columns(inputs: R1CSCycleInputs):
    """Device-resident u64 column stack: (lo32a, lo32b, hi32a, hi32b,
    sign_mask), each (38, T)."""
    from ..witness.r1cs_inputs import SIGNED_COLS
    lo, hi = inputs.lo, inputs.hi
    m32 = np.uint64(0xFFFFFFFF)
    signed_rows = np.zeros(NUM_VARS, bool)
    for v in SIGNED_COLS:
        signed_rows[v] = True
    sign_mask = signed_rows[:, None] & ((hi >> np.uint64(63)) == 1)
    return (jnp.asarray((lo & m32).astype(np.uint32)),
            jnp.asarray((lo >> np.uint64(32)).astype(np.uint32)),
            jnp.asarray((hi & m32).astype(np.uint32)),
            jnp.asarray((hi >> np.uint64(32)).astype(np.uint32)),
            jnp.asarray(sign_mask))


def _chunk_slice(u64cols, ci, C):
    return [jax.lax.dynamic_slice_in_dim(x, ci * C, C, axis=1)
            for x in u64cols]


@partial(jax.jit, static_argnames=("n_out", "C", "fp"))
def _uniskip_sums_chunked(u64cols, E_cyc, tA, tB, tC, n_out, C, fp=FR):
    """sum_j E(j) * (Az*Bz - Cz)(out, j) for the uni-skip extended targets,
    streamed: (L, n_out) raw-u32 lazy partials accumulated over chunks."""
    T = u64cols[0].shape[1]
    n_chunks = T // C

    def chunk_fn(acc, ci):
        cols = _lift_body(*_chunk_slice(u64cols, ci, C))
        AZ = _combo_body(cols, *tA, n_out, fp)
        BZ = _combo_body(cols, *tB, n_out, fp)
        CZ = _combo_body(cols, *tC, n_out, fp)
        inner = ops.sub(ops.mont_mul(AZ, BZ, fp), CZ, fp)
        Ec = jax.lax.dynamic_slice_in_dim(E_cyc, ci * C, C, axis=1)
        part = ops.dot(inner, Ec[:, None, :], fp)        # (L, n_out, 1)
        return acc + part[..., 0], None

    acc0 = jnp.zeros((fp.num_limbs, n_out), jnp.uint32)
    acc, _ = jax.lax.scan(chunk_fn, acc0,
                          jnp.arange(n_chunks, dtype=jnp.int32))
    return ops.reduce_lazy_cols(acc, fp)


@partial(jax.jit, static_argnames=("n_out", "C", "fp"))
def _combo_chunked(u64cols, tW, n_out, C, fp=FR):
    """Full-length combo output (L, n_out, T), built chunk-by-chunk."""
    T = u64cols[0].shape[1]
    n_chunks = T // C

    def chunk_fn(ci):
        cols = _lift_body(*_chunk_slice(u64cols, ci, C))
        return _combo_body(cols, *tW, n_out, fp)         # (L, n_out, C)

    parts = jax.lax.map(chunk_fn, jnp.arange(n_chunks, dtype=jnp.int32))
    return jnp.moveaxis(parts, 0, 2).reshape(
        (fp.num_limbs, n_out, T))


@partial(jax.jit, static_argnames=("C", "fp"))
def _openings_chunked(u64cols, E, C, fp=FR):
    """All 38 input-MLE evaluations sum_j eq(r,j)*col(j), streamed."""
    T = u64cols[0].shape[1]
    n_chunks = T // C

    def chunk_fn(acc, ci):
        cols = _lift_body(*_chunk_slice(u64cols, ci, C))
        Ec = jax.lax.dynamic_slice_in_dim(E, ci * C, C, axis=1)
        part = ops.dot(cols, Ec[:, None, :], fp)         # (L, 38, 1)
        return acc + part[..., 0], None

    acc0 = jnp.zeros((fp.num_limbs, NUM_VARS), jnp.uint32)
    acc, _ = jax.lax.scan(chunk_fn, acc0,
                          jnp.arange(n_chunks, dtype=jnp.int32))
    return ops.reduce_lazy_cols(acc, fp)


def _group_w_rows(y_basis: Sequence[int]):
    """For Lagrange weights [l_i(y)] over the 11-slot window, build the
    per-(group, matrix) combined LCs  W[g][m] : var -> sum_i l_i * coeff."""
    rows = C.all_rows()
    W: List[List[Dict[int, int]]] = [[{}, {}, {}] for _ in range(NUM_GROUPS)]
    for k, (a, b, c) in enumerate(rows):
        g, slot = divmod(k, UNISKIP_DOMAIN)
        w = y_basis[slot]
        for m, lc in ((0, a), (1, b), (2, c)):
            d = W[g][m]
            for v, coeff in lc:
                d[v] = (d.get(v, 0) + w * coeff) % P
    return W


# ---------------------------------------------------------------------------
# uni-skip first round (prover)
# ---------------------------------------------------------------------------

def prove_uniskip(inputs: R1CSCycleInputs, tau: Sequence[int], transcript):
    """Compute + absorb the uni-skip first-round polynomial; returns
    (cols_dev, s1_coeffs, r0, claim1, l_scale).

    tau = [tau_high, tau_g, *tau_cyc]  (1 + 1 + log_T challenges).

    Streaming tier (T >= STREAM_THRESHOLD or JOLT_TPU_STREAM_STAGE1=1):
    the Montgomery column stack never materializes; the extended
    evaluations stream over cycle chunks and the returned handle keeps the
    u64 columns for the bound-matrix / openings consumers."""
    import os as _os
    tau_high, tau_g, tau_cyc = tau[0], tau[1], list(tau[2:])
    stream = (inputs.T >= STREAM_THRESHOLD
              or _os.environ.get("JOLT_TPU_STREAM_STAGE1") == "1")
    E_cyc = eq.evals(tau_cyc)                            # (L, T)

    base = lag.symmetric_domain(UNISKIP_DOMAIN)
    targets = lag.uniskip_targets(UNISKIP_DOMAIN, UNISKIP_DEGREE)
    ext_tab = lag.extension_table(base, targets)         # [z][slot]

    # one flat term list over out = (z, g) for each matrix
    w_rows = {0: [], 1: [], 2: []}
    for zi in range(UNISKIP_DEGREE):
        Wz = _group_w_rows(ext_tab[zi])
        for g in range(NUM_GROUPS):
            for m in range(3):
                w_rows[m].append((zi * NUM_GROUPS + g, Wz[g][m]))
    n_out = UNISKIP_DEGREE * NUM_GROUPS
    if stream:
        u64cols = pack_u64_columns(inputs)
        C = min(STREAM_CHUNK, inputs.T)
        sums = _uniskip_sums_chunked(
            u64cols, E_cyc, _combo_terms(w_rows[0]),
            _combo_terms(w_rows[1]), _combo_terms(w_rows[2]), n_out, C)
        zg = ops.unpack_ints(sums)
        cols_dev = ("stream", u64cols)
    else:
        cols_dev = pack_input_columns(inputs)
        AZ = _combo_kernel(cols_dev, *_combo_terms(w_rows[0]), n_out)
        BZ = _combo_kernel(cols_dev, *_combo_terms(w_rows[1]), n_out)
        CZ = _combo_kernel(cols_dev, *_combo_terms(w_rows[2]), n_out)
        inner = ops.sub(ops.mont_mul(AZ, BZ), CZ)        # (L, n_out, T)
        sums = ops.dot(inner, E_cyc[:, None, :])         # (L, n_out, 1)
        zg = ops.unpack_ints(sums.reshape(sums.shape[0], n_out))

    eq_g = [(1 - tau_g) % P, tau_g % P]
    t1_ext = [(eq_g[0] * zg[zi * NUM_GROUPS] +
               eq_g[1] * zg[zi * NUM_GROUPS + 1]) % P
              for zi in range(UNISKIP_DEGREE)]

    # t1 through 11 base zeros + 10 extended values; s1 = L(tau_high,.)*t1
    xs = [z % P for z in base + targets]
    ys = [0] * UNISKIP_DOMAIN + t1_ext
    t1_coeffs = lag.interpolate_coeffs(xs, ys)
    s1_coeffs = lag.poly_mul(
        lag.lagrange_kernel_coeffs(tau_high, UNISKIP_DOMAIN), t1_coeffs)
    assert len(s1_coeffs) == UNISKIP_NUM_COEFFS

    transcript.append_scalars(b"uniskip_poly", s1_coeffs)
    r0 = transcript.challenge_scalar_optimized()
    claim1 = lag.eval_poly(s1_coeffs, r0)
    l_scale = lag.eval_poly(
        lag.lagrange_kernel_coeffs(tau_high, UNISKIP_DOMAIN), r0)
    return cols_dev, s1_coeffs, r0, claim1, l_scale


def verify_uniskip(coeffs: Sequence[int], transcript):
    """Verifier half of the skip round: degree bound, base-window sum = 0
    (`UniSkipFirstRoundProof::verify`), challenge + next claim."""
    from ..sumcheck.engine import SumcheckError
    if not 0 < len(coeffs) <= UNISKIP_NUM_COEFFS:
        raise SumcheckError(
            f"uniskip poly has {len(coeffs)} coeffs (max {UNISKIP_NUM_COEFFS})")
    transcript.append_scalars(b"uniskip_poly", coeffs)
    r0 = transcript.challenge_scalar_optimized()
    if lag.domain_sum(coeffs, UNISKIP_DOMAIN) != 0:
        raise SumcheckError("uniskip base-window sum is nonzero")
    return r0, lag.eval_poly(coeffs, r0)


# ---------------------------------------------------------------------------
# remaining sumcheck: 1 group round + log T cycle rounds over 2T arrays
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnames=('fp',))
def _outer_message_kernel(E, AZ, BZ, CZ, fp=FR):
    """Round evals at X in {0,2,3} of sum eq*(Az*Bz - Cz).  (L, 3, 1)."""
    e = dense.sumcheck_eval_points_high(E, 3, fp)
    a = dense.sumcheck_eval_points_high(AZ, 3, fp)
    b = dense.sumcheck_eval_points_high(BZ, 3, fp)
    c = dense.sumcheck_eval_points_high(CZ, 3, fp)
    inner = ops.sub(ops.mont_mul(a, b, fp), c, fp)
    return ops.sum_mod(ops.mont_mul(e, inner, fp), fp)


@partial(jax.jit, static_argnames=('fp',))
def _bind4(E, AZ, BZ, CZ, r, fp=FR):
    return (dense.bind_high(E, r, fp), dense.bind_high(AZ, r, fp),
            dense.bind_high(BZ, r, fp), dense.bind_high(CZ, r, fp))


class SpartanOuterProver(scan.ScanFusedInstance):
    """The post-skip sumcheck: index = g*T + j (group bit is the MSB,
    bound first, HighToLow).  E carries eq(tau_g,g)*eq(tau_cyc,j) scaled
    by L(tau_high, r0), so the input claim is exactly s1(r0)."""

    def __init__(self, inputs: R1CSCycleInputs, tau: Sequence[int],
                 r0: int, claim: int, l_scale: int,
                 cols_dev: Optional[jnp.ndarray] = None):
        self.inputs = inputs
        T = inputs.T
        self.log_T = T.bit_length() - 1
        self._num_rounds = 1 + self.log_T
        assert len(tau) == self._num_rounds
        tau_g, tau_cyc = tau[0], list(tau[1:])
        self.cols_dev = (cols_dev if cols_dev is not None
                         else pack_input_columns(inputs))
        self._stream = (isinstance(self.cols_dev, tuple)
                        and self.cols_dev[0] == "stream")
        self._claim = claim % P

        # Az/Bz/Cz bound to Y=r0: (L, 2, T) -> (L, 2T)
        y_basis = lag.lagrange_basis_at(
            lag.symmetric_domain(UNISKIP_DOMAIN), r0)
        Wr = _group_w_rows(y_basis)
        mats = []
        for m in range(3):
            rows = [(g, Wr[g][m]) for g in range(NUM_GROUPS)]
            if self._stream:
                out = _combo_chunked(self.cols_dev[1], _combo_terms(rows),
                                     NUM_GROUPS, min(STREAM_CHUNK, T))
            else:
                out = _combo_kernel(self.cols_dev, *_combo_terms(rows),
                                    NUM_GROUPS)
            mats.append(out.reshape(out.shape[0], NUM_GROUPS * T))
        self.AZ, self.BZ, self.CZ = mats

        E_cyc = eq.evals(tau_cyc)
        e0 = ops.mont_mul(E_cyc, ops.pack_ints(
            [(1 - tau_g) % P * l_scale % P]))
        e1 = ops.mont_mul(E_cyc, ops.pack_ints([tau_g * l_scale % P]))
        self.E = jnp.concatenate([e0, e1], axis=-1)
        self.final_az = self.final_bz = self.final_cz = None
        self.input_openings: Optional[List[int]] = None

    @property
    def num_rounds(self) -> int:
        return self._num_rounds

    def input_claim(self, accumulator: OpeningAccumulator) -> int:
        return self._claim

    def message_evals_dev(self, round: int):
        return _outer_message_kernel(self.E, self.AZ, self.BZ, self.CZ), None

    def ingest_challenge(self, r: int, round: int) -> None:
        r_dev = ops.pack_ints([r])
        self.E, self.AZ, self.BZ, self.CZ = _bind4(
            self.E, self.AZ, self.BZ, self.CZ, r_dev)

    # ---- fused (device-transcript) protocol -----------------------------

    degree = 3

    def fused_state(self):
        return (self.E, self.AZ, self.BZ, self.CZ)

    def fused_message(self, consts, st, round: int):
        return _outer_message_kernel(*st)

    def fused_bind(self, consts, st, r_mont, round: int):
        return _bind4(*st, r_mont)

    def fused_store(self, finals) -> None:
        self.E, self.AZ, self.BZ, self.CZ = finals

    # ---- scan-fused protocol --------------------------------------------

    def scan_plan(self):
        return [("main", self.num_rounds)]

    def scan_state0(self):
        return tuple(scan.to_pair_order(X)
                     for X in (self.E, self.AZ, self.BZ, self.CZ))

    def scan_message(self, mode, bc, x, st):
        E, AZ, BZ, CZ = st
        e = scan.pair_eval_points(E, 3)
        a = scan.pair_eval_points(AZ, 3)
        b = scan.pair_eval_points(BZ, 3)
        c = scan.pair_eval_points(CZ, 3)
        inner = ops.sub(ops.mont_mul(a, b, FR), c, FR)
        return ops.sum_mod(ops.mont_mul(e, inner, FR), FR)

    def scan_bind(self, mode, bc, x, st, r):
        return tuple(scan.pair_bind(X, r) for X in st)

    def scan_shrink_plan(self, mode, n_rounds):
        return scan.default_shrink_plan(n_rounds, 1 << self.num_rounds)

    def scan_shrink(self, mode, s, bc, st):
        n = 1 << (self.num_rounds - s)
        return tuple(X[..., :n] for X in st)

    def scan_finals(self, st):
        return tuple(X[:, :1] for X in st)

    def finalize(self) -> None:
        self.final_az = ops.unpack_ints(self.AZ)[0]
        self.final_bz = ops.unpack_ints(self.BZ)[0]
        self.final_cz = ops.unpack_ints(self.CZ)[0]

    def cache_openings(self, accumulator: OpeningAccumulator,
                       r_slice: Sequence[int]) -> None:
        """Evaluate all 38 R1CS input MLEs at r_cycle and cache the claims
        (these feed later stages / the PCS opening)."""
        r_cycle = list(r_slice[1:])
        Ecyc = eq.evals(r_cycle)
        if self._stream:
            T = self.inputs.T
            sums = _openings_chunked(self.cols_dev[1], Ecyc,
                                     min(STREAM_CHUNK, T))
            vals = ops.unpack_ints(sums)
        else:
            sums = ops.dot(self.cols_dev, Ecyc[:, None, :])   # (L, 38, 1)
            vals = ops.unpack_ints(sums.reshape(sums.shape[0], NUM_VARS))
        openings = []
        for v in range(NUM_VARS):
            val = vals[v]
            openings.append(val)
            accumulator.insert(("r1cs_input", VAR_NAMES[v]), r_cycle, val)
        self.input_openings = openings

    def expected_output_claim(self, accumulator, r):  # prover-side unused
        raise NotImplementedError


class SpartanOuterVerifier(SumcheckInstance):
    """Verifier half: recomputes Az/Bz/Cz(r0, r_g, r_cycle) from the 38
    input openings via chi_k = l_{slot_k}(r0) * eq(r_g, g_k)."""

    def __init__(self, num_rounds: int, tau: Sequence[int], r0: int,
                 input_openings: Sequence[int], claim: int):
        self._num_rounds = num_rounds
        self.tau = list(tau)           # [tau_high, tau_g, *tau_cyc]
        self.r0 = r0 % P
        self.z = list(input_openings)
        self._claim = claim % P
        assert len(self.z) == NUM_VARS

    @property
    def num_rounds(self) -> int:
        return self._num_rounds

    def input_claim(self, accumulator: OpeningAccumulator) -> int:
        return self._claim

    def compute_message(self, round, prev):  # pragma: no cover
        raise NotImplementedError("verifier instance")

    def ingest_challenge(self, r, round):  # pragma: no cover
        raise NotImplementedError("verifier instance")

    def expected_output_claim(self, accumulator: OpeningAccumulator,
                              r: Sequence[int]) -> int:
        r = list(r)
        r_g = r[0]
        y_basis = lag.lagrange_basis_at(
            lag.symmetric_domain(UNISKIP_DOMAIN), self.r0)
        rows = C.all_rows()
        az = bz = cz = 0
        for k, (a, b, c) in enumerate(rows):
            g, slot = divmod(k, UNISKIP_DOMAIN)
            chi = y_basis[slot] * (r_g if g else (1 - r_g)) % P
            az = (az + chi * self._eval_lc(a)) % P
            bz = (bz + chi * self._eval_lc(b)) % P
            cz = (cz + chi * self._eval_lc(c)) % P
        # eq over (tau_g, tau_cyc) vs r, times the Lagrange kernel factor
        l_scale = lag.eval_poly(
            lag.lagrange_kernel_coeffs(self.tau[0], UNISKIP_DOMAIN), self.r0)
        eq_tau_r = eq.eq_int(self.tau[1:], r)
        return l_scale * eq_tau_r % P * ((az * bz - cz) % P) % P

    def _eval_lc(self, lc) -> int:
        return sum(coeff * self.z[v] for v, coeff in lc) % P
