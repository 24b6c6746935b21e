"""Vectorized BN254 field arithmetic in JAX (uint32 limb vectors).

TPU-native replacement for the reference's field layer
(`/root/reference/crates/jolt-field/src/field.rs`, arkworks Montgomery
backend).  See `params.py` for the 20x13-bit limb design rationale.

All public functions operate on arrays of shape ``(NUM_LIMBS, *batch)``
(limbs-first) holding values in **Montgomery form** (x*R mod p), normalized:
every limb < 2**13 and the represented integer < p.  Ops broadcast over the
batch dims, so a scalar is shape ``(NUM_LIMBS, 1)``.

Two implementation tiers:

  * This module: *rolled* limb algebra -- carry chains as `lax.scan`, the
    Montgomery reduction as a `fori_loop`.  Graphs stay ~40 primitives per
    op regardless of limb count, so arbitrary compositions stay cheap to
    trace and compile.  This is the default tier used by all protocol code.
  * `limb_algebra.py`: *unrolled* limb algebra on plain Python lists of
    per-limb arrays, for use INSIDE Pallas kernel bodies where the whole
    round kernel is one Mosaic compilation and register-level fusion is the
    point.  Both tiers are equivalence-tested against a Python-int oracle.
"""

from __future__ import annotations

from functools import partial
from typing import List, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from .params import FR, FQ, FieldParams, LIMB_BITS, LIMB_MASK, NUM_LIMBS

_U32 = jnp.uint32
_MASK = np.uint32(LIMB_MASK)
_W = LIMB_BITS


def _fieldop(*static: str):
    """jit with FieldParams/ints static.  Eager dispatch in this environment
    costs ~5-10ms per primitive op, so every public field op is jitted at the
    API boundary; nested calls inline into the caller's trace."""
    def wrap(fn):
        return jax.jit(fn, static_argnames=static)
    return wrap


# ---------------------------------------------------------------------------
# carry / borrow chains (lax.scan over the limb axis)
# ---------------------------------------------------------------------------

def _propagate(cols: jnp.ndarray, n: int) -> jnp.ndarray:
    """Carry-propagate columns (uint32, arbitrary magnitude) into 13-bit limbs.

    cols: (m, *batch) with m >= n; result (n, *batch).  Caller guarantees the
    fully-propagated value fits n limbs.
    """
    def step(carry, col):
        v = col + carry
        return v >> _W, v & _MASK
    _, out = jax.lax.scan(step, jnp.zeros_like(cols[0]), cols[:n])
    return out


def _borrow_sub(a: jnp.ndarray, b: jnp.ndarray):
    """a - b limbwise with borrow chain; returns (diff, final_borrow).

    a, b: (n, *batch) 13-bit limbs.  diff is the 13-bit wrapped difference;
    final_borrow is 1 where a < b.
    """
    def step(borrow, ab):
        ai, bi = ab
        d = ai - bi - borrow
        return d >> np.uint32(31), d & _MASK
    borrow, diff = jax.lax.scan(step, jnp.zeros_like(a[0]), (a, b))
    return diff, borrow


def _sub_p_select(limbs: jnp.ndarray, fp: FieldParams) -> jnp.ndarray:
    """Return limbs - p if limbs >= p else limbs (value < 2p, normalized in)."""
    p = jnp.asarray(fp.p_limbs, dtype=_U32).reshape((fp.num_limbs,) + (1,) * (limbs.ndim - 1))
    p = jnp.broadcast_to(p, limbs.shape)
    diff, borrow = _borrow_sub(limbs, p)
    keep = borrow.astype(jnp.bool_)  # borrow set -> limbs < p -> keep
    return jnp.where(keep, limbs, diff)


# ---------------------------------------------------------------------------
# add / sub / neg
# ---------------------------------------------------------------------------

@_fieldop('fp')
def add(a: jnp.ndarray, b: jnp.ndarray, fp: FieldParams = FR) -> jnp.ndarray:
    """(a + b) mod p, both normalized Montgomery-form limb arrays."""
    a, b = jnp.broadcast_arrays(a, b)
    return _sub_p_select(_propagate(a + b, fp.num_limbs), fp)


@_fieldop('fp')
def sub(a: jnp.ndarray, b: jnp.ndarray, fp: FieldParams = FR) -> jnp.ndarray:
    """(a - b) mod p.  Computes a + (p - b) to stay unsigned."""
    a, b = jnp.broadcast_arrays(a, b)
    p = jnp.asarray(fp.p_limbs, dtype=_U32).reshape((fp.num_limbs,) + (1,) * (b.ndim - 1))
    pb, _ = _borrow_sub(jnp.broadcast_to(p, b.shape), b)  # p - b (b < p: no net borrow)
    s = _propagate(a + pb, fp.num_limbs)  # < 2p; p-b == p iff b == 0, cond-sub fixes
    return _sub_p_select(s, fp)


@_fieldop('fp')
def neg(a: jnp.ndarray, fp: FieldParams = FR) -> jnp.ndarray:
    return sub(jnp.zeros_like(a), a, fp)


# ---------------------------------------------------------------------------
# Montgomery multiply -- the workhorse
# ---------------------------------------------------------------------------

def _col_index(n: int) -> np.ndarray:
    i = np.arange(n)
    return (i[:, None] + i[None, :]).reshape(-1)  # (n*n,) anti-diagonal ids


_PALLAS_MIN_N = 2048


def _try_pallas_mul(a: jnp.ndarray, b: jnp.ndarray, fp: FieldParams):
    """Trace-time dispatch to the unrolled Pallas kernel (53x the rolled
    tier on TPU).  Returns None when ineligible: non-TPU backend, an active
    device mesh (pallas_call does not shard), odd tile shapes, or small
    batches where dispatch overhead dominates.  Disable with
    JOLT_TPU_NO_PALLAS=1 (equivalence tests compare the tiers)."""
    import os
    if fp is not FR or os.environ.get("JOLT_TPU_NO_PALLAS"):
        return None
    if jax.default_backend() != "tpu":
        return None
    from ..parallel.mesh import active_mesh
    if active_mesh() is not None:
        return None
    shape = jnp.broadcast_shapes(a.shape, b.shape)
    if len(shape) < 2:
        return None
    n = int(np.prod(shape[1:]))
    if n < _PALLAS_MIN_N or n % 128:
        return None
    S = n // 128
    bs = min(32, S)
    if S % bs:
        return None
    from . import pallas_ops
    A = jnp.broadcast_to(a, shape).reshape(shape[0], n)
    B = jnp.broadcast_to(b, shape).reshape(shape[0], n)
    return pallas_ops.mont_mul(A, B).reshape(shape)


@_fieldop('fp')
def mont_mul(a: jnp.ndarray, b: jnp.ndarray, fp: FieldParams = FR) -> jnp.ndarray:
    """Montgomery product (a * b * R^-1 mod p) on limb arrays.

    On the TPU backend, large batches route to the unrolled Pallas kernel
    (`pallas_ops.mont_mul`); the rolled path below is the portable tier.

    Column bound (see params.py): every uint32 column stays < 2^32 with no
    carry handling inside the loop.  Schoolbook columns as n static
    shifted adds (NO scatter -- XLA:CPU lowers scatter to a serial loop,
    >100x slower at wide batches); the 20-step base-2^13 reduction as a
    fori_loop with concatenate-based updates for the same reason.
    """
    fast = _try_pallas_mul(a, b, fp)
    if fast is not None:
        return fast
    n = fp.num_limbs
    a, b = jnp.broadcast_arrays(a, b)
    batch = a.shape[1:]
    cols = jnp.zeros((2 * n,) + batch, dtype=_U32)
    for i in range(n):  # static slices: anti-diagonal accumulation
        seg = jax.lax.dynamic_slice_in_dim(cols, i, n, axis=0)
        cols = jax.lax.dynamic_update_slice_in_dim(
            cols, seg + a[i][None] * b, i, axis=0)

    p_col = jnp.asarray(fp.p_limbs, dtype=_U32).reshape((n,) + (1,) * len(batch))
    n0 = np.uint32(fp.n0inv)

    def body(i, cols):
        seg = jax.lax.dynamic_slice_in_dim(cols, i, n + 1, axis=0)
        m = (seg[0] * n0) & _MASK
        seg = jnp.concatenate([seg[:n] + p_col * m[None], seg[n:]], axis=0)
        carry = seg[0] >> _W
        seg = jnp.concatenate([seg[:1], seg[1:2] + carry[None], seg[2:]],
                              axis=0)
        return jax.lax.dynamic_update_slice_in_dim(cols, seg, i, axis=0)

    cols = jax.lax.fori_loop(0, n, body, cols)
    res = _propagate(cols[n:2 * n], n)
    return _sub_p_select(res, fp)


@_fieldop('fp')
def mont_sqr(a: jnp.ndarray, fp: FieldParams = FR) -> jnp.ndarray:
    return mont_mul(a, a, fp)


def const_mont(c: int, fp: FieldParams = FR, batch_shape=()) -> jnp.ndarray:
    """Host helper: constant c as a Montgomery limb array broadcastable over
    `batch_shape`."""
    limbs = fp.int_to_mont_limbs(c % fp.modulus)
    arr = jnp.asarray(limbs, dtype=_U32)
    return arr.reshape((fp.num_limbs,) + (1,) * len(batch_shape))


def zeros(batch_shape, fp: FieldParams = FR) -> jnp.ndarray:
    return jnp.zeros((fp.num_limbs,) + tuple(batch_shape), dtype=_U32)


def ones(batch_shape, fp: FieldParams = FR) -> jnp.ndarray:
    one = jnp.asarray(fp.one_mont_limbs, dtype=_U32).reshape(
        (fp.num_limbs,) + (1,) * len(batch_shape))
    return jnp.broadcast_to(one, (fp.num_limbs,) + tuple(batch_shape))


# ---------------------------------------------------------------------------
# conversions
# ---------------------------------------------------------------------------

@_fieldop('fp')
def from_u64(lo: jnp.ndarray, hi: jnp.ndarray, fp: FieldParams = FR) -> jnp.ndarray:
    """Lift unsigned 64-bit values (two uint32 words) into Montgomery form.

    The witness on-ramp: trace columns arrive as u32/u64 and become field
    elements here (reference: `JoltField::from_u64`).
    """
    lo = lo.astype(_U32)
    hi = hi.astype(_U32)
    limbs = []
    for k in range(fp.num_limbs):
        start = k * _W
        if start >= 64:
            limbs.append(jnp.zeros_like(lo))
        elif start + _W <= 32:
            limbs.append((lo >> np.uint32(start)) & _MASK)
        elif start >= 32:
            limbs.append((hi >> np.uint32(start - 32)) & _MASK)
        else:
            lo_part = lo >> np.uint32(start)
            hi_part = hi << np.uint32(32 - start)
            limbs.append((lo_part | hi_part) & _MASK)
    plain = jnp.stack(limbs, axis=0)
    r2 = jnp.asarray(fp.r2_limbs, dtype=_U32).reshape((fp.num_limbs,) + (1,) * lo.ndim)
    return _maybe_shard(
        mont_mul(plain, jnp.broadcast_to(r2, plain.shape), fp))  # x*R^2*R^-1


@_fieldop('fp')
def from_u32(x: jnp.ndarray, fp: FieldParams = FR) -> jnp.ndarray:
    return from_u64(x.astype(_U32), jnp.zeros_like(x, dtype=_U32), fp)


@_fieldop('fp')
def from_i64(lo: jnp.ndarray, hi: jnp.ndarray, fp: FieldParams = FR) -> jnp.ndarray:
    """Lift signed 64-bit (two's complement words) into the field."""
    lo = lo.astype(_U32)
    hi = hi.astype(_U32)
    pos = from_u64(lo, hi, fp)
    sign = (hi >> np.uint32(31)).astype(jnp.bool_)
    nlo = (~lo) + np.uint32(1)
    nhi = (~hi) + jnp.where(nlo == 0, np.uint32(1), np.uint32(0))
    neg_abs = neg(from_u64(nlo, nhi, fp), fp)
    return select(sign, neg_abs, pos)


@_fieldop('fp')
def to_canonical(a: jnp.ndarray, fp: FieldParams = FR) -> jnp.ndarray:
    """Montgomery -> canonical 13-bit limbs (x mod p): mont_mul by plain 1."""
    one_plain = jnp.zeros_like(a).at[0].set(1)
    return mont_mul(a, one_plain, fp)


# ---------------------------------------------------------------------------
# equality / selection
# ---------------------------------------------------------------------------

@jax.jit
def eq_mask(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Boolean mask over batch dims: a == b (both normalized, same form)."""
    return jnp.all(a == b, axis=0)


@jax.jit
def is_zero(a: jnp.ndarray) -> jnp.ndarray:
    return jnp.all(a == 0, axis=0)


def select(mask: jnp.ndarray, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Elementwise field select: mask ? a : b.  mask has batch shape."""
    return jnp.where(mask[None, ...], a, b)


# ---------------------------------------------------------------------------
# pow / inverse
# ---------------------------------------------------------------------------

@_fieldop('e', 'fp')
def pow_const(a: jnp.ndarray, e: int, fp: FieldParams = FR) -> jnp.ndarray:
    """a^e for a host-known exponent (square-and-multiply fori_loop)."""
    nbits = max(e.bit_length(), 1)
    exp_bits = jnp.asarray([(e >> i) & 1 for i in range(nbits)], dtype=_U32)
    acc0 = jnp.broadcast_to(ones(a.shape[1:], fp), a.shape)

    def body(i, val):
        acc, base = val
        nacc = mont_mul(acc, base, fp)
        acc = select(exp_bits[i].astype(jnp.bool_), nacc, acc)
        return acc, mont_sqr(base, fp)

    acc, _ = jax.lax.fori_loop(0, nbits, body, (acc0, a))
    return acc


@_fieldop('fp')
def inv(a: jnp.ndarray, fp: FieldParams = FR) -> jnp.ndarray:
    """Batched inverse via Fermat: a^(p-2).  inv(0) = 0."""
    return pow_const(a, fp.modulus - 2, fp)


@_fieldop('fp')
def batch_inverse(a: jnp.ndarray, fp: FieldParams = FR) -> jnp.ndarray:
    """Montgomery batch inversion over the last axis via prefix products.

    O(log N) full-width multiplies (associative scans) + one Fermat inverse,
    vs ~380 multiplies/element for plain Fermat.  Zeros map to zero.
    """
    zmask = is_zero(a)
    a_safe = select(zmask, ones(a.shape[1:], fp), a)
    mul = partial(mont_mul, fp=fp)
    axis = a.ndim - 1
    prefix = jax.lax.associative_scan(mul, a_safe, axis=axis)
    total_inv = inv(prefix[..., -1:], fp)
    suffix = jnp.flip(jax.lax.associative_scan(mul, jnp.flip(a_safe, -1), axis=axis), -1)
    one_tail = ones(a.shape[1:-1] + (1,), fp)
    tail = jnp.concatenate([suffix[..., 1:], jnp.broadcast_to(one_tail, suffix[..., :1].shape)], -1)
    inv_prefix = mont_mul(jnp.broadcast_to(total_inv, tail.shape), tail, fp)
    shifted = jnp.concatenate(
        [jnp.broadcast_to(one_tail, prefix[..., :1].shape), prefix[..., :-1]], -1)
    out = mont_mul(inv_prefix, shifted, fp)
    return select(zmask, zeros(a.shape[1:], fp), out)


# ---------------------------------------------------------------------------
# reductions
# ---------------------------------------------------------------------------

_LAZY_CHUNK = 1 << 18  # sum of < 2^18 13-bit limbs stays < 2^31 in uint32


@_fieldop('fp')
def reduce_lazy_cols(cols: jnp.ndarray, fp: FieldParams = FR) -> jnp.ndarray:
    """Reduce raw uint32 column sums (value < 2^19 * p) to a normalized
    field element.

    The WideAccumulator idea (`jolt-field/src/arkworks/wide_accumulator.rs`)
    applied to addition: columns hold unpropagated sums S with
    S = S_lo + S_hi * R (R = 2^260); S mod p = mont_mul(S_lo, oneM)
    + mont_mul(S_hi, R2)  (mont_mul by the Montgomery rep of 1 computes
    x*R*R^-1 = x mod p)."""
    n = fp.num_limbs
    ext = _propagate_ext(cols, n + 2)
    s_lo = ext[:n]
    s_hi = jnp.zeros_like(s_lo).at[0].set(ext[n]).at[1].set(ext[n + 1])
    one_m = jnp.asarray(fp.one_mont_limbs, dtype=_U32).reshape(
        (n,) + (1,) * (s_lo.ndim - 1))
    r2 = jnp.asarray(fp.r2_limbs, dtype=_U32).reshape(
        (n,) + (1,) * (s_lo.ndim - 1))
    lo = mont_mul(s_lo, jnp.broadcast_to(one_m, s_lo.shape), fp)
    hi = mont_mul(s_hi, jnp.broadcast_to(r2, s_hi.shape), fp)
    return add(lo, hi, fp)


def _propagate_ext(cols: jnp.ndarray, n_out: int) -> jnp.ndarray:
    """Carry-propagate uint32 columns into n_out 13-bit limbs (value must
    fit n_out limbs)."""
    def step(carry, col):
        v = col + carry
        return v >> _W, v & _MASK
    pad = n_out - cols.shape[0]
    if pad > 0:
        cols = jnp.concatenate(
            [cols, jnp.zeros((pad,) + cols.shape[1:], dtype=_U32)], axis=0)
    _, out = jax.lax.scan(step, jnp.zeros_like(cols[0]), cols[:n_out])
    return out


@_fieldop('fp')
def sum_mod(a: jnp.ndarray, fp: FieldParams = FR) -> jnp.ndarray:
    """Sum field elements over the LAST axis -> shape (..., 1).

    Lazy accumulation: 13-bit limbs sum natively in uint32 for up to 2^18
    terms (one XLA reduction), then a single wide reduction; recursion
    handles larger axes.  Exact and order-free (mod-p ints)."""
    n = a.shape[-1]
    if n <= _LAZY_CHUNK:
        cols = jnp.sum(a, axis=-1, dtype=_U32, keepdims=True)
        return reduce_lazy_cols(cols, fp)
    # split into chunks of <= 2^18, reduce each, then recurse
    m = _LAZY_CHUNK
    full = (n // m) * m
    head = a[..., :full].reshape(a.shape[:-1] + (n // m, m))
    cols = jnp.sum(head, axis=-1, dtype=_U32)
    partial = reduce_lazy_cols(cols, fp)  # (..., n//m)
    if full != n:
        tail = sum_mod(a[..., full:], fp)
        partial = jnp.concatenate([partial, tail], axis=-1)
    return sum_mod(partial, fp)


@_fieldop('fp')
def dot(a: jnp.ndarray, b: jnp.ndarray, fp: FieldParams = FR) -> jnp.ndarray:
    """Inner product over the last axis: sum_i a_i * b_i -> (..., 1)."""
    return sum_mod(mont_mul(a, b, fp), fp)


@_fieldop('num_segments', 'fp')
def segment_sum_mod(a: jnp.ndarray, ids: jnp.ndarray, num_segments: int,
                    fp: FieldParams = FR) -> jnp.ndarray:
    """Segment sum over the LAST axis: out[..., s] = sum_{i: ids[i]=s} a[..., i].

    The device primitive behind sparse one-hot aggregation (suffix-table
    builds, flag claims): limbs accumulate raw in uint32 (13-bit limbs sum
    safely for up to 2^18 terms per chunk), then one lazy wide reduction per
    segment.  Exact mod-p, order-free."""
    T = a.shape[-1]
    lead = a.shape[:-1]
    m = _LAZY_CHUNK

    def one_chunk(chunk, chunk_ids):
        flat = chunk.reshape(-1, chunk.shape[-1]).T          # (t, prod(lead))
        seg = jax.ops.segment_sum(flat, chunk_ids,
                                  num_segments=num_segments)  # (S, prod)
        cols = seg.T.reshape(lead + (num_segments,))
        return reduce_lazy_cols(cols, fp)

    if T <= m:
        return one_chunk(a, ids)
    out = None
    for start in range(0, T, m):
        part = one_chunk(a[..., start:start + m], ids[start:start + m])
        out = part if out is None else add(out, part, fp)
    return out


# ---------------------------------------------------------------------------
# host <-> device conversion of Python ints (tests / transcript boundary)
# ---------------------------------------------------------------------------

_SCALAR_CACHE: dict = {}


def pack_ints(vals, fp: FieldParams = FR) -> jnp.ndarray:
    """Python ints -> Montgomery limb array of shape (NUM_LIMBS, len(vals)).

    Witness columns repeat values heavily (one-hot flags, register values),
    so conversions are memoized per call.  Single scalars (sumcheck
    challenges -- every instance of a batch packs the same r each round)
    are memoized in a small module cache keyed on the active mesh."""
    if len(vals) == 1:
        from ..parallel.mesh import active_mesh
        key = (int(vals[0]), fp.modulus, id(active_mesh()))
        hit = _SCALAR_CACHE.get(key)
        if hit is not None:
            return hit
        if len(_SCALAR_CACHE) > 1024:
            _SCALAR_CACHE.clear()
        out = _maybe_shard(jnp.asarray(
            fp.int_to_mont_limbs(int(vals[0]))[:, None], dtype=_U32))
        # never cache under a trace: device_put inside jit yields a tracer
        # whose escape would poison later proves (UnexpectedTracerError)
        if not isinstance(out, jax.core.Tracer):
            _SCALAR_CACHE[key] = out
        return out
    if len(vals) >= 256:
        return _pack_ints_vectorized(vals, fp)
    cache = {}
    cols = []
    for v in vals:
        v = int(v)
        limbs = cache.get(v)
        if limbs is None:
            limbs = fp.int_to_mont_limbs(v)
            cache[v] = limbs
        cols.append(limbs)
    arr = np.stack(cols, axis=1) if cols else np.zeros((fp.num_limbs, 0), np.uint32)
    return _maybe_shard(jnp.asarray(arr, dtype=_U32))


def _pack_ints_vectorized(vals, fp: FieldParams = FR) -> jnp.ndarray:
    """Bulk int -> Montgomery-limb conversion: serialize canonical values
    to bytes (the only per-element Python work), slice 13-bit limbs with
    numpy word shifts, and do the to-Montgomery multiply ON DEVICE (one
    mont_mul by R^2).  ~5x faster than the per-int host path on the
     32T-long Az/Bz/Cz materializations."""
    p = fp.modulus
    n = len(vals)
    buf = b"".join((int(v) % p).to_bytes(32, "little") for v in vals)
    w = np.frombuffer(buf, dtype="<u8").reshape(n, 4)        # 4 u64 words
    nl, lb = fp.num_limbs, fp.limb_bits
    mask = np.uint64((1 << lb) - 1)
    limbs = np.zeros((nl, n), np.uint32)
    for l in range(nl):
        bit = l * lb
        word, off = bit // 64, bit % 64
        v = w[:, word] >> np.uint64(off)
        if off > 64 - lb and word + 1 < 4:
            v = v | (w[:, word + 1] << np.uint64(64 - off))
        limbs[l] = (v & mask).astype(np.uint32)
    raw = _maybe_shard(jnp.asarray(limbs))
    r2 = (1 << (2 * nl * lb)) % p
    r2_limbs = np.zeros((nl, 1), np.uint32)
    for l in range(nl):
        r2_limbs[l, 0] = (r2 >> (l * lb)) & ((1 << lb) - 1)
    return mont_mul(raw, jnp.asarray(r2_limbs), fp)


def _maybe_shard(a: jnp.ndarray) -> jnp.ndarray:
    """Shard witness arrays over the active cycle mesh (no-op without one);
    late import avoids a field <-> parallel cycle."""
    from ..parallel.mesh import maybe_shard
    return maybe_shard(a)


def unpack_ints(a: jnp.ndarray, fp: FieldParams = FR):
    """Montgomery limb array (NUM_LIMBS, N) -> list of canonical Python ints."""
    return np_unpack_ints(np.asarray(jax.device_get(a)), fp)


def np_unpack_ints(arr: np.ndarray, fp: FieldParams = FR):
    """Host-side twin of unpack_ints for already-fetched arrays (the
    engine's one-device_get-per-round batching)."""
    flat = arr.reshape(arr.shape[0], -1)
    return [fp.mont_limbs_to_int(flat[:, i]) for i in range(flat.shape[1])]
