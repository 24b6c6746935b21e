"""Batched BN254 G1 arithmetic on TPU (Jacobian coordinates over Fq limbs).

TPU-native replacement for the arkworks-fork G1 kernels the reference links
(`crates/jolt-prover-legacy/src/msm/mod.rs:7-10`, Pippenger + small-scalar
entry points).  A batch of N points is three Fq limb arrays (X, Y, Z) of
shape (L, N); Z == 0 encodes infinity.

Formulas (a = 0 curve):
  * double: dbl-2009-l (7M)
  * add: add-2007-bl (11M+5S) with branchless edge handling -- compute both
    the generic sum and the doubling and select per lane on
    {p_inf, q_inf, same-x} masks.

MSM tier-1 (this round): per-bit subset sums -- exactly the reference's
`msm_binary` pay-per-bit structure (`msm/mod.rs:16-80`): a b-bit MSM costs
b masked tree-reductions + b doublings.  Pippenger bucket accumulation via
sorted segmented reduction is the planned upgrade for full-width scalars.
"""

from __future__ import annotations

from functools import partial
from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..field import FQ, ops
from ..field.params import int_to_limbs, limbs_to_int
from . import bn254_host as host

Point3 = Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]  # (X, Y, Z) limb arrays


def _mul(a, b):
    return ops.mont_mul(a, b, FQ)

def _sqr(a):
    return ops.mont_mul(a, a, FQ)

def _add(a, b):
    return ops.add(a, b, FQ)

def _sub(a, b):
    return ops.sub(a, b, FQ)

def _dbl(a):
    return ops.add(a, a, FQ)


@partial(jax.jit)
def jacobian_double(P: Point3) -> Point3:
    """dbl-2009-l.  Handles infinity naturally (Z=0 -> Z3=0)."""
    X, Y, Z = P
    A = _sqr(X)
    B = _sqr(Y)
    Cc = _sqr(B)
    D = _dbl(_sub(_sub(_sqr(_add(X, B)), A), Cc))
    E = _add(_dbl(A), A)
    F = _sqr(E)
    X3 = _sub(F, _dbl(D))
    Y3 = _sub(_mul(E, _sub(D, X3)), _dbl(_dbl(_dbl(Cc))))
    Z3 = _dbl(_mul(Y, Z))
    return (X3, Y3, Z3)


@partial(jax.jit)
def jacobian_add(P: Point3, Q: Point3) -> Point3:
    """add-2007-bl with branchless edge-case selection."""
    X1, Y1, Z1 = P
    X2, Y2, Z2 = Q
    Z1Z1 = _sqr(Z1)
    Z2Z2 = _sqr(Z2)
    U1 = _mul(X1, Z2Z2)
    U2 = _mul(X2, Z1Z1)
    S1 = _mul(_mul(Y1, Z2), Z2Z2)
    S2 = _mul(_mul(Y2, Z1), Z1Z1)
    H = _sub(U2, U1)
    rr = _dbl(_sub(S2, S1))
    I = _sqr(_dbl(H))
    J = _mul(H, I)
    V = _mul(U1, I)
    X3 = _sub(_sub(_sqr(rr), J), _dbl(V))
    Y3 = _sub(_mul(rr, _sub(V, X3)), _dbl(_mul(S1, J)))
    Z3 = _mul(_sub(_sub(_sqr(_add(Z1, Z2)), Z1Z1), Z2Z2), H)

    p_inf = ops.is_zero(Z1)
    q_inf = ops.is_zero(Z2)
    same_x = ops.is_zero(H)
    same_y = ops.is_zero(rr)
    dX, dY, dZ = jacobian_double(P)

    def sel(m, a, b):
        return ops.select(m, a, b)

    # default: generic add; same_x&&same_y -> double; same_x&&!same_y -> inf
    inf_pt = (jnp.zeros_like(X3), jnp.zeros_like(Y3), jnp.zeros_like(Z3))
    outX = sel(same_x, sel(same_y, dX, inf_pt[0]), X3)
    outY = sel(same_x, sel(same_y, dY, inf_pt[1]), Y3)
    outZ = sel(same_x, sel(same_y, dZ, inf_pt[2]), Z3)
    # infinity inputs
    outX = sel(p_inf, X2, sel(q_inf, X1, outX))
    outY = sel(p_inf, Y2, sel(q_inf, Y1, outY))
    outZ = sel(p_inf, Z2, sel(q_inf, Z1, outZ))
    return (outX, outY, outZ)


@partial(jax.jit)
def _halve(P: Point3) -> Point3:
    X, Y, Z = P
    h = X.shape[-1] // 2
    return jacobian_add((X[..., :h], Y[..., :h], Z[..., :h]),
                        (X[..., h:], Y[..., h:], Z[..., h:]))


def tree_sum(P: Point3) -> Point3:
    """Sum all points over the last axis -> batch 1 (binary tree of adds).

    Host loop over per-level jitted halvings: each level's kernel is shared
    by every caller whose suffix sizes coincide (all MSM bit-iterations,
    all fold sizes), instead of one monolithic compile per input size.
    """
    X, Y, Z = P
    n = X.shape[-1]
    m = 1
    while m < n:
        m *= 2
    if m != n:
        pad = [(0, 0)] * (X.ndim - 1) + [(0, m - n)]
        X, Y, Z = (jnp.pad(a, pad) for a in (X, Y, Z))  # pads Z=0 = infinity
    P = (X, Y, Z)
    while P[0].shape[-1] > 1:
        P = _halve(P)
    return P


@partial(jax.jit)
def mask_points(P: Point3, mask: jnp.ndarray) -> Point3:
    """Zero out (-> infinity) points where mask is False."""
    X, Y, Z = P
    return (X, Y, ops.select(mask, Z, jnp.zeros_like(Z)))


@partial(jax.jit)
def segmented_scan_points(P: Point3, heads: jnp.ndarray) -> Point3:
    """Segmented inclusive prefix-sum of points over the last axis.

    `heads` (uint32, shape (1, N)) marks the first lane of each segment;
    lanes within a segment accumulate left-to-right and reset at heads.
    The per-segment TOTAL sits at each segment's last lane -- the device
    primitive behind sparse one-hot tier-1 commits (sum of generators per
    matrix row; `poly/one_hot_polynomial.rs:119` commit_rows is the
    reference analog).  O(N log N) point adds, one dispatch."""
    X, Y, Z = P

    def combine(a, b):
        ax, ay, az, af = a
        bx, by, bz, bf = b
        sx, sy, sz = jacobian_add((ax, ay, az), (bx, by, bz))
        keep = bf.astype(jnp.bool_)
        return (jnp.where(keep, bx, sx), jnp.where(keep, by, sy),
                jnp.where(keep, bz, sz), af | bf)

    ox, oy, oz, _ = jax.lax.associative_scan(
        combine, (X, Y, Z, jnp.broadcast_to(heads, (1, X.shape[-1]))),
        axis=-1)
    return ox, oy, oz


def msm_binary(P: Point3, bits: jnp.ndarray) -> Point3:
    """Subset sum: sum of points where bits[n] == 1 (msm/mod.rs msm_binary).

    Deliberately NOT wrapped in one jit: tree_sum's per-level _halve kernels
    are shared across all input widths (a monolithic per-length graph costs
    100s+ of XLA:CPU compile per distinct length)."""
    return tree_sum(mask_points(P, bits.astype(jnp.bool_)))


def msm_u8(P: Point3, scalars: jnp.ndarray) -> Point3:
    """MSM with u8 scalars: 8 subset sums combined by doubling."""
    return msm(P, scalars.astype(jnp.uint32), 8)


@partial(jax.jit, static_argnames=('bits',))
def batch_scalar_mul(P: Point3, scalar_words: jnp.ndarray, bits: int) -> Point3:
    """Per-lane scalar multiplication: out[n] = scalars[n] * P[n].

    scalar_words: (W, N) LE uint32 words.  One fori_loop of MSB-first
    double-and-add with per-lane selection -- compiles once, O(bits) steps.
    """
    X, Y, Z = P
    inf = (jnp.zeros_like(X), jnp.zeros_like(Y), jnp.zeros_like(Z))

    def body(i, acc):
        bit_idx = bits - 1 - i
        w = jax.lax.dynamic_index_in_dim(
            scalar_words, bit_idx // jnp.int32(32), 0, keepdims=False)
        sh = (bit_idx % jnp.int32(32)).astype(jnp.uint32)
        bit = ((w >> sh) & jnp.uint32(1)).astype(jnp.bool_)
        acc = jacobian_double(acc)
        return jacobian_add(acc, mask_points(P, bit))

    return jax.lax.fori_loop(0, bits, body, inf)


def msm(P: Point3, scalars: jnp.ndarray, bits: int) -> Point3:
    """MSM with `bits`-bit scalars (uint32 words; for >32 bits pass a
    (W, N) array of LE 32-bit words).

    Binary scalars take the 1-tree subset-sum fast path (msm_binary);
    full-width scalars take Pippenger bucket accumulation; narrow scalars
    fall back to per-lane double-and-add + one tree reduction.
    """
    if scalars.ndim == 1:
        scalars = scalars[None, :]
    if bits == 1:
        return msm_binary(P, scalars[0] & np.uint32(1))
    if bits > 32 and scalars.shape[-1] >= 512:
        return msm_pippenger(P, scalars, bits)
    return tree_sum(batch_scalar_mul(P, scalars, bits))


# ---------------------------------------------------------------------------
# Pippenger (windowed bucket) MSM
#
# TPU formulation of the arkworks Pippenger the reference links
# (`msm/mod.rs:7-10`): the HOST computes each window's digit layout (numpy
# argsort into buckets padded to a power-of-2 stride); the DEVICE gathers
# points into the (buckets, stride) grid and tree-reduces the stride axis
# (fully parallel adds); bucket reconstruction (suffix sums) and the
# window combine run as short jitted fori_loops over 1-lane points.
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnames=('c',))
def _bucket_reconstruct(B: Point3, c: int) -> Point3:
    """sum_k k * B_k for buckets 1..2^c-1 via running suffix sums,
    vectorized over all windows at once: B is (L, n_win, 2^c)."""
    X, Y, Z = B

    def body(i, state):
        run, tot = state
        k = (1 << c) - 1 - i
        bk = (jax.lax.dynamic_slice_in_dim(X, k, 1, 2),
              jax.lax.dynamic_slice_in_dim(Y, k, 1, 2),
              jax.lax.dynamic_slice_in_dim(Z, k, 1, 2))
        run = jacobian_add(run, bk)
        tot = jacobian_add(tot, run)
        return run, tot

    inf = (jnp.zeros((X.shape[0], X.shape[1], 1), X.dtype),) * 3
    _, tot = jax.lax.fori_loop(0, (1 << c) - 1, body, (inf, inf))
    return tot[0][..., 0], tot[1][..., 0], tot[2][..., 0]  # (L, n_win)


@partial(jax.jit, static_argnames=('c',))
def _window_combine(W: Point3, c: int) -> Point3:
    """sum_w 2^(c*w) * W_w, MSB window first: acc = 2^c*acc + W_w."""
    X, Y, Z = W  # (L, n_windows)
    n_win = X.shape[-1]

    def body(i, acc):
        w = n_win - 1 - i
        for _ in range(c):
            acc = jacobian_double(acc)
        return jacobian_add(acc, (
            jax.lax.dynamic_slice_in_dim(X, w, 1, 1),
            jax.lax.dynamic_slice_in_dim(Y, w, 1, 1),
            jax.lax.dynamic_slice_in_dim(Z, w, 1, 1)))

    inf = (jnp.zeros((X.shape[0], 1), X.dtype),) * 3
    return jax.lax.fori_loop(0, n_win, body, inf)


@partial(jax.jit, static_argnames=('shape',))
def _gather_grid(P: Point3, slot_map: jnp.ndarray, shape) -> Point3:
    """Gather lanes into a (buckets, stride) grid; slot_map == N -> the
    appended infinity lane."""
    X, Y, Z = P
    pad = lambda a: jnp.concatenate(
        [a, jnp.zeros(a.shape[:-1] + (1,), a.dtype)], -1)
    Xp, Yp, Zp = pad(X), pad(Y), pad(Z)
    take = lambda a: a[:, slot_map].reshape((a.shape[0],) + shape)
    return take(Xp), take(Yp), take(Zp)


@partial(jax.jit)
def _reduce_stride(G: Point3) -> Point3:
    """Tree-reduce the last (stride) axis of a (L, buckets, S) grid."""
    X, Y, Z = G
    while X.shape[-1] > 1:
        h = X.shape[-1] // 2
        X, Y, Z = jacobian_add((X[..., :h], Y[..., :h], Z[..., :h]),
                               (X[..., h:], Y[..., h:], Z[..., h:]))
    return X[..., 0], Y[..., 0], Z[..., 0]


def msm_pippenger(P: Point3, scalar_words: jnp.ndarray, bits: int,
                  c: int = 8) -> Point3:
    """Full-width MSM via windowed buckets.

    One fused device pass: a single gather builds the (n_win * 2^c, S)
    bucket grid for ALL windows, one tree reduction collapses the stride
    axis, the suffix-sum reconstruction runs 2^c steps vectorized across
    windows, and the O(bits) window combine finishes.  The host only
    computes digit layouts (numpy argsort/bincount)."""
    words = np.asarray(scalar_words)           # (W, N) LE u32
    N = words.shape[-1]
    n_win = (bits + c - 1) // c
    # per-window digits (host)
    digs = []
    for w in range(n_win):
        lo_bit = w * c
        word_i, off = lo_bit // 32, lo_bit % 32
        dig = (words[word_i].astype(np.uint64) >> np.uint64(off))
        if off + c > 32 and word_i + 1 < words.shape[0]:
            dig |= words[word_i + 1].astype(np.uint64) << np.uint64(32 - off)
        digs.append((dig & np.uint64((1 << c) - 1)).astype(np.int64))
    # common stride so every window shares one grid tensor
    S = 1
    max_cnt = 1
    counts_all = []
    orders = []
    starts_all = []
    for dig in digs:
        order = np.argsort(dig, kind="stable")
        sorted_d = dig[order]
        counts = np.bincount(sorted_d, minlength=1 << c)
        starts = np.concatenate([[0], np.cumsum(counts)])[:-1]
        counts[0] = 0
        max_cnt = max(max_cnt, int(counts.max()))
        orders.append(order)
        counts_all.append(counts)
        starts_all.append(starts)
    while S < max_cnt:
        S *= 2
    slot_map = np.full((n_win, 1 << c, S), N, dtype=np.int64)
    for w in range(n_win):
        counts, order, starts = counts_all[w], orders[w], starts_all[w]
        for b in np.nonzero(counts)[0]:
            cnt = counts[b]
            slot_map[w, b, :cnt] = order[starts[b]:starts[b] + cnt]
    grid = _gather_grid(P, jnp.asarray(slot_map.reshape(-1)),
                        (n_win * (1 << c), S))
    bx, by, bz = _reduce_stride(grid)          # (L, n_win*2^c)
    resh = lambda a: a.reshape(a.shape[0], n_win, 1 << c)
    Wx, Wy, Wz = _bucket_reconstruct((resh(bx), resh(by), resh(bz)), c)
    return _window_combine((Wx, Wy, Wz), c)


# ---------------------------------------------------------------------------
# host <-> device
# ---------------------------------------------------------------------------

def pack_points(points: Sequence[host.Point]) -> Point3:
    """Affine host points -> device Jacobian batch (Z=1, infinity Z=0)."""
    n = len(points)
    X = np.zeros((FQ.num_limbs, n), dtype=np.uint32)
    Y = np.zeros((FQ.num_limbs, n), dtype=np.uint32)
    Z = np.zeros((FQ.num_limbs, n), dtype=np.uint32)
    one = FQ.int_to_mont_limbs(1)
    for i, p in enumerate(points):
        if p is None:
            continue
        X[:, i] = FQ.int_to_mont_limbs(p[0])
        Y[:, i] = FQ.int_to_mont_limbs(p[1])
        Z[:, i] = one
    return (jnp.asarray(X), jnp.asarray(Y), jnp.asarray(Z))


def unpack_points(P: Point3) -> List[host.Point]:
    """Device Jacobian batch -> affine host points."""
    X, Y, Z = (np.asarray(jax.device_get(a)) for a in P)
    out: List[host.Point] = []
    for i in range(X.shape[-1]):
        z = FQ.mont_limbs_to_int(Z[:, i])
        if z == 0:
            out.append(None)
            continue
        x = FQ.mont_limbs_to_int(X[:, i])
        y = FQ.mont_limbs_to_int(Y[:, i])
        zinv = pow(z, -1, FQ.modulus)
        out.append((x * zinv * zinv % FQ.modulus,
                    y * zinv * zinv * zinv % FQ.modulus))
    return out
