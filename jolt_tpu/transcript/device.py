"""Device-resident Blake2b-256 Fiat-Shamir transcript.

jnp implementation of EXACTLY the host transcript's operations
(transcript/blake2b.py): every absorb/squeeze is ONE Blake2b compression of
`state(32B) || zeros(28B) || n_rounds_be_u32 || payload(<=32B)` (total
96/64 bytes < one 128-byte block), so a transcript step is a single call
to the compression function F.

This is the enabler for FUSED sumcheck stages: with the transcript state
on device, a whole stage's round loop (message -> absorb -> challenge ->
bind) runs under one jit dispatch, removing the per-round host-device
round trip (~65 ms on the axon relay) that otherwise floors the prover at
~15 rounds/second regardless of trace size.

Bit-exactness vs hashlib is a test gate (tests/test_device_transcript.py);
fused stages must produce byte-identical proofs to the host engine.

State layout: u64 words as uint32 pairs (lo, hi), array shape (n, 2).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..field.params import FR

_U32 = jnp.uint32

# blake2b IV (u64 words, split lo/hi)
_IV64 = [
    0x6A09E667F3BCC908, 0xBB67AE8584CAA73B, 0x3C6EF372FE94F82B,
    0xA54FF53A5F1D36F1, 0x510E527FADE682D1, 0x9B05688C2B3E6C1F,
    0x1F83D9ABFB41BD6B, 0x5BE0CD19137E2179,
]
IV = np.array([[w & 0xFFFFFFFF, w >> 32] for w in _IV64], dtype=np.uint32)
# h for blake2b-256 (digest_size=32, no key, fanout=depth=1)
H_INIT = IV.copy()
H_INIT[0, 0] ^= 0x01010020

_SIGMA = [
    [0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15],
    [14, 10, 4, 8, 9, 15, 13, 6, 1, 12, 0, 2, 11, 7, 5, 3],
    [11, 8, 12, 0, 5, 2, 15, 13, 10, 14, 3, 6, 7, 1, 9, 4],
    [7, 9, 3, 1, 13, 12, 11, 14, 2, 6, 5, 10, 4, 0, 15, 8],
    [9, 0, 5, 7, 2, 4, 10, 15, 14, 1, 11, 12, 6, 8, 3, 13],
    [2, 12, 6, 10, 0, 11, 8, 3, 4, 13, 7, 5, 15, 14, 1, 9],
    [12, 5, 1, 15, 14, 13, 4, 10, 0, 7, 6, 3, 9, 2, 8, 11],
    [13, 11, 7, 14, 12, 1, 3, 9, 5, 0, 15, 4, 8, 6, 2, 10],
    [6, 15, 14, 9, 11, 3, 0, 8, 12, 2, 13, 7, 1, 4, 10, 5],
    [10, 2, 8, 4, 7, 6, 1, 5, 15, 11, 9, 14, 3, 12, 13, 0],
]
SIGMA = np.array(_SIGMA + _SIGMA[:2], dtype=np.int32)       # (12, 16)

# column/diagonal G lanes: (a, b, c, d) quadruples, 4 parallel lanes each
_COLS = np.array([[0, 4, 8, 12], [1, 5, 9, 13], [2, 6, 10, 14],
                  [3, 7, 11, 15]], dtype=np.int32).T         # (4 idx, 4 lanes)
_DIAG = np.array([[0, 5, 10, 15], [1, 6, 11, 12], [2, 7, 8, 13],
                  [3, 4, 9, 14]], dtype=np.int32).T


def _add64(x, y):
    """(..., 2) u32 pairs: x + y mod 2^64."""
    lo = x[..., 0] + y[..., 0]
    carry = (lo < x[..., 0]).astype(_U32)
    hi = x[..., 1] + y[..., 1] + carry
    return jnp.stack([lo, hi], axis=-1)


def _xor64(x, y):
    return x ^ y


def _rotr64(x, n: int):
    lo, hi = x[..., 0], x[..., 1]
    if n == 32:
        return jnp.stack([hi, lo], axis=-1)
    if n < 32:
        new_lo = (lo >> n) | (hi << (32 - n))
        new_hi = (hi >> n) | (lo << (32 - n))
    else:
        m = n - 32
        new_lo = (hi >> m) | (lo << (32 - m))
        new_hi = (lo >> m) | (hi << (32 - m))
    return jnp.stack([new_lo, new_hi], axis=-1)


def _g(a, b, c, d, mx, my):
    a = _add64(_add64(a, b), mx)
    d = _rotr64(_xor64(d, a), 32)
    c = _add64(c, d)
    b = _rotr64(_xor64(b, c), 24)
    a = _add64(_add64(a, b), my)
    d = _rotr64(_xor64(d, a), 16)
    c = _add64(c, d)
    b = _rotr64(_xor64(b, c), 63)
    return a, b, c, d


def compress(h, m, t: int, batch: bool = False):
    """One blake2b compression (final block). h: (8,2) u32, m: (16,2) u32,
    t: message byte length (static int).  Returns h': (8,2)."""
    v0 = jnp.concatenate([h, jnp.asarray(IV)], axis=0)       # (16, 2)
    v0 = v0.at[12, 0].set(v0[12, 0] ^ np.uint32(t & 0xFFFFFFFF))
    v0 = v0.at[12, 1].set(v0[12, 1] ^ np.uint32(t >> 32))
    v0 = v0.at[14].set(v0[14] ^ np.uint32(0xFFFFFFFF))       # final flag

    sigma = jnp.asarray(SIGMA)
    cols = jnp.asarray(_COLS)
    diag = jnp.asarray(_DIAG)

    def round_body(r, v):
        s = sigma[r]

        def half(v, lanes, moff):
            a, b, c, d = v[lanes[0]], v[lanes[1]], v[lanes[2]], v[lanes[3]]
            mx = m[s[moff + jnp.arange(4) * 2]]
            my = m[s[moff + jnp.arange(4) * 2 + 1]]
            a, b, c, d = _g(a, b, c, d, mx, my)
            v = v.at[lanes[0]].set(a).at[lanes[1]].set(b)
            v = v.at[lanes[2]].set(c).at[lanes[3]].set(d)
            return v

        v = half(v, cols, 0)
        v = half(v, diag, 8)
        return v

    v = jax.lax.fori_loop(0, 12, round_body, v0)
    return h ^ v[:8] ^ v[8:16]


def state_to_words(state32: bytes) -> np.ndarray:
    """32-byte transcript state -> (4,2) u32 (u64 LE words as (lo,hi))."""
    w = np.frombuffer(state32, dtype="<u8")
    return np.stack([(w & 0xFFFFFFFF).astype(np.uint32),
                     (w >> 32).astype(np.uint32)], axis=1)


def words_to_state(words) -> bytes:
    w = np.asarray(words)
    u64 = w[:, 0].astype(np.uint64) | (w[:, 1].astype(np.uint64) << np.uint64(32))
    return u64.astype("<u8").tobytes()


def _bytes_to_m(data: bytes) -> np.ndarray:
    """<=128 bytes -> (16,2) u32 message block (zero padded)."""
    padded = data + b"\x00" * (128 - len(data))
    w = np.frombuffer(padded, dtype="<u8")
    return np.stack([(w & 0xFFFFFFFF).astype(np.uint32),
                     (w >> 32).astype(np.uint32)], axis=1)


def prefix_block(state, n_rounds):
    """Device (state(4,2), n_rounds scalar u32) -> the 128-byte message
    block holding state || 28 zero bytes || n_rounds_be_u32 (payload words
    8..11 left zero)."""
    zeros = jnp.zeros((12, 2), _U32)
    blk = jnp.concatenate([state, zeros], axis=0)            # (16, 2)
    # bytes 60..63 (u64 word 7, hi half) hold n_rounds big-endian
    be = ((n_rounds & 0xFF) << 24) | ((n_rounds & 0xFF00) << 8) | \
         ((n_rounds >> 8) & 0xFF00) | (n_rounds >> 24)
    blk = blk.at[7, 1].set(be.astype(_U32))
    return blk                                               # (16, 2), 64B used


def absorb32(state, n_rounds, payload_words):
    """Absorb a 32-byte payload: returns (new_state, n_rounds+1).
    payload_words: (4,2) u32 -- the payload's u64 LE words."""
    blk = prefix_block(state, n_rounds)
    blk = jax.lax.dynamic_update_slice(blk, payload_words, (8, 0))
    return compress(jnp.asarray(H_INIT), blk, 96)[:4], n_rounds + 1


def squeeze(state, n_rounds):
    """Challenge squeeze (empty payload, 64-byte input)."""
    blk = prefix_block(state, n_rounds)
    return compress(jnp.asarray(H_INIT), blk, 64)[:4], n_rounds + 1


# ---------------------------------------------------------------------------
# field <-> transcript byte conversions (device)
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnames=())
def canonical_words_be(x_mont):
    """Montgomery limbs (L,1) -> (4,2) u32: the scalar's 32 BIG-ENDIAN bytes
    as u64 LE words (the absorb payload layout for raw_append_scalar)."""
    from ..field import ops
    fp = FR
    one_raw = np.zeros((fp.num_limbs, 1), np.uint32)
    one_raw[0, 0] = 1
    canon = ops.mont_mul(x_mont, jnp.asarray(one_raw), fp)   # canonical limbs
    # 20 x 13-bit limbs -> 8 u32 words (little-endian value words)
    words = []
    for w in range(8):
        acc = jnp.zeros((), _U32)
        for l in range(fp.num_limbs):
            bit = 13 * l
            lo_bit = bit - 32 * w
            if -13 < lo_bit < 32:
                v = canon[l, 0]
                if lo_bit >= 0:
                    acc = acc | (v << lo_bit)
                else:
                    acc = acc | (v >> (-lo_bit))
        words.append(acc)
    le = jnp.stack(words)                                    # value u32 LE
    # byte-reverse the 32 bytes (BE absorb layout), keep u64-LE word shape
    def bswap(x):
        return (((x & 0xFF) << 24) | ((x & 0xFF00) << 8)
                | ((x >> 8) & 0xFF00) | (x >> 24))
    rev = bswap(le[::-1])                                    # (8,) u32
    return jnp.stack([rev[0::2], rev[1::2]], axis=1)         # (4,2)


def challenge125_to_mont(digest):
    """digest: (4,2) u32 squeeze output (the new state) -> 125-bit
    challenge in Montgomery
    limb form (L,1) (challenge_scalar_optimized: LE-read of the first 16
    digest bytes, top 3 bits masked)."""
    from ..field import ops
    fp = FR
    # first 16 bytes = u64 words 0,1 -> u32 words (lo0, hi0, lo1, hi1)
    w = jnp.stack([digest[0, 0], digest[0, 1], digest[1, 0],
                   digest[1, 1] & np.uint32(0x1FFFFFFF)])
    # u32 words -> 13-bit limbs (raw value, < 2^125)
    limbs = []
    for l in range(fp.num_limbs):
        bit = 13 * l
        acc = jnp.zeros((), _U32)
        for wi in range(4):
            off = bit - 32 * wi
            if -13 < off < 32:
                if off >= 0:
                    acc = acc | (w[wi] >> off)
                else:
                    acc = acc | (w[wi] << (-off))
        limbs.append(acc & np.uint32((1 << 13) - 1))
    raw = jnp.stack(limbs)[:, None]
    return ops.mont_mul(raw, _R2_DEV(), fp)


_R2_CACHE = None


def _R2_DEV():
    """R^2 mod p as plain limbs (to_mont multiplier).  The cache holds
    NUMPY (converted per call site): caching a jnp array created inside a
    jit trace would leak a tracer into later traces."""
    global _R2_CACHE
    if _R2_CACHE is None:
        fp = FR
        R = 1 << (13 * fp.num_limbs)
        r2 = (R * R) % fp.modulus
        limbs = np.zeros((fp.num_limbs, 1), np.uint32)
        for l in range(fp.num_limbs):
            limbs[l, 0] = (r2 >> (13 * l)) & ((1 << 13) - 1)
        _R2_CACHE = limbs
    return jnp.asarray(_R2_CACHE)
