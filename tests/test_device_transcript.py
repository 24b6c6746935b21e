"""Device Blake2b transcript: bit-exactness vs the host (hashlib) transcript.

The gate for fused sumcheck stages: every device transcript step must
reproduce the host transcript byte-for-byte, so fused proofs stay
byte-identical to the host engine's.
"""
import hashlib
import random

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from jolt_tpu.field import FR, ops
from jolt_tpu.transcript import Blake2bTranscript
from jolt_tpu.transcript import device as dt

P = FR.modulus


def test_compress_matches_hashlib():
    rng = random.Random(1)
    for n in (0, 1, 31, 32, 63, 64, 96, 127):
        data = bytes(rng.randrange(256) for _ in range(n))
        want = hashlib.blake2b(data, digest_size=32).digest()
        m = dt._bytes_to_m(data)
        h = dt.compress(jnp.asarray(dt.H_INIT), jnp.asarray(m), n)
        assert dt.words_to_state(jax.device_get(h)[:4]) == want, n


def test_absorb_and_squeeze_match_host():
    rng = random.Random(2)
    host = Blake2bTranscript(b"fused")
    state = jnp.asarray(dt.state_to_words(host.state))
    n = jnp.asarray(host.n_rounds, jnp.uint32)
    for _ in range(10):
        s = rng.randrange(P)
        host.raw_append_scalar(s)
        payload = dt.canonical_words_be(ops.pack_ints([s]))
        state, n = dt.absorb32(state, n, payload)
        assert dt.words_to_state(jax.device_get(state)) == host.state
    # challenge squeeze parity
    want = host.challenge_scalar_optimized()
    state, n = dt.squeeze(state, n)
    got_mont = dt.challenge125_to_mont(state)
    got = ops.unpack_ints(got_mont)[0]
    assert got == want
    assert dt.words_to_state(jax.device_get(state)) == host.state
    assert int(jax.device_get(n)) == host.n_rounds


def test_canonical_words_be():
    rng = random.Random(3)
    for _ in range(8):
        v = rng.randrange(P)
        w = jax.device_get(dt.canonical_words_be(ops.pack_ints([v])))
        got = dt.words_to_state(w)
        assert got == v.to_bytes(32, "big")
