"""Structural known-answer tests for the Blake2b Fiat-Shamir transcript.

True byte-parity fixtures against the Rust `LegacyBlake2bTranscript` require
running the reference (no Rust toolchain in this image); these tests instead
verify the exact hash composition rules from
`crates/jolt-prover-legacy/src/transcripts/blake2b.rs` against hashlib
directly, so any regression in framing/padding/ordering is caught.
"""
import hashlib

from jolt_tpu.transcript import Blake2bTranscript
from jolt_tpu.field.params import FR


def b2(data: bytes) -> bytes:
    return hashlib.blake2b(data, digest_size=32).digest()


def test_new_label_padding():
    t = Blake2bTranscript(b"Jolt")
    assert t.state == b2(b"Jolt" + b"\x00" * 28)
    assert t.n_rounds == 0
    # 32-byte label: no padding
    t32 = Blake2bTranscript(b"A" * 32)
    assert t32.state == b2(b"A" * 32)


def test_append_bytes_framing():
    t = Blake2bTranscript(b"test")
    s0 = t.state
    t.raw_append_bytes(b"hello")
    expect = b2(s0 + b"\x00" * 28 + (0).to_bytes(4, "big") + b"hello")
    assert t.state == expect and t.n_rounds == 1
    s1 = t.state
    t.raw_append_u64(0xDEAD)
    expect = b2(s1 + b"\x00" * 28 + (1).to_bytes(4, "big") + b"\x00" * 24 + (0xDEAD).to_bytes(8, "big"))
    assert t.state == expect and t.n_rounds == 2


def test_append_scalar_be():
    t = Blake2bTranscript(b"test")
    s0 = t.state
    x = 123456789123456789123456789
    t.raw_append_scalar(x)
    expect = b2(s0 + b"\x00" * 28 + (0).to_bytes(4, "big") + x.to_bytes(32, "big"))
    assert t.state == expect


def test_labeled_append_composition():
    t1 = Blake2bTranscript(b"test")
    t1.append_u64(b"len", 7)
    t2 = Blake2bTranscript(b"test")
    t2.raw_append_label(b"len")
    t2.raw_append_u64(7)
    assert t1.state == t2.state and t1.n_rounds == t2.n_rounds == 2

    t3 = Blake2bTranscript(b"test")
    t3.append_bytes(b"blob", b"xyz")
    t4 = Blake2bTranscript(b"test")
    t4.raw_append_bytes(b"blob" + b"\x00" * 20 + (3).to_bytes(8, "big"))
    t4.raw_append_bytes(b"xyz")
    assert t3.state == t4.state


def test_challenge_semantics():
    t = Blake2bTranscript(b"test")
    s0, n0 = t.state, t.n_rounds
    # squeeze = blake2b(state || pad || round), then state := squeeze
    expect = b2(s0 + b"\x00" * 28 + n0.to_bytes(4, "big"))
    c = t.challenge_u128()
    assert t.state == expect
    assert c == int.from_bytes(expect[:16], "little")

    t2 = Blake2bTranscript(b"test")
    s = t2.challenge_scalar()
    assert s == int.from_bytes(expect[:16], "big") % FR.modulus

    t3 = Blake2bTranscript(b"test")
    o = t3.challenge_scalar_optimized()
    assert o == int.from_bytes(expect[:16], "little") & ((1 << 125) - 1)


def test_challenges_distinct_and_deterministic():
    t = Blake2bTranscript(b"test_128_bit_scalar")
    seen = {t.challenge_scalar() for _ in range(200)}
    assert len(seen) == 200
    for s in seen:
        assert s < (1 << 128)  # 128-bit challenges (blake2b.rs:156-167)
    t2 = Blake2bTranscript(b"test_128_bit_scalar")
    assert t2.challenge_scalar() in seen


def test_history_recording():
    t = Blake2bTranscript(b"x", record_history=True)
    t.append_u64(b"a", 1)
    t.challenge_scalar()
    assert len(t.history) == 1 + 2 + 1  # init + label+u64 + one squeeze
