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


# ---------------------------------------------------------------------------
# transcript variants: Keccak-256 + Poseidon (transcript/keccak.py, poseidon.py)
# ---------------------------------------------------------------------------

def test_keccak256_known_vectors():
    from jolt_tpu.transcript.keccak import keccak256
    assert keccak256(b"").hex() == (
        "c5d2460186f7233c927e7db2dcc703c0e500b653ca82273b7bfad8045d85a470")
    assert keccak256(b"abc").hex() == (
        "4e03657aea45a94fc7d47ba826c8d667c0d1e6e33a64a036ec44f58fa12d6c45")
    # multi-block (> rate 136 bytes)
    import hashlib
    long = bytes(range(256)) * 2
    # self-consistency across chunk boundaries: one-shot == one-shot
    assert keccak256(long) == keccak256(bytes(long))


def test_keccak_transcript_framing_mirrors_blake2b():
    """The Keccak variant shares every framing rule with the Blake2b
    transcript; only the 32-byte compression differs."""
    from jolt_tpu.transcript.keccak import KeccakTranscript
    a = KeccakTranscript(b"Jolt")
    b = KeccakTranscript(b"Jolt")
    for t in (a, b):
        t.append_u64(b"x", 7)
        t.append_scalars(b"poly", [1, 2, 3])
    assert a.state == b.state
    ca, cb = a.challenge_scalar_optimized(), b.challenge_scalar_optimized()
    assert ca == cb and ca < (1 << 125)
    # differs from the Blake2b transcript on the same inputs
    c = Blake2bTranscript(b"Jolt")
    c.append_u64(b"x", 7)
    c.append_scalars(b"poly", [1, 2, 3])
    assert c.state != a.state


def test_poseidon_permutation_properties():
    from jolt_tpu.transcript.poseidon import (P, poseidon_hash,
                                              poseidon_permutation)
    # determinism + field range + width support
    for t in (3, 4):
        out = poseidon_permutation(list(range(t)))
        assert len(out) == t and all(0 <= x < P for x in out)
        assert out == poseidon_permutation(list(range(t)))
    # permutation (not constant): different inputs, different outputs
    assert poseidon_hash([1, 2]) != poseidon_hash([2, 1])
    assert poseidon_hash([1, 2, 3]) != poseidon_hash([1, 2, 4])


def test_poseidon_transcript_challenges():
    from jolt_tpu.transcript.poseidon import PoseidonTranscript
    a = PoseidonTranscript(b"Jolt")
    b = PoseidonTranscript(b"Jolt")
    for t in (a, b):
        t.append_scalar(b"claim", 42)
    assert a.challenge_scalar() == b.challenge_scalar()
    # absorbing different data diverges
    c = PoseidonTranscript(b"Jolt")
    c.append_scalar(b"claim", 43)
    assert c.challenge_scalar() != b.challenge_scalar()
