"""Lookup-table closed forms + prefix-suffix decomposition gates.

The reference's own methodology: `materialize_entry_test!` (MLE == entry on
boolean points) plus a decomposition gate checking
Val(pre || suf) == sum coef * P(pre) * S(suf) at every pair-aligned cut,
including cuts evaluated at random FIELD points on the prefix side (the
exact situation of the address-round sumcheck messages).
"""
import random

import pytest

from jolt_tpu.field.params import FR
from jolt_tpu.lookups.tables import (LOG_K, PREFIXES, TABLES, XLEN,
                                     evaluate_table_mle, fold_prefixes,
                                     interleave_bits, suffix_values,
                                     table_entry, table_value_from_parts,
                                     uninterleave_bits)

P = FR.modulus


def _point_from_index(idx: int):
    """128-bit index -> big-endian boolean point (var 0 = bit 127)."""
    return [(idx >> (LOG_K - 1 - v)) & 1 for v in range(LOG_K)]


def test_interleave_roundtrip():
    rng = random.Random(1)
    for _ in range(50):
        x, y = rng.randrange(1 << 64), rng.randrange(1 << 64)
        assert uninterleave_bits(interleave_bits(x, y)) == (x, y)
    # reference convention (interleave.rs tests): x bit 0 -> index bit 1
    assert interleave_bits(1, 0) == 0b10
    assert interleave_bits(0, 1) == 0b01


@pytest.mark.parametrize("name", list(TABLES))
def test_mle_matches_entry_on_booleans(name):
    rng = random.Random(hash(name) & 0xFFFF)
    idxs = [0, 1, (1 << 128) - 1, 1 << 127, (1 << 64) - 1, 1 << 64]
    idxs += [rng.randrange(1 << 128) for _ in range(40)]
    idxs += [interleave_bits(rng.randrange(1 << 64), rng.randrange(1 << 64))
             for _ in range(10)]
    for idx in idxs:
        got = evaluate_table_mle(name, _point_from_index(idx))
        want = table_entry(name, idx) % P
        assert got == want, f"{name}(idx={idx:#x})"


@pytest.mark.parametrize("name", list(TABLES))
def test_prefix_suffix_decomposition(name):
    """Val(pre||suf) == sum coef*P(pre)*S(suf) with random field prefixes,
    at every pair-aligned cut; checked against the full-fold closed form
    extended multilinearly (prefix vars random, suffix boolean)."""
    rng = random.Random(hash(name) & 0xFFFF ^ 99)
    pre_names = sorted({p for _, p, _ in TABLES[name]["terms"]})
    for cut_pairs in (1, 4, 32, 60, 64):
        cut = 2 * cut_pairs              # prefix var count
        L = LOG_K - cut                  # suffix bit count
        pre_point = [rng.randrange(P) for _ in range(cut)]
        s = rng.randrange(1 << L)
        # decomposition value
        states = fold_prefixes(pre_point, pre_names)
        pvals = {n: PREFIXES[n].value(st) for n, st in states.items()}
        svals = suffix_values(s, L)
        got = table_value_from_parts(name, pvals, svals)
        # oracle: full MLE at (pre_point ++ bits(s))
        suf_bits = [(s >> (L - 1 - i)) & 1 for i in range(L)]
        want = evaluate_table_mle(name, pre_point + suf_bits)
        assert got == want, f"{name} cut={cut_pairs} pairs"


def test_suffix_vec_matches_scalar_oracle():
    """Vectorized suffix evaluation (lookups/suffix_vec.py, the stage-5
    device on-ramp) == scalar SUFFIXES closed forms, every family, every
    phase suffix length."""
    import numpy as np

    from jolt_tpu.lookups.suffix_vec import eval_suffix
    from jolt_tpu.lookups.tables import SUFFIXES

    rng = random.Random(42)
    for L in (0, 8, 16, 48, 64, 80, 120):
        half = L // 2
        n = 64
        ss = [rng.randrange(1 << L) if L else 0 for _ in range(n)]
        xs_l, ys_l = zip(*(uninterleave_bits(s, half) for s in ss))
        xs = np.array(xs_l, dtype=np.uint64)
        ys = np.array(ys_l, dtype=np.uint64)
        s_lo = np.array([s & ((1 << 64) - 1) for s in ss], dtype=np.uint64)
        s_hi = np.array([s >> 64 for s in ss], dtype=np.uint64)
        for name, fn in SUFFIXES.items():
            lo, hi = eval_suffix(name, xs, ys, s_lo, s_hi, L)
            got = [(int(h) << 64) | int(l) for l, h in zip(lo, hi)]
            want = [fn(x, y, s, L) for x, y, s in zip(xs_l, ys_l, ss)]
            assert got == want, f"suffix {name} at L={L}"


@pytest.mark.parametrize("name", list(TABLES))
def test_incremental_fold_matches_onepass(name):
    """Checkpointing: folding pairs incrementally across phase boundaries
    equals one full fold (the address-round checkpoint mechanism)."""
    rng = random.Random(hash(name) & 0xFFFF ^ 7)
    point = [rng.randrange(P) for _ in range(LOG_K)]
    pre_names = sorted({p for _, p, _ in TABLES[name]["terms"]})
    full = fold_prefixes(point, pre_names)
    inc = None
    t_start = XLEN - 1
    for chunk_start in range(0, LOG_K, 8):
        inc = fold_prefixes(point[chunk_start:chunk_start + 8], pre_names,
                            states=inc, t_start=t_start)
        t_start -= 4
    for n in pre_names:
        assert PREFIXES[n].value(full[n]) == PREFIXES[n].value(inc[n]), n
