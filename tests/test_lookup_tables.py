"""Lookup-table MLE closed forms vs naive interpolation (the reference's
materialize_entry_test pattern at harness scale)."""
import random

import pytest

from jolt_tpu.field.params import FR
from jolt_tpu.lookups.tables import (TABLES, interleave_bits, table_entry,
                                     table_mle, uninterleave_bits, _bits)

P = FR.modulus


def test_interleave_roundtrip():
    rng = random.Random(1)
    for _ in range(50):
        x, y = rng.randrange(1 << 64), rng.randrange(1 << 64)
        assert uninterleave_bits(interleave_bits(x, y)) == (x, y)
    assert interleave_bits(0b11, 0b00, 2) == 0b0101
    assert interleave_bits(0b00, 0b11, 2) == 0b1010


@pytest.mark.parametrize("name", list(TABLES))
def test_mle_matches_entry_on_booleans(name):
    xlen = 4
    for x in range(1 << xlen):
        for y in range(1 << xlen):
            got = table_mle(name, _bits(x, xlen), _bits(y, xlen))
            want = table_entry(name, x, y, xlen) % P
            assert got == want, f"{name}({x},{y})"


@pytest.mark.parametrize("name", list(TABLES))
def test_mle_matches_naive_extension(name):
    """Closed form == sum_{x,y} eq((x,y), r) * entry(x,y) at random points."""
    xlen = 3
    rng = random.Random(7)
    rx = [rng.randrange(P) for _ in range(xlen)]
    ry = [rng.randrange(P) for _ in range(xlen)]
    naive = 0
    for x in range(1 << xlen):
        for y in range(1 << xlen):
            w = 1
            for i in range(xlen):
                xb, yb = (x >> i) & 1, (y >> i) & 1
                w = w * ((rx[i] if xb else (1 - rx[i])) % P) % P
                w = w * ((ry[i] if yb else (1 - ry[i])) % P) % P
            naive = (naive + w * table_entry(name, x, y, xlen)) % P
    assert table_mle(name, rx, ry) == naive, name
