"""Instruction lookup tables as multilinear extensions.

Foundation of the instruction-execution Shout argument (L9; reference:
`crates/jolt-lookup-tables/src/tables/`, `interleave.rs`).

A table is a function over the 2*XLEN-bit lookup index (the two operands'
bits interleaved, x even positions / y odd); its MLE has a structured
closed form the verifier evaluates in O(XLEN) field ops -- no 2^128 table
is ever materialized.  Conventions:

  * indexes are `interleave_bits(x, y)`; bit 2i is x_i, bit 2i+1 is y_i
    (LSB first), matching `interleave.rs`.
  * `entry(x, y)` gives the u64 output on integer operands (the oracle).
  * `mle(rx, ry)` evaluates the multilinear extension at field points,
    rx/ry being the per-bit values LSB-FIRST (lists of length XLEN).

Equivalence `mle(bits) == entry` on boolean points is the test gate
(the reference's `materialize_entry_test!`).
"""

from __future__ import annotations

from typing import Callable, Dict, List

from ..field.params import FR

P = FR.modulus
XLEN = 64


def interleave_bits(x: int, y: int, xlen: int = XLEN) -> int:
    """Lookup index: x bits at even positions, y at odd (interleave.rs)."""
    out = 0
    for i in range(xlen):
        out |= ((x >> i) & 1) << (2 * i)
        out |= ((y >> i) & 1) << (2 * i + 1)
    return out


def uninterleave_bits(idx: int, xlen: int = XLEN):
    x = y = 0
    for i in range(xlen):
        x |= ((idx >> (2 * i)) & 1) << i
        y |= ((idx >> (2 * i + 1)) & 1) << i
    return x, y


def _bits(v: int, n: int) -> List[int]:
    return [(v >> i) & 1 for i in range(n)]


# ---------------------------------------------------------------------------
# closed-form MLEs (rx, ry LSB-first lists of field values)
# ---------------------------------------------------------------------------

def _eq_prefix_terms(rx, ry, n):
    """eq-chain prefixes from the MSB downward: prefix[i] =
    prod_{j>i} eq(rx_j, ry_j)  (j more significant than i)."""
    pref = [1] * n
    acc = 1
    for i in range(n - 1, -1, -1):
        pref[i] = acc
        eqi = (rx[i] * ry[i] + (1 - rx[i]) * (1 - ry[i])) % P
        acc = acc * eqi % P
    return pref, acc  # acc = full equality product


def mle_and(rx, ry):
    return sum((1 << i) * rx[i] % P * ry[i] for i in range(len(rx))) % P


def mle_or(rx, ry):
    return sum((1 << i) * ((rx[i] + ry[i] - rx[i] * ry[i]) % P)
               for i in range(len(rx))) % P


def mle_xor(rx, ry):
    return sum((1 << i) * ((rx[i] + ry[i] - 2 * rx[i] * ry[i]) % P)
               for i in range(len(rx))) % P


def mle_equal(rx, ry):
    _, acc = _eq_prefix_terms(rx, ry, len(rx))
    return acc


def mle_ltu(rx, ry):
    """Unsigned x < y."""
    n = len(rx)
    pref, _ = _eq_prefix_terms(rx, ry, n)
    return sum(pref[i] * ((1 - rx[i]) % P) % P * ry[i] for i in range(n)) % P


def mle_lts(rx, ry):
    """Signed x < y (two's complement): flip the sign-bit comparison."""
    n = len(rx)
    pref, _ = _eq_prefix_terms(rx, ry, n)
    acc = 0
    for i in range(n - 1):
        acc = (acc + pref[i] * ((1 - rx[i]) % P) % P * ry[i]) % P
    # sign bits: x negative, y non-negative -> x < y
    acc = (acc + pref[n - 1] * rx[n - 1] % P * ((1 - ry[n - 1]) % P)) % P
    return acc


def mle_range_check(rx, ry):
    """Identity on the (non-interleaved) combined operand low bits: the
    ADD/SUB-family table (tables/range_check.rs): output = index mod 2^64.
    Here the 128 index bits are (rx ++ ry) LSB-first; low 64 = rx."""
    return sum((1 << i) * rx[i] for i in range(len(rx))) % P


# ---------------------------------------------------------------------------
# entry oracles (u64 semantics)
# ---------------------------------------------------------------------------

def _s(v, n):
    return v - (1 << n) if v >> (n - 1) else v


M = (1 << XLEN) - 1

TABLES: Dict[str, dict] = {
    "And": {"entry": lambda x, y, n=XLEN: x & y, "mle": mle_and,
            "interleaved": True},
    "Or": {"entry": lambda x, y, n=XLEN: x | y, "mle": mle_or,
           "interleaved": True},
    "Xor": {"entry": lambda x, y, n=XLEN: x ^ y, "mle": mle_xor,
            "interleaved": True},
    "Equal": {"entry": lambda x, y, n=XLEN: int(x == y), "mle": mle_equal,
              "interleaved": True},
    "UnsignedLessThan": {"entry": lambda x, y, n=XLEN: int(x < y),
                         "mle": mle_ltu, "interleaved": True},
    "SignedLessThan": {"entry": lambda x, y, n=XLEN: int(_s(x, n) < _s(y, n)),
                       "mle": mle_lts, "interleaved": True},
    "RangeCheck": {"entry": lambda x, y, n=XLEN: x,  # low word of the index
                   "mle": mle_range_check, "interleaved": False},
}


def table_entry(name: str, x: int, y: int, xlen: int = XLEN) -> int:
    return TABLES[name]["entry"](x, y, xlen)


def table_mle(name: str, rx: List[int], ry: List[int]) -> int:
    return TABLES[name]["mle"](rx, ry)
