"""Host-side BN254 arithmetic over Python ints (ground truth + cold paths).

G1: y^2 = x^3 + 3 over Fq.  G2: y^2 = x^3 + 3/(9+u) over Fq2.
The host tier serves as the test oracle for the device kernels and will
carry the pairing (Dory tier-2) -- pairings are few and host-side per
SURVEY.md §7 hard-part 5.
"""

from __future__ import annotations

from typing import Optional, Tuple

from ..field.params import FQ_MODULUS, FR_MODULUS

Q = FQ_MODULUS
R = FR_MODULUS

# Generator of G1 (ark_bn254: (1, 2))
G1_GEN = (1, 2)

Point = Optional[Tuple[int, int]]  # None = infinity


def g1_is_on_curve(p: Point) -> bool:
    if p is None:
        return True
    x, y = p
    return (y * y - x * x * x - 3) % Q == 0


def g1_neg(p: Point) -> Point:
    if p is None:
        return None
    return (p[0], (-p[1]) % Q)


def g1_add(p: Point, q: Point) -> Point:
    if p is None:
        return q
    if q is None:
        return p
    x1, y1 = p
    x2, y2 = q
    if x1 == x2:
        if (y1 + y2) % Q == 0:
            return None
        lam = (3 * x1 * x1) * pow(2 * y1, -1, Q) % Q
    else:
        lam = (y2 - y1) * pow(x2 - x1, -1, Q) % Q
    x3 = (lam * lam - x1 - x2) % Q
    y3 = (lam * (x1 - x3) - y1) % Q
    return (x3, y3)


def g1_double(p: Point) -> Point:
    return g1_add(p, p)


def g1_mul(p: Point, k: int) -> Point:
    k %= R
    acc: Point = None
    add = p
    while k:
        if k & 1:
            acc = g1_add(acc, add)
        add = g1_double(add)
        k >>= 1
    return acc


def g1_random(rng) -> Point:
    """Random G1 point: random scalar times the generator."""
    return g1_mul(G1_GEN, rng.randrange(1, R))


def g1_msm(points, scalars) -> Point:
    acc: Point = None
    for p, s in zip(points, scalars):
        acc = g1_add(acc, g1_mul(p, s))
    return acc
