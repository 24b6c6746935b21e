"""HyperKZG multilinear PCS (Gemini fold over univariate KZG).

Reference: `crates/jolt-hyperkzg/src/lib.rs:10-21` -- "commit = MSM vs SRS;
open = l-1 folds + batch KZG at {r, -r, r^2}".

Scheme:
  * commit(P): treat the 2^l MLE evaluations as univariate coefficients;
    C = sum_i P[i] * tau^i * G1  (device MSM).
  * open(P, point, v): fold the coefficient vector binding the LSB variable
    to u_i = point[l-1-i] each step: f_{i+1} = (1-u_i)*even(f_i) +
    u_i*odd(f_i); commit each intermediate fold; draw r; send evals of every
    f_i at {r, -r, r^2}; batch all (poly, point, eval) KZG openings with
    challenge powers into 3 quotient witnesses; verify with 2 pairings.

The trusted setup here generates the SRS from an in-process tau --
STRUCTURALLY complete but NOT a secure ceremony; the production path is
Dory (transparent), which replaces this scheme without touching callers.
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..field.params import FR
from ..curve import bn254_host as host
from ..curve import g1 as g1dev
from ..curve.pairing import (G2_GEN, G2Point, g2_mul, g2_neg,
                             pairing_product_is_one)
from ..transcript import Blake2bTranscript

P = FR.modulus


@dataclasses.dataclass
class KZGSetup:
    g1_powers: Optional[List[host.Point]]  # host affine (lazy; tests only)
    g1_powers_dev: tuple               # device Jacobian batch for MSM
    tau_g2: G2Point                    # [tau] G2

    @property
    def size(self) -> int:
        return self.g1_powers_dev[0].shape[-1]

    def host_powers(self) -> List[host.Point]:
        if self.g1_powers is None:
            self.g1_powers = g1dev.unpack_points(self.g1_powers_dev)
        return self.g1_powers

    @classmethod
    def generate(cls, max_len: int, tau: int = None,
                 cache_dir: str = "/root/repo/.srs_cache") -> "KZGSetup":
        """Toy ceremony: derives tau in-process (INSECURE; test/dev tier).

        Device-batched ([tau^i]G1 via one batched scalar-mul) and disk-cached
        per size -- the reference caches its Dory URS the same way
        (`~/.cache/dory`, urs_lock.rs)."""
        import os
        tau = tau if tau is not None else 0x1234567890ABCDEF1122334455667788
        cache = os.path.join(cache_dir, f"kzg_{max_len}_{tau % 997_651}.npz")
        if os.path.exists(cache):
            data = np.load(cache)
            powers_dev = tuple(jnp.asarray(data[k]) for k in ("x", "y", "z"))
            return cls(g1_powers=None, g1_powers_dev=powers_dev,
                       tau_g2=g2_mul(G2_GEN, tau))
        scalars = []
        acc = 1
        for _ in range(max_len):
            scalars.append(acc)
            acc = acc * tau % P
        base = g1dev.pack_points([host.G1_GEN] * max_len)
        powers_dev = g1dev.batch_scalar_mul(base, _scalars_to_words(scalars), 254)
        powers_dev = jax.block_until_ready(powers_dev)
        os.makedirs(cache_dir, exist_ok=True)
        np.savez(cache, x=np.asarray(powers_dev[0]),
                 y=np.asarray(powers_dev[1]), z=np.asarray(powers_dev[2]))
        # keep the SRS in device Jacobian form (tree_sum/MSM accept Jacobian
        # inputs); host affine copies are derived lazily for tests only.
        return cls(g1_powers=None, g1_powers_dev=powers_dev,
                   tau_g2=g2_mul(G2_GEN, tau))


@dataclasses.dataclass
class HyperKZGProof:
    fold_commitments: List[host.Point]          # commitments to f_1..f_{l-1}
    evals: List[List[int]]                      # per f_i: [f_i(r), f_i(-r), f_i(r^2)]
    witnesses: List[host.Point]                 # KZG quotients for {r, -r, r^2}


def _scalars_to_words(scalars: Sequence[int]) -> jnp.ndarray:
    arr = np.zeros((8, len(scalars)), dtype=np.uint32)
    for i, s in enumerate(scalars):
        s = int(s) % P
        for w in range(8):
            arr[w, i] = (s >> (32 * w)) & 0xFFFFFFFF
    return jnp.asarray(arr)


def _uni_eval(coeffs: Sequence[int], z: int) -> int:
    acc = 0
    for c in reversed(coeffs):
        acc = (acc * z + c) % P
    return acc


def _kzg_quotient(coeffs: Sequence[int], z: int) -> List[int]:
    """w(X) = (f(X) - f(z)) / (X - z) by synthetic division:
    w_{n-2} = f_{n-1};  w_{i-1} = f_i + z*w_i."""
    n = len(coeffs)
    if n <= 1:
        return [0]
    w = [0] * (n - 1)
    w[n - 2] = coeffs[n - 1] % P
    for i in range(n - 2, 0, -1):
        w[i - 1] = (coeffs[i] + z * w[i]) % P
    return w


def _absorb_point(transcript: Blake2bTranscript, label: bytes,
                  p: host.Point) -> None:
    """Absorb full affine coordinates (Fq values; 64 bytes, BE)."""
    if p is None:
        transcript.append_bytes(label, b"\x00" * 64)
    else:
        transcript.append_bytes(
            label, p[0].to_bytes(32, "big") + p[1].to_bytes(32, "big"))


class HyperKZG:
    def __init__(self, setup: KZGSetup):
        self.setup = setup

    # ---- commit --------------------------------------------------------

    def commit_ints(self, coeffs: Sequence[int], bits: int = 254) -> host.Point:
        """MSM of the coefficient vector against the SRS (device).

        `bits` enables the pay-per-bit small-scalar path (msm/mod.rs:16-80):
        b-bit coefficients cost ~b/254 of a full-width MSM.

        Coefficients are always zero-padded to the full SRS length: the
        commitment is unchanged (zero scalars contribute nothing) but every
        commit shares ONE compiled MSM shape per scalar-width class --
        per-length graphs cost 100s+ of XLA compile each.

        On the CPU backend (test tier) the MSM runs as host Pippenger with
        zero-skip instead: XLA:CPU compiles of the wide MSM graphs cost
        minutes per shape, while sparse test vectors (one-hot columns) have
        nnz ~ T << N and cost microseconds per point on the host."""
        n = self.setup.size
        assert len(coeffs) <= n, "poly larger than SRS"
        if jax.default_backend() == "cpu":
            return host.g1_msm_pippenger(
                self.setup.host_powers()[:len(coeffs)], coeffs)
        if len(coeffs) < n:
            coeffs = list(coeffs) + [0] * (n - len(coeffs))
        pts = self.setup.g1_powers_dev
        acc = g1dev.msm(pts, _scalars_to_words(coeffs), bits)
        return g1dev.unpack_points(acc)[0]

    # ---- open ----------------------------------------------------------

    def open(self, coeffs: Sequence[int], point: Sequence[int], value: int,
             transcript: Blake2bTranscript) -> HyperKZGProof:
        ell = len(point)
        assert len(coeffs) == 1 << ell
        us = [point[ell - 1 - i] for i in range(ell)]  # LSB-first binding

        polys = [list(coeffs)]
        for u in us[:-1]:
            f = polys[-1]
            nxt = [((1 - u) * f[2 * j] + u * f[2 * j + 1]) % P
                   for j in range(len(f) // 2)]
            polys.append(nxt)
        # final fold sanity: one more bind yields the claimed value
        f = polys[-1]
        u = us[-1]
        assert ((1 - u) * f[0] + u * f[1]) % P == value % P, "bad opening value"

        # zero-pad every fold to the full length: identical commitments
        # (zero coefficients add nothing) but ONE compiled MSM shape for
        # all folds instead of log N distinct Pippenger compilations
        full = len(coeffs)
        fold_commitments = [
            self.commit_ints(fp + [0] * (full - len(fp))) for fp in polys[1:]]
        for cpt in fold_commitments:
            _absorb_point(transcript, b"hkzg_fold", cpt)
        r = transcript.challenge_scalar()

        points3 = [r, (-r) % P, r * r % P]
        evals = [[_uni_eval(fp, z) for z in points3] for fp in polys]
        for ev in evals:
            transcript.append_scalars(b"hkzg_evals", ev)

        # batch the per-point openings: B = sum_i q^i f_i opened at each z
        q = transcript.challenge_scalar()
        batched = [0] * len(coeffs)
        qp = 1
        for fp in polys:
            for j, c in enumerate(fp):
                batched[j] = (batched[j] + qp * c) % P
            qp = qp * q % P
        witnesses = [self.commit_ints(q + [0] * (full - len(q)))
                     for q in (_kzg_quotient(batched, z) for z in points3)]
        for w in witnesses:
            _absorb_point(transcript, b"hkzg_witness", w)
        return HyperKZGProof(fold_commitments, evals, witnesses)

    # ---- verify --------------------------------------------------------

    def verify(self, commitment: host.Point, point: Sequence[int], value: int,
               proof: HyperKZGProof, transcript: Blake2bTranscript) -> bool:
        ell = len(point)
        us = [point[ell - 1 - i] for i in range(ell)]
        # shape checks: a proof missing witnesses/evals would silently skip
        # pairing terms and leave the -r / r^2 evals commitment-unbound
        if len(proof.fold_commitments) != ell - 1 or len(proof.evals) != ell:
            return False
        if len(proof.witnesses) != 3 or any(len(ev) != 3 for ev in proof.evals):
            return False
        # prover-supplied group elements must be on-curve (None = identity)
        for pt in ([commitment] + list(proof.fold_commitments)
                   + list(proof.witnesses)):
            if pt is not None and not host.g1_is_on_curve(pt):
                return False

        for cpt in proof.fold_commitments:
            _absorb_point(transcript, b"hkzg_fold", cpt)
        r = transcript.challenge_scalar()
        points3 = [r, (-r) % P, r * r % P]

        two_inv = pow(2, -1, P)
        rinv2 = pow(2 * r, -1, P)
        # fold-consistency: f_{i+1}(r^2) = (1-u)(f_i(r)+f_i(-r))/2
        #                                + u (f_i(r)-f_i(-r))/(2r)
        for i in range(ell):
            fr, fmr, fr2 = proof.evals[i]
            nxt = ((1 - us[i]) * (fr + fmr) % P * two_inv
                   + us[i] * (fr - fmr) % P * rinv2) % P
            if i + 1 < ell:
                if nxt != proof.evals[i + 1][2]:
                    return False
            else:
                if nxt != value % P:
                    return False
        for ev in proof.evals:
            transcript.append_scalars(b"hkzg_evals", ev)

        q = transcript.challenge_scalar()
        for w in proof.witnesses:
            _absorb_point(transcript, b"hkzg_witness", w)

        # batched commitment B = sum q^i C_i and batched evals at each z
        commitments = [commitment] + list(proof.fold_commitments)
        B: host.Point = None
        qp = 1
        b_evals = [0, 0, 0]
        for C, ev in zip(commitments, proof.evals):
            B = host.g1_add(B, host.g1_mul(C, qp))
            for t in range(3):
                b_evals[t] = (b_evals[t] + qp * ev[t]) % P
            qp = qp * q % P

        # combined KZG check with challenge d (2 pairings):
        # e( sum d^j (B - y_j G + z_j W_j), G2 ) * e( -sum d^j W_j, tau G2 ) = 1
        d = transcript.challenge_scalar()
        left: host.Point = None
        wsum: host.Point = None
        dp = 1
        for (z, y, W) in zip(points3, b_evals, proof.witnesses):
            term = host.g1_add(B, host.g1_neg(host.g1_mul(host.G1_GEN, y)))
            term = host.g1_add(term, host.g1_mul(W, z))
            left = host.g1_add(left, host.g1_mul(term, dp))
            wsum = host.g1_add(wsum, host.g1_mul(W, dp))
            dp = dp * d % P
        return pairing_product_is_one([
            (left, G2_GEN),
            (host.g1_neg(wsum), self.setup.tau_g2),
        ])
