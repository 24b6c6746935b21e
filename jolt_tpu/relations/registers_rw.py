"""Twist registers read/write checking + Val-evaluation sumchecks.

Reference relations:
  * `zkvm/registers/read_write_checking.rs:51-68`:
      sum_{k,j} eq(r_cycle, j) * [ wa(k,j)*(inc(j)+Val(k,j))
          + gamma*ra1(k,j)*Val(k,j) + gamma^2*ra2(k,j)*Val(k,j) ]
      = rd_wv_claim + gamma*rs1_rv_claim + gamma^2*rs2_rv_claim
  * `zkvm/registers/val_evaluation.rs`:
      Val(r_addr, r_cyc) = sum_{k,j} eq(r_addr, k) * LT(j, r_cyc)
                              * wa(k,j) * inc(j)
    (a register's value is the sum of all earlier increments -- Twist's
    prefix-sum identity).

Cycle-major layout (index = j*K + k): HighToLow binding runs the cycle
phase first, then the LOG_K address rounds, matching the reference's
ReadWriteConfig phase split.  Round-1 tier: dense (K*T) MLEs; the sparse
read-write-matrix kernels (`subprotocols/read_write_matrix/`) are the
scaling upgrade.
"""

from __future__ import annotations

from functools import partial
from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp

from ..field import FR, ops
from ..poly import dense, eq, lt
from ..poly.univariate import UniPoly
from ..sumcheck.engine import OpeningAccumulator, SumcheckInstance
from ..witness.registers import K, LOG_K, RegisterWitness

P = FR.modulus


@partial(jax.jit, static_argnames=('fp',))
def _rw_message_kernel(E, WA, RA1, RA2, VAL, INC, g1, g2, fp=FR):
    """Evals at X in {0,2,3} of
    sum E*(WA*(INC+VAL) + g1*RA1*VAL + g2*RA2*VAL).  (L, 3, 1)."""
    e = dense.sumcheck_eval_points_high(E, 3, fp)
    wa = dense.sumcheck_eval_points_high(WA, 3, fp)
    ra1 = dense.sumcheck_eval_points_high(RA1, 3, fp)
    ra2 = dense.sumcheck_eval_points_high(RA2, 3, fp)
    val = dense.sumcheck_eval_points_high(VAL, 3, fp)
    inc = dense.sumcheck_eval_points_high(INC, 3, fp)
    reads = ops.add(ops.mont_mul(g1[:, None], ra1, fp),
                    ops.mont_mul(g2[:, None], ra2, fp), fp)
    summand = ops.add(ops.mont_mul(wa, ops.add(inc, val, fp), fp),
                      ops.mont_mul(reads, val, fp), fp)
    return ops.sum_mod(ops.mont_mul(e, summand, fp), fp)


@partial(jax.jit, static_argnames=('fp',))
def _bind6(E, WA, RA1, RA2, VAL, INC, r, fp=FR):
    b = partial(dense.bind_high, fp=fp)
    return (b(E, r), b(WA, r), b(RA1, r), b(RA2, r), b(VAL, r), b(INC, r))


@partial(jax.jit, static_argnames=('fp',))
def _val_message_kernel(EL, WA, INC, fp=FR):
    """Evals at {0,2,3} of sum EL * WA * INC (EL = eq(r_addr)*LT table)."""
    el = dense.sumcheck_eval_points_high(EL, 3, fp)
    wa = dense.sumcheck_eval_points_high(WA, 3, fp)
    inc = dense.sumcheck_eval_points_high(INC, 3, fp)
    return ops.sum_mod(ops.mont_mul(el, ops.mont_mul(wa, inc, fp), fp), fp)


@partial(jax.jit, static_argnames=('fp',))
def _bind3(EL, WA, INC, r, fp=FR):
    b = partial(dense.bind_high, fp=fp)
    return (b(EL, r), b(WA, r), b(INC, r))


def _broadcast_cycle_col(col_dev: jnp.ndarray, T: int) -> jnp.ndarray:
    """(L, T) cycle MLE -> (L, T*K) cycle-major broadcast over k."""
    L = col_dev.shape[0]
    return jnp.broadcast_to(col_dev[:, :, None], (L, T, K)).reshape(L, T * K)


class RegistersReadWriteChecking(SumcheckInstance):
    """Prover instance.  gamma drawn by the stage driver; r_cycle and the
    three input claims come from the accumulator (stage-1 openings)."""

    def __init__(self, wit: RegisterWitness, gamma: int,
                 r_cycle: Sequence[int], claims: Sequence[int]):
        self.T = wit.T
        self.log_T = self.T.bit_length() - 1
        self.gamma = gamma
        self.r_cycle = list(r_cycle)
        self.claims = list(claims)  # [rd_wv, rs1_rv, rs2_rv]
        g2 = gamma * gamma % P

        self.WA = ops.pack_ints(wit.wa)
        self.RA1 = ops.pack_ints(wit.ra1)
        self.RA2 = ops.pack_ints(wit.ra2)
        self.VAL = ops.pack_ints(wit.val)
        inc_cycle = ops.pack_ints(wit.inc)
        self.INC = _broadcast_cycle_col(inc_cycle, self.T)
        E_cycle = eq.evals(self.r_cycle)
        self.E = _broadcast_cycle_col(E_cycle, self.T)
        self.g1_dev = ops.pack_ints([gamma])
        self.g2_dev = ops.pack_ints([g2])
        self.final_openings: Optional[dict] = None

    @property
    def num_rounds(self) -> int:
        return self.log_T + LOG_K

    def input_claim(self, accumulator: OpeningAccumulator) -> int:
        rd, rs1, rs2 = self.claims
        return (rd + self.gamma * rs1 + self.gamma * self.gamma % P * rs2) % P

    def compute_message(self, round: int, previous_claim: int) -> UniPoly:
        evals = ops.unpack_ints(_rw_message_kernel(
            self.E, self.WA, self.RA1, self.RA2, self.VAL, self.INC,
            self.g1_dev, self.g2_dev))
        return UniPoly.from_evals_and_hint(previous_claim, evals, P)

    def ingest_challenge(self, r: int, round: int) -> None:
        r_dev = ops.pack_ints([r])
        (self.E, self.WA, self.RA1, self.RA2, self.VAL, self.INC) = _bind6(
            self.E, self.WA, self.RA1, self.RA2, self.VAL, self.INC, r_dev)

    def finalize(self) -> None:
        self.final_openings = {
            name: ops.unpack_ints(arr)[0]
            for name, arr in [("wa", self.WA), ("ra1", self.RA1),
                              ("ra2", self.RA2), ("val", self.VAL),
                              ("inc", self.INC)]
        }

    def cache_openings(self, accumulator: OpeningAccumulator,
                       r_slice: Sequence[int]) -> None:
        r_cyc = list(r_slice[:self.log_T])
        r_addr = list(r_slice[self.log_T:])
        for name in ("wa", "ra1", "ra2", "val"):
            accumulator.insert(("registers", name), r_cyc + r_addr,
                               self.final_openings[name])
        accumulator.insert(("registers", "inc"), r_cyc,
                           self.final_openings["inc"])

    def expected_output_claim(self, accumulator, r):  # pragma: no cover
        raise NotImplementedError


class RegistersReadWriteCheckingVerifier(SumcheckInstance):
    def __init__(self, log_T: int, gamma: int, r_cycle: Sequence[int],
                 claims: Sequence[int], openings: dict):
        self.log_T = log_T
        self.gamma = gamma
        self.r_cycle = list(r_cycle)
        self.claims = list(claims)
        self.openings = openings

    @property
    def num_rounds(self) -> int:
        return self.log_T + LOG_K

    def input_claim(self, accumulator: OpeningAccumulator) -> int:
        rd, rs1, rs2 = self.claims
        return (rd + self.gamma * rs1 + self.gamma * self.gamma % P * rs2) % P

    def compute_message(self, round, prev):  # pragma: no cover
        raise NotImplementedError("verifier instance")

    def ingest_challenge(self, r, round):  # pragma: no cover
        raise NotImplementedError("verifier instance")

    def expected_output_claim(self, accumulator: OpeningAccumulator,
                              r: Sequence[int]) -> int:
        r_cyc = list(r[:self.log_T])
        o = self.openings
        g, g2 = self.gamma, self.gamma * self.gamma % P
        eq_c = eq.eq_int(self.r_cycle, r_cyc)
        inner = (o["wa"] * ((o["inc"] + o["val"]) % P)
                 + g * o["ra1"] % P * o["val"]
                 + g2 * o["ra2"] % P * o["val"]) % P
        return eq_c * inner % P


class RegistersValEvaluation(SumcheckInstance):
    """Proves the Val opening from RW checking via the LT prefix identity."""

    def __init__(self, wit: RegisterWitness, r_addr: Sequence[int],
                 r_cyc: Sequence[int], val_claim: int):
        self.T = wit.T
        self.log_T = self.T.bit_length() - 1
        self.val_claim = val_claim
        # EL(j, k) = LT(j, r_cyc) * eq(r_addr, k), cycle-major
        LT_cycle = lt.evals(list(r_cyc))
        EQ_addr = eq.evals(list(r_addr))
        L = LT_cycle.shape[0]
        EL = ops.mont_mul(LT_cycle[:, :, None], EQ_addr[:, None, :], FR)
        self.EL = EL.reshape(L, self.T * K)
        self.WA = ops.pack_ints(wit.wa)
        inc_cycle = ops.pack_ints(wit.inc)
        self.INC = _broadcast_cycle_col(inc_cycle, self.T)
        self.final_openings: Optional[dict] = None

    @property
    def num_rounds(self) -> int:
        return self.log_T + LOG_K

    def input_claim(self, accumulator: OpeningAccumulator) -> int:
        return self.val_claim

    def compute_message(self, round: int, previous_claim: int) -> UniPoly:
        evals = ops.unpack_ints(_val_message_kernel(self.EL, self.WA, self.INC))
        return UniPoly.from_evals_and_hint(previous_claim, evals, P)

    def ingest_challenge(self, r: int, round: int) -> None:
        r_dev = ops.pack_ints([r])
        self.EL, self.WA, self.INC = _bind3(self.EL, self.WA, self.INC, r_dev)

    def finalize(self) -> None:
        self.final_openings = {
            "wa": ops.unpack_ints(self.WA)[0],
            "inc": ops.unpack_ints(self.INC)[0],
        }

    def cache_openings(self, accumulator: OpeningAccumulator,
                       r_slice: Sequence[int]) -> None:
        r_cyc = list(r_slice[:self.log_T])
        accumulator.insert(("registers_val_eval", "wa"), list(r_slice),
                           self.final_openings["wa"])
        accumulator.insert(("registers_val_eval", "inc"), r_cyc,
                           self.final_openings["inc"])

    def expected_output_claim(self, accumulator, r):  # pragma: no cover
        raise NotImplementedError


class RegistersValEvaluationVerifier(SumcheckInstance):
    def __init__(self, log_T: int, r_addr: Sequence[int],
                 r_cyc: Sequence[int], val_claim: int, openings: dict):
        self.log_T = log_T
        self.r_addr = list(r_addr)
        self.r_cyc = list(r_cyc)
        self.val_claim = val_claim
        self.openings = openings

    @property
    def num_rounds(self) -> int:
        return self.log_T + LOG_K

    def input_claim(self, accumulator: OpeningAccumulator) -> int:
        return self.val_claim

    def compute_message(self, round, prev):  # pragma: no cover
        raise NotImplementedError("verifier instance")

    def ingest_challenge(self, r, round):  # pragma: no cover
        raise NotImplementedError("verifier instance")

    def expected_output_claim(self, accumulator: OpeningAccumulator,
                              r: Sequence[int]) -> int:
        r_cyc_new = list(r[:self.log_T])
        r_addr_new = list(r[self.log_T:])
        o = self.openings
        lt_eval = lt.lt_point_int(r_cyc_new, self.r_cyc)
        eq_addr = eq.eq_int(self.r_addr, r_addr_new)
        return lt_eval * eq_addr % P * o["wa"] % P * o["inc"] % P


@partial(jax.jit, static_argnames=('fp',))
def _raf_message_kernel(E, M, B, fp=FR):
    e = dense.sumcheck_eval_points_high(E, 3, fp)
    m = dense.sumcheck_eval_points_high(M, 3, fp)
    b = dense.sumcheck_eval_points_high(B, 3, fp)
    return ops.sum_mod(ops.mont_mul(e, ops.mont_mul(m, b, fp), fp), fp)


def index_mle_eval(r_addr) -> int:
    """B(r) for B(k) = k over the register space (big-endian)."""
    n = len(r_addr)
    acc = 0
    for i, rb in enumerate(r_addr):
        acc = (acc + (1 << (n - 1 - i)) * rb) % P
    return acc


class RegistersRaf(SumcheckInstance):
    """Ties a register one-hot matrix to its per-cycle index stream:
    sum_{k,j} eq(r_cycle,j) * M(k,j) * k = index_claim, where the same
    index_claim is proven against the PUBLIC bytecode rd/rs1/rs2 column by
    the bytecode read-raf instance batched alongside (cross-checked claims).
    """

    def __init__(self, onehot, gamma_unused, r_cycle, index_claim, label):
        self.T = len(onehot) // K
        self.log_T = self.T.bit_length() - 1
        self.r_cycle = list(r_cycle)
        self.index_claim = index_claim
        self.label = label
        self.M = ops.pack_ints(onehot)
        import jax.numpy as jnp
        L = FR.num_limbs
        idx_col = ops.pack_ints(list(range(K)))
        self.B = jnp.broadcast_to(idx_col[:, None, :],
                                  (L, self.T, K)).reshape(L, -1)
        E = eq.evals(self.r_cycle)
        self.E = jnp.broadcast_to(E[:, :, None], (L, self.T, K)).reshape(L, -1)
        self.final_openings = None

    @property
    def num_rounds(self) -> int:
        return self.log_T + LOG_K

    def input_claim(self, accumulator: OpeningAccumulator) -> int:
        return self.index_claim % P

    def compute_message(self, round: int, previous_claim: int) -> UniPoly:
        evals = ops.unpack_ints(_raf_message_kernel(self.E, self.M, self.B))
        return UniPoly.from_evals_and_hint(previous_claim, evals, P)

    def ingest_challenge(self, r: int, round: int) -> None:
        r_dev = ops.pack_ints([r])
        b = partial(dense.bind_high, fp=FR)
        self.E, self.M, self.B = (b(self.E, r_dev), b(self.M, r_dev),
                                  b(self.B, r_dev))

    def finalize(self) -> None:
        self.final_openings = {"m": ops.unpack_ints(self.M)[0]}

    def cache_openings(self, accumulator: OpeningAccumulator,
                       r_slice) -> None:
        accumulator.insert(("registers_raf", self.label), list(r_slice),
                           self.final_openings["m"])

    def expected_output_claim(self, accumulator, r):  # pragma: no cover
        raise NotImplementedError


class RegistersRafVerifier(SumcheckInstance):
    def __init__(self, log_T: int, r_cycle, index_claim: int, m_opening: int):
        self.log_T = log_T
        self.r_cycle = list(r_cycle)
        self.index_claim = index_claim
        self.m_opening = m_opening

    @property
    def num_rounds(self) -> int:
        return self.log_T + LOG_K

    def input_claim(self, accumulator: OpeningAccumulator) -> int:
        return self.index_claim % P

    def compute_message(self, round, prev):  # pragma: no cover
        raise NotImplementedError("verifier instance")

    def ingest_challenge(self, r, round):  # pragma: no cover
        raise NotImplementedError("verifier instance")

    def expected_output_claim(self, accumulator: OpeningAccumulator, r) -> int:
        r_cyc = list(r[:self.log_T])
        r_addr = list(r[self.log_T:])
        return (eq.eq_int(self.r_cycle, r_cyc) * self.m_opening % P
                * index_mle_eval(r_addr) % P)
