"""Twist RAM relations: read/write checking, raf evaluation, Val evaluation.

Reference relations (`zkvm/ram/{read_write_checking,raf_evaluation,
val_check}.rs`), adapted to the round-1 dense engine:

  * RW checking:
      sum_{k,j} eq(r_cycle,j) * ra(k,j) * [ Val(k,j)
          + gamma*(Val(k,j) + inc(j)) ]  =  rv_claim + gamma*wv_claim
    (a load's read value and a store's write value in one batched claim;
    ra == wa since RAM has one access port per cycle).
  * raf evaluation:
      sum_{k,j} eq(r_cycle,j) * ra(k,j) * A(k) = ram_address_claim,
    where A(k) = witness_base + 8(k-1) for k>=1, A(0)=0 -- a PUBLIC affine
    MLE the verifier evaluates in closed form:
      A(r) = 8*sum_i 2^i r_i + (wb-8)*(1 - prod_i (1-r_i)).
  * Val evaluation:
      Val(r) - Val_init(r_addr) = sum_{k,j} eq(r_addr,k) * LT(j,r_cyc)
                                     * ra(k,j) * inc(j),
    with Val_init evaluated by the verifier from the PUBLIC sparse initial
    image (inputs + program-image cells).

Cycle-major layout (j*K + k), HighToLow binding: cycle phase then address
phase.  Missing (round-1 gaps): ra booleanity/hamming-weight sumchecks,
output check, untrusted advice regions.
"""

from __future__ import annotations

from functools import partial
from typing import Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp

from ..field import FR, ops
from ..poly import dense, eq, lt
from ..poly.univariate import UniPoly
from ..sumcheck.engine import OpeningAccumulator, SumcheckInstance
from ..witness.ram import RamWitness, address_of_index

P = FR.modulus


@partial(jax.jit, static_argnames=('fp',))
def _rw_message_kernel(E, RA, VAL, INC, g, fp=FR):
    """Evals at {0,2,3} of sum E*RA*((1+g)*VAL + g*INC)."""
    e = dense.sumcheck_eval_points_high(E, 3, fp)
    ra = dense.sumcheck_eval_points_high(RA, 3, fp)
    val = dense.sumcheck_eval_points_high(VAL, 3, fp)
    inc = dense.sumcheck_eval_points_high(INC, 3, fp)
    one_pg = ops.add(ops.ones(g.shape[1:], fp), g, fp)
    term = ops.add(ops.mont_mul(one_pg[:, None], val, fp),
                   ops.mont_mul(g[:, None], inc, fp), fp)
    return ops.sum_mod(ops.mont_mul(e, ops.mont_mul(ra, term, fp), fp), fp)


@partial(jax.jit, static_argnames=('fp',))
def _raf_message_kernel(E, RA, A, fp=FR):
    e = dense.sumcheck_eval_points_high(E, 3, fp)
    ra = dense.sumcheck_eval_points_high(RA, 3, fp)
    a = dense.sumcheck_eval_points_high(A, 3, fp)
    return ops.sum_mod(ops.mont_mul(e, ops.mont_mul(ra, a, fp), fp), fp)


@partial(jax.jit, static_argnames=('fp',))
def _val_message_kernel(EL, RA, INC, fp=FR):
    el = dense.sumcheck_eval_points_high(EL, 3, fp)
    ra = dense.sumcheck_eval_points_high(RA, 3, fp)
    inc = dense.sumcheck_eval_points_high(INC, 3, fp)
    return ops.sum_mod(ops.mont_mul(el, ops.mont_mul(ra, inc, fp), fp), fp)


def _broadcast_cycle(col: jnp.ndarray, T: int, K: int) -> jnp.ndarray:
    L = col.shape[0]
    return jnp.broadcast_to(col[:, :, None], (L, T, K)).reshape(L, T * K)


def _broadcast_addr(col: jnp.ndarray, T: int, K: int) -> jnp.ndarray:
    L = col.shape[0]
    return jnp.broadcast_to(col[:, None, :], (L, T, K)).reshape(L, T * K)


def addr_mle_eval(r_addr: Sequence[int], witness_base: int) -> int:
    """Closed-form A(r): 8*lin(r) + (wb-8)*(1 - prod(1-r_i))."""
    n = len(r_addr)
    lin = 0
    prod = 1
    for i, rb in enumerate(r_addr):
        lin = (lin + (1 << (n - 1 - i)) * rb) % P  # big-endian: r[0] = MSB
        prod = prod * ((1 - rb) % P) % P
    return (8 * lin + (witness_base - 8) * ((1 - prod) % P)) % P


def init_mle_eval(init_vals: Dict[int, int], r_addr: Sequence[int]) -> int:
    """Sparse public Val_init MLE evaluation: sum_k v_k * eq(k, r_addr)."""
    n = len(r_addr)
    acc = 0
    for k, v in init_vals.items():
        term = v % P
        for i, rb in enumerate(r_addr):
            bit = (k >> (n - 1 - i)) & 1
            term = term * ((rb if bit else (1 - rb)) % P) % P
        acc = (acc + term) % P
    return acc


class RamReadWriteChecking(SumcheckInstance):
    def __init__(self, wit: RamWitness, gamma: int, r_cycle: Sequence[int],
                 rv_claim: int, wv_claim: int):
        self.wit = wit
        self.T, self.K = wit.T, wit.K
        self.log_T = self.T.bit_length() - 1
        self.gamma = gamma
        self.r_cycle = list(r_cycle)
        self.rv_claim, self.wv_claim = rv_claim, wv_claim
        self.RA = ops.pack_ints(wit.ra)
        self.VAL = ops.pack_ints(wit.val)
        self.INC = _broadcast_cycle(ops.pack_ints(wit.inc), self.T, self.K)
        self.E = _broadcast_cycle(eq.evals(self.r_cycle), self.T, self.K)
        self.g = ops.pack_ints([gamma])
        self.final_openings: Optional[dict] = None

    @property
    def num_rounds(self) -> int:
        return self.log_T + self.wit.log_K

    def input_claim(self, accumulator: OpeningAccumulator) -> int:
        return (self.rv_claim + self.gamma * self.wv_claim) % P

    def compute_message(self, round: int, previous_claim: int) -> UniPoly:
        evals = ops.unpack_ints(
            _rw_message_kernel(self.E, self.RA, self.VAL, self.INC, self.g))
        return UniPoly.from_evals_and_hint(previous_claim, evals, P)

    def ingest_challenge(self, r: int, round: int) -> None:
        r_dev = ops.pack_ints([r])
        b = partial(dense.bind_high, fp=FR)
        self.E, self.RA, self.VAL, self.INC = (
            b(self.E, r_dev), b(self.RA, r_dev), b(self.VAL, r_dev),
            b(self.INC, r_dev))

    def finalize(self) -> None:
        self.final_openings = {
            "ra": ops.unpack_ints(self.RA)[0],
            "val": ops.unpack_ints(self.VAL)[0],
            "inc": ops.unpack_ints(self.INC)[0],
        }

    def cache_openings(self, accumulator: OpeningAccumulator,
                       r_slice: Sequence[int]) -> None:
        r_cyc = list(r_slice[:self.log_T])
        for name in ("ra", "val"):
            accumulator.insert(("ram", name), list(r_slice),
                               self.final_openings[name])
        accumulator.insert(("ram", "inc"), r_cyc, self.final_openings["inc"])

    def expected_output_claim(self, accumulator, r):  # pragma: no cover
        raise NotImplementedError


class RamReadWriteCheckingVerifier(SumcheckInstance):
    def __init__(self, log_T: int, log_K: int, gamma: int,
                 r_cycle: Sequence[int], rv_claim: int, wv_claim: int,
                 openings: dict):
        self.log_T, self.log_K = log_T, log_K
        self.gamma = gamma
        self.r_cycle = list(r_cycle)
        self.rv_claim, self.wv_claim = rv_claim, wv_claim
        self.openings = openings

    @property
    def num_rounds(self) -> int:
        return self.log_T + self.log_K

    def input_claim(self, accumulator: OpeningAccumulator) -> int:
        return (self.rv_claim + self.gamma * self.wv_claim) % P

    def compute_message(self, round, prev):  # pragma: no cover
        raise NotImplementedError("verifier instance")

    def ingest_challenge(self, r, round):  # pragma: no cover
        raise NotImplementedError("verifier instance")

    def expected_output_claim(self, accumulator: OpeningAccumulator,
                              r: Sequence[int]) -> int:
        r_cyc = list(r[:self.log_T])
        o = self.openings
        g = self.gamma
        term = ((1 + g) * o["val"] + g * o["inc"]) % P
        return eq.eq_int(self.r_cycle, r_cyc) * o["ra"] % P * term % P


class RamRafEvaluation(SumcheckInstance):
    """Proves the RamAddress opening: address = <ra, A> per cycle."""

    def __init__(self, wit: RamWitness, r_cycle: Sequence[int],
                 addr_claim: int):
        self.wit = wit
        self.T, self.K = wit.T, wit.K
        self.log_T = self.T.bit_length() - 1
        self.r_cycle = list(r_cycle)
        self.addr_claim = addr_claim
        self.RA = ops.pack_ints(wit.ra)
        addrs = [address_of_index(k, wit.witness_base) for k in range(self.K)]
        self.A = _broadcast_addr(ops.pack_ints(addrs), self.T, self.K)
        self.E = _broadcast_cycle(eq.evals(self.r_cycle), self.T, self.K)
        self.final_openings: Optional[dict] = None

    @property
    def num_rounds(self) -> int:
        return self.log_T + self.wit.log_K

    def input_claim(self, accumulator: OpeningAccumulator) -> int:
        return self.addr_claim % P

    def compute_message(self, round: int, previous_claim: int) -> UniPoly:
        evals = ops.unpack_ints(_raf_message_kernel(self.E, self.RA, self.A))
        return UniPoly.from_evals_and_hint(previous_claim, evals, P)

    def ingest_challenge(self, r: int, round: int) -> None:
        r_dev = ops.pack_ints([r])
        b = partial(dense.bind_high, fp=FR)
        self.E, self.RA, self.A = (b(self.E, r_dev), b(self.RA, r_dev),
                                   b(self.A, r_dev))

    def finalize(self) -> None:
        self.final_openings = {"ra": ops.unpack_ints(self.RA)[0]}

    def cache_openings(self, accumulator: OpeningAccumulator,
                       r_slice: Sequence[int]) -> None:
        accumulator.insert(("ram_raf", "ra"), list(r_slice),
                           self.final_openings["ra"])

    def expected_output_claim(self, accumulator, r):  # pragma: no cover
        raise NotImplementedError


class RamRafEvaluationVerifier(SumcheckInstance):
    def __init__(self, log_T: int, log_K: int, r_cycle: Sequence[int],
                 addr_claim: int, witness_base: int, openings: dict):
        self.log_T, self.log_K = log_T, log_K
        self.r_cycle = list(r_cycle)
        self.addr_claim = addr_claim
        self.witness_base = witness_base
        self.openings = openings

    @property
    def num_rounds(self) -> int:
        return self.log_T + self.log_K

    def input_claim(self, accumulator: OpeningAccumulator) -> int:
        return self.addr_claim % P

    def compute_message(self, round, prev):  # pragma: no cover
        raise NotImplementedError("verifier instance")

    def ingest_challenge(self, r, round):  # pragma: no cover
        raise NotImplementedError("verifier instance")

    def expected_output_claim(self, accumulator: OpeningAccumulator,
                              r: Sequence[int]) -> int:
        r_cyc = list(r[:self.log_T])
        r_addr = list(r[self.log_T:])
        a_eval = addr_mle_eval(r_addr, self.witness_base)
        return (eq.eq_int(self.r_cycle, r_cyc) * self.openings["ra"] % P
                * a_eval % P)


class RamValEvaluation(SumcheckInstance):
    """Proves Val(r) - Val_init(r_addr) = prefix-sum of increments."""

    def __init__(self, wit: RamWitness, r_addr: Sequence[int],
                 r_cyc: Sequence[int], val_claim: int):
        self.wit = wit
        self.T, self.K = wit.T, wit.K
        self.log_T = self.T.bit_length() - 1
        init_eval = init_mle_eval(wit.init_vals, r_addr)
        self._input_claim = (val_claim - init_eval) % P
        LT_cycle = lt.evals(list(r_cyc))
        EQ_addr = eq.evals(list(r_addr))
        L = LT_cycle.shape[0]
        EL = ops.mont_mul(LT_cycle[:, :, None], EQ_addr[:, None, :], FR)
        self.EL = EL.reshape(L, self.T * self.K)
        self.RA = ops.pack_ints(wit.ra)
        self.INC = _broadcast_cycle(ops.pack_ints(wit.inc), self.T, self.K)
        self.final_openings: Optional[dict] = None

    @property
    def num_rounds(self) -> int:
        return self.log_T + self.wit.log_K

    def input_claim(self, accumulator: OpeningAccumulator) -> int:
        return self._input_claim

    def compute_message(self, round: int, previous_claim: int) -> UniPoly:
        evals = ops.unpack_ints(_val_message_kernel(self.EL, self.RA, self.INC))
        return UniPoly.from_evals_and_hint(previous_claim, evals, P)

    def ingest_challenge(self, r: int, round: int) -> None:
        r_dev = ops.pack_ints([r])
        b = partial(dense.bind_high, fp=FR)
        self.EL, self.RA, self.INC = (b(self.EL, r_dev), b(self.RA, r_dev),
                                      b(self.INC, r_dev))

    def finalize(self) -> None:
        self.final_openings = {
            "ra": ops.unpack_ints(self.RA)[0],
            "inc": ops.unpack_ints(self.INC)[0],
        }

    def cache_openings(self, accumulator: OpeningAccumulator,
                       r_slice: Sequence[int]) -> None:
        r_cyc = list(r_slice[:self.log_T])
        accumulator.insert(("ram_val_eval", "ra"), list(r_slice),
                           self.final_openings["ra"])
        accumulator.insert(("ram_val_eval", "inc"), r_cyc,
                           self.final_openings["inc"])

    def expected_output_claim(self, accumulator, r):  # pragma: no cover
        raise NotImplementedError


class RamValEvaluationVerifier(SumcheckInstance):
    def __init__(self, log_T: int, log_K: int, r_addr: Sequence[int],
                 r_cyc: Sequence[int], val_claim: int,
                 init_vals: Dict[int, int], openings: dict,
                 extra_init: int = 0):
        # extra_init: selector-scaled advice-opening contributions to
        # Init(r_addr) (zkvm/ram/mod.rs reconstruct_full_eval)
        self.log_T, self.log_K = log_T, log_K
        self.r_addr = list(r_addr)
        self.r_cyc = list(r_cyc)
        self._input_claim = (val_claim - init_mle_eval(init_vals, r_addr)
                             - extra_init) % P
        self.openings = openings

    @property
    def num_rounds(self) -> int:
        return self.log_T + self.log_K

    def input_claim(self, accumulator: OpeningAccumulator) -> int:
        return self._input_claim

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
        return lt_eval * eq_addr % P * o["ra"] % P * o["inc"] % P


class RamOutputCheck(SumcheckInstance):
    """Proves the public outputs equal the final RAM state in the output
    region (`zkvm/ram/output_check.rs` analog).

    For a transcript challenge z, with W(k) = z^i for the i-th output-region
    cell (else 0) -- a sparse PUBLIC polynomial:

        sum_i z^i*out_i - sum_k W(k)*Val_init(k)
            = sum_{k,j} W(k) * ra(k,j) * inc(j)

    (final value = initial value + all increments; contracting with W
    isolates the output region).  Degree-3; batches with RamValEvaluation.
    """

    def __init__(self, wit: RamWitness, layout, z: int, outputs: bytes):
        self.wit = wit
        self.T, self.K = wit.T, wit.K
        self.log_T = self.T.bit_length() - 1
        self.z = z
        self.out_cells = output_region_cells(layout, wit.witness_base, wit.K)
        out_words = outputs_as_words(outputs, layout)
        lhs = 0
        zp = 1
        init_term = 0
        w_sparse = {}
        for i, k in enumerate(self.out_cells):
            w_sparse[k] = zp
            lhs = (lhs + zp * out_words.get(k, 0)) % P
            init_term = (init_term + zp * wit.init_vals.get(k, 0)) % P
            zp = zp * self.z % P
        self._input_claim = (lhs - init_term) % P
        W = [0] * self.K
        for k, v in w_sparse.items():
            W[k] = v
        self.W = _broadcast_addr(ops.pack_ints(W), self.T, self.K)
        self.RA = ops.pack_ints(wit.ra)
        self.INC = _broadcast_cycle(ops.pack_ints(wit.inc), self.T, self.K)
        self.final_openings: Optional[dict] = None

    @property
    def num_rounds(self) -> int:
        return self.log_T + self.wit.log_K

    def input_claim(self, accumulator: OpeningAccumulator) -> int:
        return self._input_claim

    def compute_message(self, round: int, previous_claim: int) -> UniPoly:
        evals = ops.unpack_ints(_raf_message_kernel(self.W, self.RA, self.INC))
        return UniPoly.from_evals_and_hint(previous_claim, evals, P)

    def ingest_challenge(self, r: int, round: int) -> None:
        r_dev = ops.pack_ints([r])
        b = partial(dense.bind_high, fp=FR)
        self.W, self.RA, self.INC = (b(self.W, r_dev), b(self.RA, r_dev),
                                     b(self.INC, r_dev))

    def finalize(self) -> None:
        self.final_openings = {
            "ra": ops.unpack_ints(self.RA)[0],
            "inc": ops.unpack_ints(self.INC)[0],
        }

    def cache_openings(self, accumulator: OpeningAccumulator,
                       r_slice: Sequence[int]) -> None:
        accumulator.insert(("ram_output", "ra"), list(r_slice),
                           self.final_openings["ra"])
        accumulator.insert(("ram_output", "inc"),
                           list(r_slice[:self.log_T]),
                           self.final_openings["inc"])

    def expected_output_claim(self, accumulator, r):  # pragma: no cover
        raise NotImplementedError


class RamOutputCheckVerifier(SumcheckInstance):
    def __init__(self, log_T: int, log_K: int, z: int, outputs: bytes,
                 layout, witness_base: int, init_vals: Dict[int, int],
                 openings: dict):
        self.log_T, self.log_K = log_T, log_K
        self.z = z
        K = 1 << log_K
        self.out_cells = output_region_cells(layout, witness_base, K)
        out_words = outputs_as_words(outputs, layout)
        lhs, init_term, zp = 0, 0, 1
        self.w_sparse = {}
        for k in self.out_cells:
            self.w_sparse[k] = zp
            lhs = (lhs + zp * out_words.get(k, 0)) % P
            init_term = (init_term + zp * init_vals.get(k, 0)) % P
            zp = zp * z % P
        self._input_claim = (lhs - init_term) % P
        self.openings = openings

    @property
    def num_rounds(self) -> int:
        return self.log_T + self.log_K

    def input_claim(self, accumulator: OpeningAccumulator) -> int:
        return self._input_claim

    def compute_message(self, round, prev):  # pragma: no cover
        raise NotImplementedError("verifier instance")

    def ingest_challenge(self, r, round):  # pragma: no cover
        raise NotImplementedError("verifier instance")

    def expected_output_claim(self, accumulator: OpeningAccumulator,
                              r: Sequence[int]) -> int:
        r_addr = list(r[self.log_T:])
        w_eval = init_mle_eval(self.w_sparse, r_addr)  # sparse public MLE
        o = self.openings
        return w_eval * o["ra"] % P * o["inc"] % P


def output_region_cells(layout, witness_base: int, K: int):
    """Witness cell indices of the output region (ordered)."""
    from ..witness.ram import remap_address
    cells = []
    a = layout.output_start
    while a < layout.output_end:
        k = remap_address(a, witness_base)
        if k < K:
            cells.append(k)
        a += 8
    return cells


def outputs_as_words(outputs: bytes, layout) -> Dict[int, int]:
    """Public outputs -> {cell index: dword value} (zero-padded region)."""
    from ..witness.ram import remap_address
    out = {}
    wb = getattr(layout, "witness_base", layout.input_start)
    for off in range(0, layout.output_end - layout.output_start, 8):
        word = int.from_bytes(outputs[off:off + 8].ljust(8, b"\x00"), "little") \
            if off < len(outputs) else 0
        k = remap_address(layout.output_start + off, wb)
        out[k] = word
    return out
