"""Naive Expr-interpreter oracle gates for the PRODUCTION relations.

The reference equivalence-tests every optimized kernel slot against the
`NaiveSumcheckProver` Expr interpreter on small traces
(`specs/clean-slate-prover.md:110-140`, invariant `kernel_naive_equivalence`
:196-200).  This file is that gate for the TPU stack: each production
sparse/scan relation is re-stated as a claims-layer `Expr` with dense
polynomial leaves built from a real tiny trace, and the production
instance's round messages must be BYTE-IDENTICAL to the naive
interpreter's on a shared transcript.

Variable-order convention: the sparse Twist tier binds cycle variables
LSB-first and then address variables MSB-first, so the naive leaves are
laid out as idx = bitrev(cycle) * K + addr (the naive prover binds
MSB-first throughout).
"""
import pytest

from jolt_tpu.claims.expr import Challenge, Const, Poly
from jolt_tpu.claims.naive import NaiveExprProver, sum_over_hypercube
from jolt_tpu.field import ops
from jolt_tpu.field.params import FR
from jolt_tpu.poly import eq as eq_mod
from jolt_tpu.poly import lt as lt_mod
from jolt_tpu.riscv.emulator import MemoryLayout
from jolt_tpu.sumcheck.engine import BatchedSumcheck, OpeningAccumulator
from jolt_tpu.tracer import trace_program
from jolt_tpu.transcript import Blake2bTranscript
from jolt_tpu.witness.ram import extract_ram_log

P = FR.modulus
L = MemoryLayout(max_input_size=64, max_output_size=64)

GUEST = f"""
    li   a0, 5
    li   a1, 0
    li   t3, {L.output_start}
loop:
    add  a1, a1, a0
    sd   a1, 0(t3)
    ld   a2, 0(t3)
    addi t3, t3, 8
    addi a0, a0, -1
    bne  a0, zero, loop
    li   t1, {L.termination}
    li   t2, 1
    sd   t2, 0(t1)
"""


@pytest.fixture(scope="module")
def tiny():
    import random

    from jolt_tpu.relations.ram_sparse import RamPairSchedule
    tr = trace_program(GUEST, layout=L, min_padded=32)
    wit = extract_ram_log(tr)
    sched = RamPairSchedule(wit.cols, wit.pre, wit.post, wit.K)
    rng = random.Random(7)
    return tr, wit, sched, rng


def _bitrev(x: int, bits: int) -> int:
    return int(bin(x | (1 << bits))[3:][::-1], 2)


def _fetch(dev) -> list:
    return ops.unpack_ints(dev)


def _dense_leaves(wit):
    """(ra, val, inc_b, eqc-builder...) over idx = bitrev(c)*K + a."""
    K, T = wit.K, wit.T
    log_T = T.bit_length() - 1
    ra = [0] * (K * T)
    val = [0] * (K * T)
    mem = dict(wit.init_vals)
    for c in range(T):
        cb = _bitrev(c, log_T)
        for a, v in mem.items():
            val[cb * K + a] = v % P
        k = int(wit.cols[c])
        # true one-hot: dummy (non-memory) cycles select cell 0
        ra[cb * K + k] = 1
        if k:
            mem[k] = int(wit.post[c])
    return ra, val


def _bcast_cycle(vals, K, T):
    """Cycle-indexed host values -> (bitrev(c), a) layout leaf."""
    log_T = T.bit_length() - 1
    out = [0] * (K * T)
    for c in range(T):
        base = _bitrev(c, log_T) * K
        v = vals[c] % P
        for a in range(K):
            out[base + a] = v
    return out


def _bcast_addr(vals, K, T):
    out = [0] * (K * T)
    for c in range(T):
        base = c * K
        for a in range(K):
            out[base + a] = vals[a] % P
    return out


def _roundpolys(inst):
    acc = OpeningAccumulator()
    t = Blake2bTranscript(b"naive-gate")
    polys, _ = BatchedSumcheck.prove([inst], acc, t)
    return polys


def test_ram_val_evaluation_matches_naive(tiny):
    from jolt_tpu.relations.ram import init_mle_eval
    from jolt_tpu.relations.ram_sparse import SparseRamValEvaluation
    tr, wit, sched, rng = tiny
    K, T = wit.K, wit.T
    log_T = T.bit_length() - 1
    r_cyc = [rng.randrange(P) for _ in range(log_T)]
    r_addr = [rng.randrange(P) for _ in range(wit.log_K)]

    ra, _ = _dense_leaves(wit)
    leaves = {
        "ra": ra,
        "lt": _bcast_cycle(_fetch(lt_mod.evals(r_cyc)), K, T),
        "inc": _bcast_cycle([v % P for v in wit.inc], K, T),
        "eqa": _bcast_addr(_fetch(eq_mod.evals(r_addr)), K, T),
    }
    expr = Poly("lt") * Poly("inc") * Poly("ra") * Poly("eqa")
    claim = sum_over_hypercube(expr, leaves, {})
    val_claim = (claim + init_mle_eval(wit.init_vals, r_addr)) % P

    prod = SparseRamValEvaluation(sched, wit.log_K, wit.init_vals, wit.inc,
                                  r_addr, r_cyc, val_claim)
    naive = NaiveExprProver(expr, leaves)
    naive.degree = prod.degree
    assert prod.input_claim(None) == claim
    assert _roundpolys(prod) == _roundpolys(naive)


def test_ram_read_write_checking_matches_naive(tiny):
    from jolt_tpu.relations.ram_sparse import SparseRamReadWriteChecking
    tr, wit, sched, rng = tiny
    K, T = wit.K, wit.T
    log_T = T.bit_length() - 1
    r_cyc = [rng.randrange(P) for _ in range(log_T)]
    gamma = rng.randrange(P)

    ra, val = _dense_leaves(wit)
    leaves = {
        "ra": ra,
        "val": val,
        "eqc": _bcast_cycle(_fetch(eq_mod.evals(r_cyc)), K, T),
        "inc": _bcast_cycle([v % P for v in wit.inc], K, T),
    }
    g = Challenge("g")
    expr = Poly("eqc") * Poly("ra") * (
        (Const(1) + g) * Poly("val") + g * Poly("inc"))
    claim = sum_over_hypercube(expr, leaves, {"g": gamma})
    # claim = rv + g*wv; any (rv, wv) split with that combination works
    prod = SparseRamReadWriteChecking(sched, wit.log_K, wit.init_vals,
                                      wit.inc, gamma, r_cyc, claim, 0)
    naive = NaiveExprProver(expr, leaves, {"g": gamma})
    naive.degree = prod.degree
    assert prod.input_claim(None) == claim
    assert _roundpolys(prod) == _roundpolys(naive)


def test_ram_raf_evaluation_matches_naive(tiny):
    from jolt_tpu.relations.ram_sparse import SparseRamRafEvaluation
    from jolt_tpu.witness.ram import address_of_index
    tr, wit, sched, rng = tiny
    K, T = wit.K, wit.T
    log_T = T.bit_length() - 1
    r_cyc = [rng.randrange(P) for _ in range(log_T)]

    ra, _ = _dense_leaves(wit)
    addrs = [address_of_index(k, wit.witness_base) % P for k in range(K)]
    leaves = {
        "ra": ra,
        "eqc": _bcast_cycle(_fetch(eq_mod.evals(r_cyc)), K, T),
        "A": _bcast_addr(addrs, K, T),
    }
    expr = Poly("eqc") * Poly("ra") * Poly("A")
    claim = sum_over_hypercube(expr, leaves, {})
    prod = SparseRamRafEvaluation(sched, wit.log_K, wit.witness_base,
                                  r_cyc, claim)
    naive = NaiveExprProver(expr, leaves)
    naive.degree = prod.degree
    assert prod.input_claim(None) == claim
    assert _roundpolys(prod) == _roundpolys(naive)


def test_registers_read_write_checking_matches_naive(tiny):
    """rd + g*rs1 + g^2*rs2 = sum eq(r_cyc,j) * [wa(k,j)(inc(j)+Val(k,j))
    + (g*ra1 + g^2*ra2)(k,j) Val(k,j)]  (registers Twist, K = 128)."""
    from jolt_tpu.relations.ram_sparse import SparseRegistersReadWriteChecking
    from jolt_tpu.witness.registers import LOG_K as REG_LOG_K
    from jolt_tpu.witness.registers import extract_register_log
    tr, wit, sched, rng = tiny
    log = extract_register_log(tr)
    K, T = 1 << REG_LOG_K, log.T
    log_T = T.bit_length() - 1
    r_cyc = [rng.randrange(P) for _ in range(log_T)]
    gamma = rng.randrange(P)

    wa = [0] * (K * T)
    ra1 = [0] * (K * T)
    ra2 = [0] * (K * T)
    val = [0] * (K * T)
    incl = [0] * (K * T)
    eqc_vals = _fetch(eq_mod.evals(r_cyc))
    eqc = [0] * (K * T)
    regs = [0] * K
    for c in range(T):
        base = _bitrev(c, log_T) * K
        for a in range(K):
            val[base + a] = regs[a] % P
            incl[base + a] = log.inc[c] % P
            eqc[base + a] = eqc_vals[c] % P
        wa[base + log.rd_eff[c]] = 1
        ra1[base + log.rs1_eff[c]] = 1
        ra2[base + log.rs2_eff[c]] = 1
        regs[log.rd_eff[c]] = (regs[log.rd_eff[c]] + log.inc[c]) % P
    g = Challenge("g")
    expr = Poly("eqc") * (
        Poly("wa") * (Poly("inc") + Poly("val"))
        + (g * Poly("ra1") + g * g * Poly("ra2")) * Poly("val"))
    leaves = {"eqc": eqc, "wa": wa, "ra1": ra1, "ra2": ra2,
              "val": val, "inc": incl}
    claim = sum_over_hypercube(expr, leaves, {"g": gamma})
    # split the combined claim arbitrarily: only the combination is checked
    prod = SparseRegistersReadWriteChecking(log, gamma, r_cyc,
                                            [claim, 0, 0])
    naive = NaiveExprProver(expr, leaves, {"g": gamma})
    naive.degree = prod.degree
    assert prod.input_claim(None) == claim
    assert _roundpolys(prod) == _roundpolys(naive)


def test_grouped_onehot_matches_naive(tiny):
    """GroupedOneHot (stage 7/8): hamming claim = sum w(j) M(k,j) and
    booleanity 0 = sum eq(q_addr,k) w(j) (M^2 - M); address variables
    bind first (MSB-first), then cycle variables (MSB-first)."""
    from jolt_tpu.relations.grouped_onehot import GroupedOneHot
    tr, wit, sched, rng = tiny
    T = wit.T
    log_T = T.bit_length() - 1
    K, log_K = 8, 3
    stream = [rng.randrange(K) for _ in range(T)]
    r_h = [rng.randrange(P) for _ in range(log_T)]
    q_addr = [rng.randrange(P) for _ in range(log_K)]
    gamma = rng.randrange(P)
    E_h = eq_mod.evals(r_h)
    eqh = _fetch(E_h)
    eqa = _fetch(eq_mod.evals(q_addr))

    ra = [0] * (K * T)
    W = [0] * (K * T)
    EA = [0] * (K * T)
    for c in range(T):
        for a in range(K):
            i = a * T + c
            W[i] = eqh[c] % P
            EA[i] = eqa[a] % P
            if stream[c] == a:
                ra[i] = 1
    # hamming
    expr_h = Poly("w") * Poly("m")
    claim_h = sum_over_hypercube(expr_h, {"w": W, "m": ra}, {})
    prod = GroupedOneHot([stream], K, [E_h], [None], [claim_h], gamma,
                         ["x"], booleanity=False, opening_kind="hamming")
    naive = NaiveExprProver(expr_h, {"w": W, "m": ra})
    naive.degree = prod.degree
    assert prod.input_claim(None) == claim_h % P
    assert _roundpolys(prod) == _roundpolys(naive)
    # booleanity (claim is 0 for a true one-hot)
    expr_b = Poly("ea") * Poly("w") * (Poly("m") * Poly("m") - Poly("m"))
    assert sum_over_hypercube(expr_b, {"ea": EA, "w": W, "m": ra}, {}) == 0
    prod_b = GroupedOneHot([stream], K, [E_h], [q_addr], [0], gamma,
                           ["x"], booleanity=True, opening_kind="booleanity")
    naive_b = NaiveExprProver(expr_b, {"ea": EA, "w": W, "m": ra})
    naive_b.degree = prod_b.degree
    assert _roundpolys(prod_b) == _roundpolys(naive_b)


def test_onehot_table_eval_matches_naive(tiny):
    """SparseOneHotTableEval -- the bytecode read-raf / registers-raf
    family: claim = sum eq(r_cyc,j) M(k,j) TAB(k)."""
    from jolt_tpu.relations.ram_sparse import (RamPairSchedule,
                                               SparseOneHotTableEval,
                                               index_table)
    import numpy as np
    tr, wit, sched, rng = tiny
    T = wit.T
    log_T = T.bit_length() - 1
    K = 8
    stream = np.asarray([rng.randrange(K) for _ in range(T)], np.int64)
    r_cyc = [rng.randrange(P) for _ in range(log_T)]

    ra = [0] * (K * T)
    for c in range(T):
        ra[_bitrev(c, log_T) * K + int(stream[c])] = 1
    tab = list(range(K))          # TAB(k) = k (the register-raf table)
    leaves = {
        "ra": ra,
        "eqc": _bcast_cycle(_fetch(eq_mod.evals(r_cyc)), K, T),
        "tab": _bcast_addr(tab, K, T),
    }
    expr = Poly("eqc") * Poly("ra") * Poly("tab")
    claim = sum_over_hypercube(expr, leaves, {})

    sched_p = RamPairSchedule(stream, np.zeros(T, np.uint64),
                              np.zeros(T, np.uint64), K)
    prod = SparseOneHotTableEval(sched_p, 3, index_table(K), r_cyc, claim,
                                 ("gate", "ra"), opening_key="m")
    naive = NaiveExprProver(expr, leaves)
    naive.degree = prod.degree
    assert prod.input_claim(None) == claim
    assert _roundpolys(prod) == _roundpolys(naive)


def test_spartan_outer_matches_naive(tiny):
    """Stage-1 post-skip sumcheck: sum_idx E * (Az*Bz - Cz) over the
    (group, cycle) hypercube, gated against the Expr interpreter with the
    instance's own bound matrices as dense leaves."""
    from jolt_tpu.relations.spartan_outer import (SpartanOuterProver,
                                                  num_stage1_rounds,
                                                  prove_uniskip)
    from jolt_tpu.witness.r1cs_inputs import extract_r1cs_inputs
    tr, wit, sched, rng = tiny
    inputs = extract_r1cs_inputs(tr)
    log_T = inputs.T.bit_length() - 1
    tau = [rng.randrange(P) for _ in range(2 + log_T)]
    t_fix = Blake2bTranscript(b"naive-outer")
    cols_dev, _c, r0, claim1, l_scale = prove_uniskip(inputs, tau, t_fix)
    prod = SpartanOuterProver(inputs, tau[1:], r0, claim1, l_scale,
                              cols_dev)
    leaves = {
        "e": _fetch(prod.E),
        "az": _fetch(prod.AZ),
        "bz": _fetch(prod.BZ),
        "cz": _fetch(prod.CZ),
    }
    expr = Poly("e") * (Poly("az") * Poly("bz")
                        + Const(P - 1) * Poly("cz"))
    naive = NaiveExprProver(expr, leaves)
    naive.degree = prod.degree
    # the uni-skip output claim IS the hypercube sum of the bound matrices
    assert naive.input_claim(None) == claim1 % P
    assert _roundpolys(prod) == _roundpolys(naive)


def test_spartan_shift_matches_naive(tiny):
    """PC-chaining shift sumcheck: sum_j W'(r_cycle, j) * COL(j) with the
    clamped-shift weight table as a dense leaf."""
    from jolt_tpu.relations.shift import (SHIFT_COLUMNS, ShiftSumcheck,
                                          shift_column_values,
                                          shift_weight_evals)
    from jolt_tpu.witness.bytecode import extract_bytecode_witness
    tr, wit, sched, rng = tiny
    bc_wit = extract_bytecode_witness(tr)
    gamma = rng.randrange(P)
    r_cyc = [rng.randrange(P) for _ in range(tr.log_T)]
    cols = shift_column_values(bc_wit.table, bc_wit.pc_idx, gamma)
    W = _fetch(shift_weight_evals(r_cyc))
    leaves = {"w": W, "cols": [v % P for v in cols]}
    expr = Poly("w") * Poly("cols")
    S = sum_over_hypercube(expr, leaves, {})

    prod = ShiftSumcheck(cols, r_cyc, gamma)
    # seed the five next_* claims so the gamma combination equals S
    acc = OpeningAccumulator()
    for m, (name, _) in enumerate(SHIFT_COLUMNS):
        acc.insert(("r1cs_input", name), (), S if m == 0 else 0)
    assert prod.input_claim(acc) == S
    t1 = Blake2bTranscript(b"naive-gate")
    polys_p, _ = BatchedSumcheck.prove([prod], acc, t1)

    naive = NaiveExprProver(expr, leaves)
    naive.degree = prod.degree
    assert polys_p == _roundpolys(naive)


def test_instruction_read_raf_output_claims_bruteforce(tiny):
    """Independent oracle for the 2^128-index instruction Shout: the
    hypercube interpreter cannot enumerate K = 2^128, so instead every
    OUTPUT claim of the production instance is recomputed from first
    principles on the host -- ra_i openings as one-hot chunk MLEs,
    lookup-table flags as eq-weighted indicator sums -- closing the same
    kernel_naive_equivalence intent at the claim layer."""
    from jolt_tpu.lookups import tables as LT2
    from jolt_tpu.relations.instruction_read_raf import InstructionReadRaf
    from jolt_tpu.witness.instruction_lookups import (
        D as LK_D2, extract_instruction_lookup_witness)
    from jolt_tpu.witness.r1cs_inputs import extract_r1cs_inputs
    tr, wit, sched, rng = tiny
    inputs = extract_r1cs_inputs(tr)
    lk_wit = extract_instruction_lookup_witness(tr, inputs)
    T = inputs.T
    log_T = T.bit_length() - 1
    r_cyc = [rng.randrange(P) for _ in range(log_T)]
    gamma = rng.randrange(P)
    E = _fetch(eq_mod.evals(r_cyc))

    def col(name):
        from jolt_tpu.witness.r1cs_inputs import VAR_NAMES
        return [int(v) % P for v in inputs.col(VAR_NAMES.index(name))]

    rv = sum(E[j] * v for j, v in enumerate(col("lookup_output"))) % P
    lv = sum(E[j] * v
             for j, v in enumerate(col("left_lookup_operand"))) % P
    rvv = sum(E[j] * v
              for j, v in enumerate(col("right_lookup_operand"))) % P

    inst = InstructionReadRaf(lk_wit, gamma, r_cyc, rv, lv, rvv)
    acc = OpeningAccumulator()
    t = Blake2bTranscript(b"naive-gate")
    BatchedSumcheck.prove([inst], acc, t)

    for i in range(LK_D2):
        pt, claim = acc.openings[("instr_ra", i)]
        pc, pa = list(pt[:log_T]), list(pt[log_T:])
        Ec = _fetch(eq_mod.evals(pc))
        want = 0
        for j in range(T):
            k = int(lk_wit.chunks[i][j])
            a = 1
            for b, q in enumerate(pa):
                bit = (k >> (len(pa) - 1 - b)) & 1
                a = a * (q if bit else (1 - q) % P) % P
            want = (want + Ec[j] * a) % P
        assert claim == want, f"ra{i} opening diverges from brute force"

    # lookup-table flag claims: eq-weighted indicators over cycles
    r_lk = acc.get_point(("instr_flag", LT2.TABLE_NAMES[0]))
    Ef = _fetch(eq_mod.evals(list(r_lk)))
    for tname in LT2.TABLE_NAMES:
        want = 0
        for j in range(T):
            if lk_wit.table_ids[j] == LT2.TABLE_NAMES.index(tname):
                want = (want + Ef[j]) % P
        got = acc.get_claim(("instr_flag", tname))
        assert got == want, f"flag {tname} diverges from brute force"
