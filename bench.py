"""Benchmark: core prover kernel throughput on the real TPU chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Headline metric (round 1): Montgomery-multiply throughput inside the fused
product-sumcheck round kernel (message evals + bind) -- the #1 hot loop of
the Jolt prover (SURVEY.md §3.2: compute_message + bind dominate).

vs_baseline: ratio against an estimated 1.0e9 Montgomery muls/s for the
reference's 32-core CPU class (arkworks 4x64 Montgomery ~30ns/core/mul;
`BASELINE.md` e2e 1.5MHz on a Threadripper 7975WX).
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from jolt_tpu.field import FR, ops
    from jolt_tpu.poly import dense

    T = 1 << 18
    DEG = 3
    rng = np.random.default_rng(0)

    def rand_mle():
        limbs = rng.integers(0, 1 << 13, size=(FR.num_limbs, T), dtype=np.uint32)
        limbs[-1] &= 0x7F
        return jnp.asarray(limbs)

    @jax.jit
    def round_step(polys, r):
        acc = None
        for Pk in polys:
            e = dense.sumcheck_eval_points_high(Pk, DEG, FR)
            acc = e if acc is None else ops.mont_mul(acc, e, FR)
        msg = ops.sum_mod(acc, FR)
        bound = tuple(dense.bind_high(Pk, r, FR) for Pk in polys)
        return msg, bound

    polys = tuple(rand_mle() for _ in range(DEG))
    r = jnp.asarray(FR.int_to_mont_limbs(123456789)[:, None])

    # compile + warmup
    out = round_step(polys, r)
    jax.block_until_ready(out)

    iters = 10
    t0 = time.perf_counter()
    for _ in range(iters):
        out = round_step(polys, r)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters

    # mont_muls per round_step:
    #   message: (DEG-1) muls per (deg point, pair) = (DEG-1)*DEG*(T/2)
    #   bind: 1 mul per pair per poly = DEG*(T/2)
    n_mul = (DEG - 1) * DEG * (T // 2) + DEG * (T // 2)
    ops_per_s = n_mul / dt

    cpu_baseline = 1.0e9  # est. 32-core arkworks Montgomery muls/s
    print(json.dumps({
        "metric": "sumcheck_round_mont_mul_throughput",
        "value": round(ops_per_s / 1e6, 2),
        "unit": "Mmul/s",
        "vs_baseline": round(ops_per_s / cpu_baseline, 4),
    }))


if __name__ == "__main__":
    main()
