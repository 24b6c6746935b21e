"""Benchmark: core prover kernel throughput on the real TPU chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Headline metric: useful Montgomery multiplies/s inside the fused Pallas
product-sumcheck round kernel (message evals + binds in one HBM pass) --
the #1 hot loop of the Jolt prover (SURVEY.md §3.2: compute_message + bind
dominate every stage).

Measurement methodology: rounds are chained inside ONE jitted fori_loop
with the bound outputs feeding the next iteration, and the result is
device_get-forced -- on this remote-relay platform, block_until_ready alone
does not guarantee execution, so naive timings inflate by >10x.

vs_baseline: ratio against an estimated 1.0e9 Montgomery muls/s for the
reference's 32-core CPU class (arkworks 4x64 Montgomery ~30ns/core/mul;
`BASELINE.md` e2e 1.5MHz on a Threadripper 7975WX).
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def main():
    from jolt_tpu.field import FR
    from jolt_tpu.field import pallas_ops as po

    T = 1 << 20
    ITERS = 10
    rng = np.random.default_rng(0)

    def rand_mle(n=T):
        limbs = rng.integers(0, 1 << 13, size=(FR.num_limbs, n), dtype=np.uint32)
        limbs[-1] &= 0x7F
        return jnp.asarray(limbs)

    p0, p1, p2 = rand_mle(), rand_mle(), rand_mle()
    r = rand_mle(1)

    @jax.jit
    def loop(p0, p1, p2, r):
        def body(i, carry):
            q0, q1, q2 = carry
            msg, b0, b1, b2 = po.product_round_deg3(q0, q1, q2, r)
            return (jnp.concatenate([b0, b0], 1),
                    jnp.concatenate([b1, b1], 1),
                    jnp.concatenate([b2, b2], 1))
        return jax.lax.fori_loop(0, ITERS, body, (p0, p1, p2))

    out = loop(p0, p1, p2, r)
    jax.device_get(out[0][:, :1])  # warm + force

    t0 = time.perf_counter()
    out = loop(p0, p1, p2, r)
    jax.device_get(out[0][:, :1])
    dt = (time.perf_counter() - t0) / ITERS

    n_mul = 9 * (T // 2)  # 6 message-product + 3 bind muls per index pair
    ops_per_s = n_mul / dt

    cpu_baseline = 1.0e9  # est. 32-core arkworks Montgomery muls/s
    print(json.dumps({
        "metric": "fused_sumcheck_round_mont_mul_throughput",
        "value": round(ops_per_s / 1e6, 2),
        "unit": "Mmul/s",
        "vs_baseline": round(ops_per_s / cpu_baseline, 4),
    }))


if __name__ == "__main__":
    main()
