"""Experiment: route the sumcheck hot loops through the MXU (int8 matmuls).

Two candidate kernels, measured against the current VPU/Pallas tier:

1. `dot-reduce`: the sumcheck message reduction  S = sum_j e_j * w_j.
   With 20x13-bit limbs split into 40x(7/6-bit) int8 limbs, the whole
   batched limb-product tensor  S[u,v] = sum_j E8[u,j] * W8[v,j]  is ONE
   (40,T)x(T,40) int8 matmul with int32 accumulation -- T*1600 MACs on the
   MXU replacing T Montgomery multiplies + adds on the VPU.  The 40x40
   result folds into field form with O(1) work (117 scalar mont_muls).

2. `toeplitz-bind`: the bind step  out = lo + r*(hi - lo)  multiplies T
   elements by ONE scalar r.  As limbs this is a constant 40x40 Toeplitz
   int8 matrix applied to the (40,T) int8 limb matrix -- again one MXU
   matmul, products accumulate over <=40 terms (fits int32 trivially).

Run on the real TPU chip:  python experiments/mxu_limb_bench.py
Honest timing: chained in-jit loops + device_get forcing (axon relay).
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache_tpu")

LOG_T = 20
T = 1 << LOG_T
LOOPS = 8


def _rand_i8_limbs(rng, n):
    """(40, n) int8: alternating 7-bit / 6-bit halves of 13-bit limbs."""
    lo = rng.integers(0, 1 << 7, size=(20, n), dtype=np.int32)
    hi = rng.integers(0, 1 << 6, size=(20, n), dtype=np.int32)
    out = np.empty((40, n), dtype=np.int8)
    out[0::2] = lo.astype(np.int8)
    out[1::2] = hi.astype(np.int8)
    return out


def bench(fn, args, loops=LOOPS, reps=5):
    out = fn(*args)          # compile
    jax.device_get(jax.tree.leaves(out)[0])
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.device_get(jax.tree.leaves(out)[0])
        best = min(best, (time.perf_counter() - t0) / loops)
    return best


def main():
    rng = np.random.default_rng(0)
    E8 = jnp.asarray(_rand_i8_limbs(rng, T))
    W8 = jnp.asarray(_rand_i8_limbs(rng, T))
    R8 = jnp.asarray(rng.integers(0, 127, size=(40, 40), dtype=np.int8))

    # ---- 1. dot-reduce: (40,T)x(T,40) int8 -> int32 ----------------------
    @jax.jit
    def dot_reduce(e, w):
        def body(i, acc):
            # vary nothing (same flops); chained dependency via acc
            m = jax.lax.dot_general(
                e, w, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.int32)
            return acc + m
        return jax.lax.fori_loop(0, LOOPS, body, jnp.zeros((40, 40), jnp.int32))

    dt = bench(dot_reduce, (E8, W8))
    rate = T / dt
    print(f"dot-reduce:    {dt*1e3:8.3f} ms/loop  -> {rate/1e9:8.3f} G mont-mul-equiv/s")

    # ---- 2. toeplitz-bind: (40,40)x(40,T) int8 -> int32 -------------------
    @jax.jit
    def toeplitz_bind(r, x):
        def body(i, acc):
            m = jax.lax.dot_general(
                r, acc.astype(jnp.int8), (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
            return m
        return jax.lax.fori_loop(0, LOOPS, body,
                                 x.astype(jnp.int32))

    dt = bench(toeplitz_bind, (R8, W8))
    rate = T / dt
    print(f"toeplitz-bind: {dt*1e3:8.3f} ms/loop  -> {rate/1e9:8.3f} G mont-mul-equiv/s")

    # ---- 3. current VPU tier reference: elementwise mont_mul -------------
    from jolt_tpu.field import FR, ops

    A = jnp.asarray(rng.integers(0, 1 << 13, size=(20, T), dtype=np.uint32))
    B = jnp.asarray(rng.integers(0, 1 << 13, size=(20, T), dtype=np.uint32))

    @jax.jit
    def vpu_mul(a, b):
        def body(i, acc):
            return ops.mont_mul(acc, b, FR)
        return jax.lax.fori_loop(0, LOOPS, body, a)

    dt = bench(vpu_mul, (A, B))
    rate = T / dt
    print(f"vpu mont_mul:  {dt*1e3:8.3f} ms/loop  -> {rate/1e9:8.3f} G mont-mul/s")

    # ---- 4. pallas fused tier reference ----------------------------------
    try:
        from jolt_tpu.field import pallas_ops

        @jax.jit
        def pallas_mul(a, b):
            def body(i, acc):
                return pallas_ops.mont_mul(acc, b)
            return jax.lax.fori_loop(0, LOOPS, body, a)

        dt = bench(pallas_mul, (A, B))
        rate = T / dt
        print(f"pallas mul:    {dt*1e3:8.3f} ms/loop  -> {rate/1e9:8.3f} G mont-mul/s")
    except Exception as e:
        print("pallas tier skipped:", e)


if __name__ == "__main__":
    main()
