"""Measure host->device and device->host bandwidth + dispatch latency on
the axon tunnel.  Run when the chip is otherwise idle.

The scan stages upload per-round gather-schedule stacks (tens of MB per
stage per prove); if the tunnel moves ~10 MB/s those uploads, not TPU
compute, set the e2e prove time.  This experiment pins the number."""
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache_tpu")


def main():
    dev = jax.devices()[0]
    print("device:", dev)

    # dispatch latency: tiny transfer round-trip
    small = np.zeros(16, np.uint32)
    for _ in range(3):
        t0 = time.perf_counter()
        x = jax.device_put(small, dev)
        np.asarray(x)
        print(f"  16B round-trip: {(time.perf_counter() - t0) * 1e3:.1f} ms")

    for mb in (8, 64, 256):
        a = np.random.randint(0, 1 << 30, size=(mb * 1024 * 1024 // 8,),
                              dtype=np.int64)
        t0 = time.perf_counter()
        x = jax.device_put(a, dev)
        x.block_until_ready()
        up = time.perf_counter() - t0
        t0 = time.perf_counter()
        np.asarray(x)
        down = time.perf_counter() - t0
        print(f"  {mb:4d} MB: up {mb / up:7.1f} MB/s ({up:.2f}s)   "
              f"down {mb / down:7.1f} MB/s ({down:.2f}s)", flush=True)


if __name__ == "__main__":
    main()
