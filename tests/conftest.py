"""Test configuration: force an 8-device virtual CPU mesh.

The session environment pins JAX_PLATFORMS=axon (a remote single-TPU tunnel
with ~4ms/op dispatch latency) and sitecustomize imports jax at interpreter
startup, so env vars alone are too late.  jax.config.update still works, and
XLA_FLAGS is read lazily at first CPU-client instantiation.

Multi-chip sharding (pjit/shard_map over a Mesh) is validated on these 8
virtual CPU devices, per the reference's mode-equivalence methodology
(single-chip vs multi-chip proofs must be byte-identical; SURVEY.md §4.9).
"""
import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
).strip()

import jax

jax.config.update("jax_platforms", "cpu")
# Persistent compile cache: the unrolled limb-arithmetic graphs are large
# (a Montgomery mul is ~1300 uint32 primitives) and recompile identically
# across test runs.
os.makedirs("/root/repo/.jax_cache", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import random

import pytest


@pytest.fixture
def rng():
    return random.Random(1337)
