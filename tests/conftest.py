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

# XLA:CPU leaks ~15k small mmaps per prover stage (JIT code + buffer
# regions); the kernel default vm.max_map_count=65530 then fails mmap with
# ENOMEM ("LLVM compilation error: Cannot allocate memory") and segfaults
# mid-prove.  Raise it when we can (root in the build/test containers).
try:
    with open("/proc/sys/vm/max_map_count") as _f:
        if int(_f.read()) < 1 << 21:
            with open("/proc/sys/vm/max_map_count", "w") as _g:
                _g.write(str(1 << 22))
except OSError:
    pass

import jax

jax.config.update("jax_platforms", "cpu")
# Persistent compile cache: the unrolled limb-arithmetic graphs are large
# (a Montgomery mul is ~1300 uint32 primitives) and recompile identically
# across test runs.  The cache is machine-specific: XLA:CPU AOT artifacts
# compiled on another host can SIGILL here, so fingerprint the CPU and wipe
# a stale cache (build hosts change between rounds).
import hashlib
import shutil

_CACHE = "/root/repo/.jax_cache"
try:
    with open("/proc/cpuinfo") as f:
        _flags = [ln for ln in f if ln.startswith("flags")][0]
    _fp = hashlib.sha256(_flags.encode()).hexdigest()[:16]
except (OSError, IndexError):
    _fp = "unknown"
_fp_file = os.path.join(_CACHE, "HOST_FINGERPRINT")
if os.path.isdir(_CACHE):
    try:
        old = open(_fp_file).read()
    except OSError:
        old = ""
    if old != _fp:
        shutil.rmtree(_CACHE, ignore_errors=True)
os.makedirs(_CACHE, exist_ok=True)
with open(_fp_file, "w") as f:
    f.write(_fp)
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import random

import pytest

# Fused (device-transcript) sumcheck stages compile one large unrolled
# graph per stage shape -- worthwhile on the TPU (compiled once, reused
# every prove) but a compile-time explosion across the suite's many tiny
# trace shapes.  Default the suite to the host engine; the fused path is
# covered by tests/test_fused_prove.py (which flips this back on) and is
# byte-identity-checked against the host transcript inside prove_fused
# itself.
os.environ.setdefault("JOLT_TPU_FUSE", "0")


@pytest.fixture
def rng():
    return random.Random(1337)


# ---------------------------------------------------------------------------
# two-tier suite: modules below are the slow pipeline tier (full PCS e2e,
# zk, sharded, streaming, fuzz, large-trace scale runs).  pytest.ini
# defaults to `-m "not slow"`; run the slow tier with `pytest -m slow`.
# ---------------------------------------------------------------------------

SLOW_MODULES = {
    "test_full_pipeline_dory", "test_full_pipeline_pcs",
    "test_sharded_prove", "test_zk_prove", "test_advice",
    "test_streaming", "test_scale", "test_fuzz", "test_expanded_prove",
    "test_sha256_guest", "test_keccak_inline", "test_inlines",
    "test_rv64ac", "test_naive_oracle", "test_fused_prove",
    "test_fs_audit", "test_sweep", "test_instruction_read_raf",
    "test_scan_fused",
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        if item.module.__name__ in SLOW_MODULES:
            item.add_marker(pytest.mark.slow)
