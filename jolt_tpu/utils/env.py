"""Host-environment guards shared by the CLI, bench, and test harness."""

from __future__ import annotations


def ensure_map_count(target: int = 1 << 22) -> None:
    """Raise vm.max_map_count when possible (root containers).

    XLA:CPU leaks ~15k small mmaps per prover stage (JIT code + buffer
    regions); the kernel default 65530 then fails mmap with ENOMEM ("LLVM
    compilation error: Cannot allocate memory") and the process segfaults
    mid-prove.  No-op when already raised or not writable.
    """
    try:
        with open("/proc/sys/vm/max_map_count") as f:
            if int(f.read()) >= target // 2:
                return
        with open("/proc/sys/vm/max_map_count", "w") as f:
            f.write(str(target))
    except (OSError, ValueError):
        pass
