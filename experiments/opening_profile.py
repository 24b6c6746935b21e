"""Standalone host-side profile of the stage-8 Dory RLC opening.

The joint opening (prover/prover.py stage8-openings) is pure HOST work:
native C++ pairing / G1-fold / mod-r kernels plus Python glue.  A
CPU-platform run therefore reproduces the TPU bench's `s8-opening`
stage cost exactly, without touching the TPU or the XLA compile cache.

Shape mirrors the 2^18 sha2-chain bench: num_vars=26 (nu=10, sigma=16),
T=2^18 positions per one-hot part, ~NPOLY opened commitments.  Hint rows
reuse the setup's own generators (fold/pairing cost is data-independent).

Run:  JAX_PLATFORMS=cpu python experiments/opening_profile.py
Env:  NPOLY=90  T_LOG=18
"""

import os
import sys
import time

os.environ.setdefault("JOLT_TPU_PROFILE", "1")
os.environ.setdefault("JAX_PLATFORMS", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

from jolt_tpu.pcs.dory import DoryHint, DorySetup  # noqa: E402
from jolt_tpu.pcs.scheme import DoryScheme  # noqa: E402
from jolt_tpu.transcript.blake2b import Blake2bTranscript  # noqa: E402
from jolt_tpu.utils.profiling import active  # noqa: E402

T = 1 << int(os.environ.get("T_LOG", "18"))
NPOLY = int(os.environ.get("NPOLY", "90"))


def main():
    t0 = time.perf_counter()
    setup = DorySetup.generate(26)
    print(f"setup loaded: nu={setup.nu} sigma={setup.sigma} "
          f"({time.perf_counter() - t0:.1f}s)")
    sch = DoryScheme(setup)
    nrows = 1 << setup.nu

    rng = np.random.default_rng(0)
    row = list(setup.gamma1[:nrows])
    weights = {}
    parts = []
    for i in range(NPOLY):
        name = f"p{i}"
        sch._hints[name] = DoryHint(rows=row)
        w = int(rng.integers(1, 1 << 62))
        weights[name] = w
        parts.append((rng.integers(0, 1 << 26, size=T).astype(np.int64),
                      w, None))
    point = [int(x) for x in rng.integers(1, 1 << 60, size=26)]

    tr = Blake2bTranscript(b"profile")
    t0 = time.perf_counter()
    sch.open_rlc(weights, parts, point, 0, tr)
    wall = time.perf_counter() - t0

    prof = active()
    tracked = 0.0
    for name in ("open.rlc_rows", "open.e1", "open.A.v2init", "open.A.pair",
                 "open.A.g1fold", "open.A.g2fold", "open.B.row",
                 "open.B.msm", "open.B.g1fold"):
        t = prof.total(name)
        tracked += t
        print(f"{name:18s} {t:7.2f}s")
    print(f"{'(untracked)':18s} {wall - tracked:7.2f}s")
    print(f"{'TOTAL open_rlc':18s} {wall:7.2f}s")


if __name__ == "__main__":
    main()
