"""Benchmark sweep harness: calibration accuracy + artifact layout
(profile.rs:199-330 analog)."""
import json
import os

from jolt_tpu.eval.sweep import WORKLOADS, calibrate, run_sweep


def test_calibration_hits_target():
    """Calibrated fib iteration count lands within 2x of the target size
    (affine-scaling accuracy; padding rounds up to the next pow2)."""
    n, layout = calibrate("fib", 11, native=False)
    from jolt_tpu.eval.sweep import _fib_src, _trace
    tr = _trace(_fib_src, n, layout, native=False)
    assert (1 << 10) <= tr.length <= (1 << 12)


def test_sweep_artifacts(tmp_path):
    summary = run_sweep(["fib"], 9, 10, pcs=None, out_dir=str(tmp_path),
                        native=False)
    run_dir = summary["run_dir"]
    assert summary["points"] == 2
    assert summary["best_khz"] > 0
    lines = open(os.path.join(run_dir, "sweep.jsonl")).read().splitlines()
    assert len(lines) == 2
    rec = json.loads(lines[0])
    assert rec["workload"] == "fib" and rec["target_log2"] == 9
    assert rec["cycles"] > 0 and rec["prove_s"] > 0
    assert rec["proof_bytes"] and rec["proof_bytes"] > 1000
    s = json.load(open(os.path.join(run_dir, "summary.json")))
    assert s["summary"]["points"] == 2


def test_workload_registry_defaults():
    # per-workload default scales mirror the reference (fib 16, sha2 22)
    assert WORKLOADS["fib"][2] == 16
    assert WORKLOADS["sha2-chain"][2] == 22
