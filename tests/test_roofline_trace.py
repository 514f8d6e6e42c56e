"""Unit test for the trace-analysis tooling (benchmarks/roofline_trace.py and
benchmarks/profile_infer.device_breakdown) on a synthetic profiler trace.

The real inputs are jax.profiler traces from TPU runs; here we fabricate a
minimal trace.json.gz with the same event schema and check the aggregation
(per-op achieved FLOP/s + bytes/s, category totals, C_out bucketing).
"""

import gzip
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "benchmarks"))


def _write_trace(tmp_path):
    events = [
        # two executions of one conv fusion: 2 ms each, 1 GFLOP, 1 MB
        *[
            {
                "ph": "X",
                "ts": 1000.0 * i,
                "dur": 2000.0,  # us
                "name": "fusion.1",
                "args": {
                    "hlo_category": "convolution fusion",
                    "model_flops": str(10**9),
                    "bytes_accessed": str(2**20),
                    "shape_with_layout": "bf16[8,16,16,64]{0,3,2,1:T(8,128)(2,1)}",
                    "tf_op": "jit(fwd)/Model/enc/conv_general_dilated:",
                },
            }
            for i in range(2)
        ],
        # a non-conv event that must be counted by category but not per-op
        {
            "ph": "X",
            "ts": 9000.0,
            "dur": 500.0,
            "name": "copy.3",
            "args": {"hlo_category": "data formatting"},
        },
        # an event with no category: ignored everywhere
        {"ph": "X", "ts": 9900.0, "dur": 100.0, "name": "noise"},
    ]
    d = tmp_path / "plugins" / "profile" / "run"
    d.mkdir(parents=True)
    with gzip.open(d / "host.trace.json.gz", "wt") as fh:
        json.dump({"traceEvents": events}, fh)
    return tmp_path


def test_device_breakdown(tmp_path):
    from profile_infer import device_breakdown

    trace_dir = _write_trace(tmp_path)
    by = device_breakdown(str(trace_dir))
    assert by["convolution fusion"] == 4000.0
    assert by["data formatting"] == 500.0
    assert set(by) == {"convolution fusion", "data formatting"}


def test_roofline_trace_cli(tmp_path):
    trace_dir = _write_trace(tmp_path)
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "benchmarks", "roofline_trace.py"), str(trace_dir)],
        capture_output=True,
        text=True,
        timeout=120,
    )
    assert out.returncode == 0, out.stderr
    # 1 GFLOP / 2 ms = 0.5 TFLOP/s; 1 MiB / 2 ms = 0.52 GB/s; batch-minor dim0=8
    assert "0.5" in out.stdout
    assert "dim0=8" in out.stdout
    assert "C_out=   64" in out.stdout
    # total conv time over the trace = 4 ms
    assert "4.0 ms (100%)" in out.stdout
