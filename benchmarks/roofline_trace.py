#!/usr/bin/env python
"""Per-op roofline analysis of a jax.profiler trace (round 3).

Reads the newest *.trace.json.gz under the given trace dir (as written by
benchmarks/profile_infer.py / --profile_steps) and prints, per conv-fusion op:
achieved TFLOP/s and GB/s, % of the v5e rooflines, the output shape+layout,
and the flax call site — then aggregates conv time by output-channel width.

This is how the B=32 serving dip was finally attributed (round 3): XLA lays
out the C_out=64 convs BATCH-minor (lanes = folded batch, channels on
sublanes), so lane occupancy on those ops is (fold·B mod 128)/128 — the
doubled-batch bi-TAI rollout at B=32 runs them at 2B=64 → 50% lanes, while
B=48 runs 2B=96 → 75%.  The "C_out=64 => half the output lanes idle"
story in docs/PERFORMANCE.md was the wrong mechanism: XLA already sidesteps
it with the batch-minor layout; what it cannot sidestep is a batch fold that
is not a multiple of 128.

Usage: python benchmarks/roofline_trace.py /tmp/vfi_profile_infer_b48 [top_n]
"""

import glob
import gzip
import json
import re
import sys
from collections import defaultdict

PEAK_TFLOPS = 197.0  # v5e bf16
PEAK_GBS = 819.0  # v5e HBM


def load_events(trace_dir):
    paths = glob.glob(f"{trace_dir}/**/*.trace.json.gz", recursive=True)
    if not paths:
        raise SystemExit(f"no trace under {trace_dir}")
    with gzip.open(max(paths, key=lambda p: p), "rt") as fh:
        return json.load(fh).get("traceEvents", [])


def main():
    trace_dir = sys.argv[1]
    top_n = int(sys.argv[2]) if len(sys.argv) > 2 else 25

    agg = {}
    iters = defaultdict(int)
    for ev in load_events(trace_dir):
        if ev.get("ph") != "X" or "dur" not in ev:
            continue
        a = ev.get("args") or {}
        if a.get("hlo_category") != "convolution fusion":
            continue
        name = ev["name"]
        r = agg.setdefault(
            name,
            dict(
                dur=0.0,
                n=0,
                flops=int(a.get("model_flops", 0) or 0),
                bytes=int(a.get("bytes_accessed", 0) or 0),
                shape=a.get("shape_with_layout", ""),
                op=a.get("tf_op", ""),
            ),
        )
        r["dur"] += ev["dur"]
        r["n"] += 1

    rows = []
    for name, r in agg.items():
        per_s = r["dur"] / r["n"] / 1e6
        tf = r["flops"] / per_s / 1e12 if per_s else 0.0
        gb = r["bytes"] / per_s / 1e9 if per_s else 0.0
        m = re.search(r"\[([\d,]+)\]", r["shape"])
        dims = m.group(1).split(",") if m else []
        cout = dims[-1] if dims else "?"
        # physical minormost dim = first entry of the layout braces
        lm = re.search(r"\{(\d+)", r["shape"].split(":")[0][len(r["shape"].split("{")[0]):] or "")
        minor = None
        lay = re.search(r"\{([\d,]+)", r["shape"])
        if lay and dims:
            minor_dim = int(lay.group(1).split(",")[0])
            minor = f"dim{minor_dim}={dims[minor_dim]}" if minor_dim < len(dims) else "?"
        short_op = r["op"].rstrip(":").split("/")
        site = "/".join(short_op[-3:-1]) if len(short_op) > 2 else r["op"]
        rows.append((r["dur"] / 1e3, name, per_s * 1e3, tf, gb, cout, minor, site))
    rows.sort(reverse=True)

    print(
        f"{'tot_ms':>7} {'ms/ex':>6} {'TFLOP/s':>8} {'GB/s':>6} {'%MXU':>5} "
        f"{'%HBM':>5} {'Cout':>4} {'lane(minor)dim':>16}  op"
    )
    for tot, name, ms, tf, gb, cout, minor, site in rows[:top_n]:
        print(
            f"{tot:7.1f} {ms:6.2f} {tf:8.1f} {gb:6.0f} {tf / PEAK_TFLOPS * 100:5.1f} "
            f"{gb / PEAK_GBS * 100:5.1f} {cout:>4} {str(minor):>16}  {site} ({name})"
        )

    by_cout = defaultdict(float)
    for tot, _, _, _, _, cout, _, _ in rows:
        by_cout[cout] += tot
    total = sum(by_cout.values()) or 1.0
    print("\nconv-fusion time by C_out (ms over the whole trace):")
    for c, v in sorted(by_cout.items(), key=lambda kv: -kv[1]):
        print(f"  C_out={c:>5}: {v:8.1f} ms ({v / total * 100:.0f}%)")


if __name__ == "__main__":
    main()
