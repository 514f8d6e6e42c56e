#!/usr/bin/env python
"""Measure the REAL torch-CPU baseline for bench.py's vs_baseline multiplier.

VERDICT r2 item 3: the round-1/2 headline multiplier was measured against this
framework's own XLA-CPU build — a self-referential proxy.  The honest
denominator is the reference implementation itself.  The PyTorch-0.3/Python-2.7
stack cannot run in this image, but `tests/torch_mirror.py` is a faithful
modern-torch re-implementation of the reference bi-TAI forward
(src/models/tai/tai.py:52-120 semantics, verified by the importer parity gates
and PARITY_r03), so timing it on one CPU core is the closest runnable stand-in
— and modern torch is, if anything, FASTER than the 0.3-era original.

Appends {"torch_cpu_fps": ..., "torch_sec_per_batch1": ...} into
benchmarks/cpu_baseline.json (keeping the XLA proxy fields).

Usage: python benchmarks/bench_torch_cpu.py [iters]
"""

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
CACHE = os.path.join(REPO, "benchmarks", "cpu_baseline.json")

K = T = F = 5
H = W = 128


def measure(iters=3, warmup=1):
    import numpy as np
    import torch

    torch.set_num_threads(1)
    from tests import torch_mirror

    torch.manual_seed(0)
    tm = torch_mirror.TAIFillInModel(64, 1, 3, 51, num_block=5, kf_dim=32, layers=3)
    tm.eval()
    rng = np.random.RandomState(0)
    p = torch.tensor(rng.uniform(-1, 1, (1, K, 1, H, W)).astype(np.float32))
    f = torch.tensor(rng.uniform(-1, 1, (1, F, 1, H, W)).astype(np.float32))
    with torch.no_grad():
        for _ in range(warmup):
            tm(T, p, f)
        t0 = time.perf_counter()
        for _ in range(iters):
            tm(T, p, f)
        dt = (time.perf_counter() - t0) / iters
    return T / dt, dt


def main():
    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    fps, dt = measure(iters)
    data = {}
    if os.path.isfile(CACHE):
        with open(CACHE) as fh:
            data = json.load(fh)
    data["torch_cpu_fps"] = fps
    data["torch_sec_per_batch1"] = dt
    with open(CACHE, "w") as fh:
        json.dump(data, fh)
    print(json.dumps({"metric": "bi-TAI KTH128 torch-CPU 1-core reference",
                      "value": round(fps, 4), "unit": "frames/sec",
                      "sec_per_batch1": round(dt, 2)}))


if __name__ == "__main__":
    main()
