#!/usr/bin/env python
"""A/B the predict.py serving pipeline depth (VFI_INFLIGHT) on the real chip.

cli/predict.py keeps up to VFI_INFLIGHT dispatched batches in flight before
blocking on the oldest (depth 1 = the old synchronous loop: dispatch ->
device_get -> PNG write per batch).  Depth >= 2 overlaps batch N's D2H fetch
and host PNG encoding with batch N+1's H2D + device compute.  This measures
the end-to-end CLI serving throughput at each depth, alternating depths
across repeats (process-level runs drift; alternation shows the gap vs the
drift).

Each leg is a fresh cli/predict.py process (bf16 + --device_normalize, the
serving recipe) over the same synthetic 128-squared grating clips; the parsed
number is predict.py's own loop line ("predicted N clips in X s"), which
excludes model build/import but includes the batch-1 compile (warm
compilation cache makes that seconds and identical across legs).

Run: python benchmarks/ab_inflight.py [--clips 96] [--batch 8] [--repeats 3]
"""

import argparse
import json
import os
import re
import subprocess
import sys

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "scripts"))

MODEL_KEY = ('{"class": "TAIFillInModel", "args": [], "kwargs": '
             '{"gf_dim": 64, "c_dim": 1, "ks": 51, "num_block": 5, "kf_dim": 32}}')


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--clips", type=int, default=96)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--depths", default="1,2")
    ap.add_argument("--work", default="/tmp/ab_inflight")
    ap.add_argument("--ckpt", default="/tmp/q_full/ckpt",
                    help="checkpoint dir from scripts/quality_probe_fullsize.py")
    opt = ap.parse_args()

    from quality_probe_fullsize import make_dataset

    test_list = make_dataset(os.path.join(opt.work, "clips"), opt.clips, seed=5)
    depths = [int(d) for d in opt.depths.split(",")]

    times = {d: [] for d in depths}
    for rep in range(opt.repeats):
        for d in depths:
            env = {**os.environ, "VFI_INFLIGHT": str(d)}
            r = subprocess.run(
                [sys.executable, os.path.join(REPO, "cli", "predict.py"),
                 "--K", "5", "--T", "5", "--F", "5", "--c_dim", "1",
                 "--image_size", "128", "--batch_size", str(opt.batch),
                 "--model_key", MODEL_KEY, "--name", "probe",
                 "--checkpoints_dir", opt.ckpt,
                 "--snapshot_file_name", "model_latest.ckpt",
                 "--test_video_list_path", test_list,
                 "--qual_result_root", os.path.join(opt.work, f"qual_{d}"),
                 "--dtype", "bfloat16", "--device_normalize"],
                cwd=REPO, env=env, capture_output=True, text=True, timeout=3600)
            if r.returncode != 0:
                sys.exit(f"depth {d} failed:\n{r.stdout[-2000:]}\n{r.stderr[-2000:]}")
            m = re.search(r"predicted (\d+) clips in ([\d.]+) s", r.stdout)
            assert m and int(m.group(1)) == opt.clips, r.stdout[-500:]
            secs = float(m.group(2))
            times[d].append(secs)
            print(f"rep {rep} depth {d}: {secs:.2f} s "
                  f"({opt.clips / secs:.2f} clips/s)", flush=True)

    out = {"clips": opt.clips, "batch": opt.batch,
           "seconds": {str(d): times[d] for d in depths},
           "median_clips_per_s": {str(d): round(opt.clips / sorted(times[d])[len(times[d]) // 2], 2)
                                   for d in depths}}
    print(json.dumps(out))


if __name__ == "__main__":
    main()
