#!/usr/bin/env python
"""Host data-pipeline throughput vs the chip's consumption rate (VERDICT r4
item 5 / Weak #5).

Every device-side serving/training number assumes the host can feed the chip;
this measures the feed rate.  Clip sources are PNG frame directories at the
datasets' native source resolutions (KTH 160x120, UCF-class 320x240 — the
post-extraction ingest format of the reference, base_dataset.py:130-140),
decoded + resized + normalized to the serving shapes through:

  * the pure-Python path (cv2 imread -> resize -> aug -> normalize,
    vfi_tpu/data/datasets.py), 1 worker and a --threads thread pool;
  * the native C++ loader (native/vfidata.cpp: libpng/libjpeg decode +
    bilinear resize + normalize on a GIL-free thread pool), per-batch.

Prints one JSON dict with clips/s per configuration plus the cores-per-chip
implied by the measured device rates (bench.py / CLAUDE.md):
KTH serving B=64 bf16 1149.6 f/s = 229.9 clips/s (T=5); KTH training B=8 bf16
157 ms/step = 51.0 clips/s; wide serving B=16 bf16 137 f/s = 45.7 clips/s
(T=3); wide training B=4 bf16 351 ms/step = 11.4 clips/s.

Run: python benchmarks/bench_loader.py [--clips 24] [--reps 3] [--threads 4]
(CPU-only; safe to run without the TPU.)
"""

import argparse
import json
import os
import sys
import tempfile
import time

import numpy as np

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, REPO)

# Device-side consumption rates (measured; see module docstring).
CHIP_RATES = {
    "kth_serving_B64_bf16": 1149.6 / 5,
    "kth_training_B8_bf16": 8 / 0.157,
    "wide_serving_B16_bf16": 137.0 / 3,
    "wide_training_B4_bf16": 4 / 0.351,
}


def make_png_clips(root: str, n_clips: int, n_frames: int, w: int, h: int, seed: int):
    """Frame-directory clips of busy (JPEG/PNG-expensive) content."""
    import cv2

    rng = np.random.RandomState(seed)
    lines = []
    for i in range(n_clips):
        d = os.path.join(root, f"clip{i:03d}")
        os.makedirs(d, exist_ok=True)
        base = rng.randint(0, 255, (h, w, 3), np.uint8)
        for t in range(n_frames):
            img = np.roll(base, shift=3 * t, axis=1)
            cv2.imwrite(os.path.join(d, f"frame_{t:04d}.png"), img)
        lines.append(f"{d} 1-{n_frames}")
    list_path = os.path.join(root, "list.txt")
    with open(list_path, "w") as f:
        f.write("\n".join(lines) + "\n")
    return list_path


def time_python_path(ds, n_items: int, num_workers: int) -> float:
    from vfi_tpu.data.datasets import batch_iterator

    ds.use_native = False
    it = batch_iterator(ds, 4, False, False, loop=True, num_workers=num_workers)
    next(it)  # warm caches outside the timed window
    t0 = time.perf_counter()
    done = 0
    while done < n_items:
        done += len(next(it)["clip_label"])
    return done / (time.perf_counter() - t0)


def time_native_path(ds, n_items: int, n_threads: int) -> float:
    from vfi_tpu.data import native_loader

    if not native_loader.available():
        return float("nan")
    from vfi_tpu.data.datasets import _VideoReader

    clips = []
    for line in ds.files:
        vid = _VideoReader(line.split()[0])
        clips.append([vid._frame_paths[t] for t in range(ds.seq_len)])
    B = 4
    native_loader.load_clip_batch(clips[:B], ds.image_size, ds.c_dim,
                                  ds.padding_size, n_threads=n_threads)  # warm
    t0 = time.perf_counter()
    done = 0
    while done < n_items:
        batch = clips[done % len(clips):][:B]
        if len(batch) < B:
            batch = (batch + clips)[:B]
        native_loader.load_clip_batch(batch, ds.image_size, ds.c_dim,
                                      ds.padding_size, n_threads=n_threads)
        done += B
    return done / (time.perf_counter() - t0)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--clips", type=int, default=24)
    ap.add_argument("--items", type=int, default=48, help="clips timed per config")
    ap.add_argument("--threads", type=int, default=4)
    ap.add_argument("--work", type=str, default=None)
    opt = ap.parse_args()

    from vfi_tpu.data.datasets import ContiguousVideoClipDataset

    work = opt.work or tempfile.mkdtemp(prefix="vfi_loader_bench_")
    shapes = {
        # serving shape, (src_w, src_h), c_dim, image_size, seq_len
        "kth_gray_128": ((160, 120), 1, [128, 128], 15),
        "wide_color_256x320": ((320, 240), 3, [256, 320], 10),
    }
    results = {"host": f"{os.cpu_count()} cores"}
    for name, ((sw, sh), c_dim, image_size, seq_len) in shapes.items():
        root = os.path.join(work, name)
        os.makedirs(root, exist_ok=True)
        vl = make_png_clips(root, opt.clips, seq_len + 1, sw, sh, seed=7)
        ds = ContiguousVideoClipDataset(c_dim, vl, seq_len, False, False,
                                        image_size, False, [0, 0], "")
        row = {}
        row["python_1w"] = round(time_python_path(ds, opt.items, 0), 2)
        row[f"python_{opt.threads}w"] = round(
            time_python_path(ds, opt.items, opt.threads), 2)
        ds.use_native = True
        row["native_1t"] = round(time_native_path(ds, opt.items, 1), 2)
        row[f"native_{opt.threads}t"] = round(
            time_native_path(ds, opt.items, opt.threads), 2)
        results[name] = row
        print(name, json.dumps(row), flush=True)

    # Cores-per-chip at the measured per-core rate (native 1-thread).
    sizing = {}
    for chip_key, clip_rate in CHIP_RATES.items():
        shape = "kth_gray_128" if chip_key.startswith("kth") else "wide_color_256x320"
        per_core = results[shape]["native_1t"]
        if per_core == per_core and per_core > 0:
            sizing[chip_key] = {
                "chip_clips_per_s": round(clip_rate, 1),
                "loader_clips_per_s_per_core": per_core,
                "cores_per_chip": round(clip_rate / per_core, 1),
            }
    results["host_sizing"] = sizing
    print(json.dumps(results, indent=1))
    out = os.path.join(REPO, "benchmarks", "loader_throughput.json")
    with open(out, "w") as fh:
        json.dump(results, fh, indent=1)
    print("written to", out)


if __name__ == "__main__":
    main()
