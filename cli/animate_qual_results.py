#!/usr/bin/env python
"""Per-clip GIF generation (reference animate_qual_results.py CLI)."""

import argparse
import multiprocessing
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from vfi_tpu.utils.jax_setup import setup_jax

setup_jax()

from vfi_tpu.eval.animate import animate_clip_folder
from vfi_tpu.eval.quant import get_folder_paths_at_depth


def _job(args):
    path, fps, create_gt = args
    animate_clip_folder(path, fps=fps, create_gt_gif=create_gt)


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("qual_results_root", type=str)
    p.add_argument("--depth", type=int, default=1)
    p.add_argument("--num_workers", type=int, default=multiprocessing.cpu_count())
    p.add_argument("--fps", type=int, default=3)
    p.add_argument("--create_gt_gif", action="store_true")
    p.add_argument("--high_quality", action="store_true", help="accepted for CLI parity (no-op)")
    args = p.parse_args(argv)

    roots = get_folder_paths_at_depth(args.qual_results_root, args.depth)
    if not roots:
        print("Failed to find any qualitative results. Quitting...")
        return
    print("Now animating qualitative results...")
    jobs = [(r, args.fps, args.create_gt_gif) for r in roots]
    if args.num_workers > 1 and len(jobs) > 1:
        with multiprocessing.Pool(args.num_workers) as pool:
            list(pool.imap_unordered(_job, jobs))
    else:
        for j in jobs:
            _job(j)
    print("Done animating qualitative results.")


if __name__ == "__main__":
    main()
