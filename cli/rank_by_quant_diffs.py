#!/usr/bin/env python
"""Per-video metric difference between two results.npz, sorted ascending
(reference rank_by_quant_diffs.py: positive = model 1 better)."""

import argparse
import os

import numpy as np
from scipy.stats.mstats import gmean

SUMMARY = {"mean": np.mean, "total": np.sum, "geometric_mean": gmean}


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("results_file_path_1", type=str)
    p.add_argument("results_file_path_2", type=str)
    p.add_argument("--metric", type=str, choices=["psnr", "ssim"], default="ssim")
    p.add_argument("--summary_method", type=str, choices=list(SUMMARY), default="mean")
    args = p.parse_args(argv)

    t1, t2 = np.load(args.results_file_path_1), np.load(args.results_file_path_2)
    names1 = [os.path.basename(str(v)) for v in t1["video"]]
    names2 = [os.path.basename(str(v)) for v in t2["video"]]
    assert len(names1) == len(names2) and sorted(names1) == sorted(names2)

    fn = SUMMARY[args.summary_method]
    s1 = dict(zip(names1, fn(t1[args.metric], axis=1)))
    s2 = dict(zip(names2, fn(t2[args.metric], axis=1)))
    diffs = sorted(((s1[k] - s2[k], k) for k in s1))
    for _, name in diffs:
        print(name)


if __name__ == "__main__":
    main()
