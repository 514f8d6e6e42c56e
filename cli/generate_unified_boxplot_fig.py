#!/usr/bin/env python
"""Per-video boxplot paper figure across models/datasets
(reference generate_unified_boxplot_fig.py)."""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--results_root", type=str, default="results")
    p.add_argument("--dest_path", type=str, required=True)
    p.add_argument("--dataset", type=str, required=True)
    p.add_argument("--T", type=int, required=True)
    p.add_argument("--exp_names", type=str, nargs="+", required=True)
    p.add_argument("--model_labels", type=str, nargs="+", required=True)
    p.add_argument("--metric", type=str, choices=["psnr", "ssim"], default="ssim")
    p.add_argument("--range", type=float, nargs=2, default=None)
    args = p.parse_args(argv)
    assert len(args.exp_names) == len(args.model_labels)

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    plt.rcParams["font.family"] = "serif"
    plt.rcParams["font.size"] = 7

    template = os.path.join(
        args.results_root, "{dataset}-test_data_list_T={T}", "quantitative", "{exp}", "results.npz"
    )
    data, labels = [], []
    for exp, label in zip(args.exp_names, args.model_labels):
        table = np.load(template.format(dataset=args.dataset, T=args.T, exp=exp))[args.metric]
        if args.metric == "psnr":
            table = np.minimum(table, 100)
        data.append(table.mean(axis=1))
        labels.append(label)

    fig, ax = plt.subplots(figsize=(4, 2.2))
    ax.boxplot(data, vert=False, tick_labels=labels, flierprops=dict(markersize=1))
    ax.set_xlabel(args.metric.upper())
    if args.range:
        ax.set_xlim(*args.range)
    os.makedirs(os.path.dirname(args.dest_path) or ".", exist_ok=True)
    fig.savefig(args.dest_path, bbox_inches="tight")
    print(f"wrote {args.dest_path}")


if __name__ == "__main__":
    main()
