#!/usr/bin/env python
"""4-panel PSNR/SSIM-vs-timestep paper figure across models and two T settings
(reference generate_unified_avg_plot_fig.py)."""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def _cm2in(x):
    return x / 2.54


def _draw_avg(ax, table, label):
    avg = table.mean(axis=0)
    stderr = table.std(axis=0) / np.sqrt(table.shape[0])
    x = np.arange(1, len(avg) + 1)
    ax.plot(x, avg, marker="d", markersize=2, linewidth=0.7, label=label)
    # two standard errors ~ 95% of variation (ref summarize :40-47)
    ax.fill_between(x, avg - 2 * stderr, avg + 2 * stderr, alpha=0.2)


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--results_root", type=str, default="results")
    p.add_argument("--dest_path", type=str, required=True)
    p.add_argument("--dataset", type=str, required=True)
    p.add_argument("--T_a", type=int, required=True)
    p.add_argument("--T_b", type=int, required=True)
    p.add_argument("--exp_names", type=str, nargs="+", required=True)
    p.add_argument("--model_labels", type=str, nargs="+", required=True)
    p.add_argument("--psnr_range", type=float, nargs=2, required=True)
    p.add_argument("--ssim_range", type=float, nargs=2, required=True)
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

    fig = plt.figure(figsize=(_cm2in(18.2), _cm2in(4)))
    panels = [
        ("psnr", args.T_a, [0.06, 0.25, 0.13, 0.68], "PSNR", args.psnr_range, True),
        ("psnr", args.T_b, [0.22, 0.25, 0.18, 0.68], None, args.psnr_range, False),
        ("ssim", args.T_a, [0.50, 0.25, 0.13, 0.68], "SSIM", args.ssim_range, True),
        ("ssim", args.T_b, [0.66, 0.25, 0.18, 0.68], None, args.ssim_range, False),
    ]
    last_ax = None
    for metric, T, pos, ylabel, rng, label_left in panels:
        ax = fig.add_subplot(111, label=f"{metric}{T}{pos[0]}")
        ax.set_position(pos)
        ax.set_xlabel(f"Time step (m={T})")
        if ylabel:
            ax.set_ylabel(ylabel)
        ax.axis([1, T, rng[0], rng[1]])
        if not label_left:
            ax.tick_params(axis="y", labelleft=False)
        for exp, label in zip(args.exp_names, args.model_labels):
            path = template.format(dataset=args.dataset, T=T, exp=exp)
            table = np.load(path)[metric]
            if metric == "psnr":
                table = np.minimum(table, 100)
            _draw_avg(ax, table, label)
        last_ax = ax
    last_ax.legend(loc="center", bbox_to_anchor=(1.46, 0.5))

    os.makedirs(os.path.dirname(args.dest_path) or ".", exist_ok=True)
    plt.savefig(args.dest_path)
    print(f"wrote {args.dest_path}")


if __name__ == "__main__":
    main()
