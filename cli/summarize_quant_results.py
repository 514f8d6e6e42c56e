#!/usr/bin/env python
"""Summaries/plots/tables over results.npz files.

Reference CLI: summarize_quant_results.py with 5 subcommands —
avg_metric_plot, video_metric_text_file, sorted_metric_plot, metric_box_plot,
metric_summary_text_file (the one that regenerates quant_tables_orig/*.txt).
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from vfi_tpu.utils.jax_setup import setup_jax

setup_jax()

from vfi_tpu.eval.quant import load_all_tables, metric_summary_rows, video_scores
from vfi_tpu.eval.tables import render_table

COMMON = dict(
    quant_results_roots=dict(type=str, nargs="+", required=True),
    labels=dict(type=str, nargs="+", default=None),
    dest_path=dict(type=str, required=True),
    metric=dict(type=str, default="psnr", choices=["psnr", "ssim"]),
    summary_method=dict(type=str, default="mean", choices=["mean", "min"]),
    T=dict(type=int, default=None),
    range=dict(type=float, nargs="+", default=None),
    fig_size=dict(type=float, nargs="+", default=None),
    title=dict(type=str, default=None),
    mean_precision=dict(type=int, default=2),
    std_err_precision=dict(type=int, default=3),
)


def _add(sub, *keys):
    for k in keys:
        sub.add_argument(f"--{k}", **COMMON[k])


def main(argv=None):
    parser = argparse.ArgumentParser()
    subs = parser.add_subparsers(dest="command")
    _add(subs.add_parser("avg_metric_plot"), "quant_results_roots", "labels", "T", "range", "fig_size",
         "dest_path", "title", "metric")
    _add(subs.add_parser("video_metric_text_file"), "quant_results_roots", "labels", "dest_path", "metric",
         "summary_method")
    _add(subs.add_parser("sorted_metric_plot"), "quant_results_roots", "labels", "dest_path", "metric", "range",
         "fig_size", "title", "summary_method")
    _add(subs.add_parser("metric_box_plot"), "quant_results_roots", "labels", "dest_path", "metric", "range",
         "fig_size", "title", "summary_method")
    _add(subs.add_parser("metric_summary_text_file"), "quant_results_roots", "labels", "dest_path", "metric",
         "mean_precision", "std_err_precision")
    args, _ = parser.parse_known_args(argv)

    labels = args.labels or [None] * len(args.quant_results_roots)
    assert len(labels) == len(args.quant_results_roots)
    pairs = list(zip(args.quant_results_roots, labels))
    os.makedirs(args.dest_path, exist_ok=True)
    tables = load_all_tables(args.quant_results_roots)

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    plt.rcParams["font.family"] = "serif"

    if args.command == "avg_metric_plot":
        fig, ax = plt.subplots(figsize=(2.2, 2.5) if args.fig_size is None else args.fig_size)
        T = args.T or next(iter(tables[args.metric].values())).shape[1]
        for root, label in pairs:
            table = tables[args.metric][root]
            avg = table.mean(axis=0)
            stderr = table.std(axis=0) / np.sqrt(table.shape[0])
            x = np.arange(1, len(avg) + 1)
            ax.plot(x, avg, marker="d", markersize=2, linewidth=0.7, label=label)
            # two standard errors ~ 95% of variation (ref summarize :40-47)
            ax.fill_between(x, avg - 2 * stderr, avg + 2 * stderr, alpha=0.2)
        ax.set_xlabel("time steps")
        ax.set_ylabel(args.metric.upper())
        if args.range is not None:
            ax.axis([1, T, args.range[0], args.range[1]])
        if args.title:
            ax.set_title(args.title)
        ax.grid(True, linewidth=0.2)
        if any(l for _, l in pairs):
            ax.legend(ncol=2, loc="upper center", bbox_to_anchor=(0.31, -0.33), fontsize=5)
        fig.savefig(os.path.join(args.dest_path, f"{args.metric}_final.pdf"), bbox_inches="tight")
        fig.savefig(os.path.join(args.dest_path, f"{args.metric}_final.png"), bbox_inches="tight")

    elif args.command == "video_metric_text_file":
        out_path = os.path.join(args.dest_path, f"sorted_{args.metric}_scores.txt")
        with open(out_path, "w") as f:
            for root, label in pairs:
                scores = video_scores(tables["videos"][root], tables[args.metric][root], args.summary_method)
                if label is not None:
                    f.write(f"{label}:\n")
                for v, s in scores:
                    f.write(f"{v}, {s}\n")
                f.write("\n")

    elif args.command == "sorted_metric_plot":
        fig, ax = plt.subplots()
        for root, label in pairs:
            scores = [s for _, s in video_scores(tables["videos"][root], tables[args.metric][root],
                                                 args.summary_method)]
            ax.plot(scores, label=label)
        ax.set_xlabel("Video rank")
        ax.set_ylabel(f"{args.metric.upper()} score ({args.summary_method})")
        if args.title:
            ax.set_title(args.title)
        if any(l for _, l in pairs):
            ax.legend()
        fig.savefig(os.path.join(args.dest_path, f"sorted_{args.metric}_scores.png"))
        fig.savefig(os.path.join(args.dest_path, f"sorted_{args.metric}_scores.pdf"))

    elif args.command == "metric_box_plot":
        fig, ax = plt.subplots(figsize=(2.2, 2.0) if args.fig_size is None else args.fig_size)
        data, tick_labels = [], []
        for root, label in pairs:
            data.append([s for _, s in video_scores(tables["videos"][root], tables[args.metric][root],
                                                    args.summary_method)])
            tick_labels.append(label or root)
        ax.boxplot(data, vert=False, tick_labels=tick_labels, flierprops=dict(markersize=1))
        ax.set_xlabel(f"{args.metric.upper()} ({args.summary_method})")
        if args.range is not None:
            ax.set_xlim(args.range[0], args.range[1])
        if args.title:
            ax.set_title(args.title)
        fig.savefig(os.path.join(args.dest_path, f"boxplot_{args.metric}_scores.png"), bbox_inches="tight")
        fig.savefig(os.path.join(args.dest_path, f"boxplot_{args.metric}_scores.pdf"), bbox_inches="tight")

    elif args.command == "metric_summary_text_file":
        rows = metric_summary_rows(tables, pairs, args.metric, args.mean_precision, args.std_err_precision)
        out = render_table(["Model", "Mean", "StdErr"], rows)
        with open(os.path.join(args.dest_path, f"{args.metric}_perf_summary.txt"), "w") as f:
            f.write(out)
    else:
        parser.error("missing subcommand")


if __name__ == "__main__":
    main()
