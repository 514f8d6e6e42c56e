#!/usr/bin/env python
"""PDFs of forward/backward predictions and pre-blend interpolation-net
outputs (reference compare_intermediate_preds.py; requires predict.py to have
run with --intermediate_preds)."""

import argparse
import os
import sys

import numpy as np
from PIL import Image

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from vfi_tpu.eval.animate import draw_border, files_matching

ROWS = [
    ("GT middle", r"gt_middle_[0-9]+\.png"),
    ("final pred", r"pred_middle_[0-9]+\.png"),
    ("forward pred", r"pred_middle_forward_[0-9]+\.png"),
    ("backward pred", r"pred_middle_backward_[0-9]+\.png"),
    ("interp out 1", r"interp_net_outputs_1_[0-9]+\.png"),
    ("interp out 2", r"interp_net_outputs_2_[0-9]+\.png"),
]


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--results_root", type=str, required=True)
    p.add_argument("--exp_name", type=str, required=True)
    p.add_argument("--clip_names", type=str, nargs="+", required=True)
    p.add_argument("--save_root", type=str, required=True)
    args = p.parse_args(argv)

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    os.makedirs(args.save_root, exist_ok=True)
    for clip in args.clip_names:
        d = os.path.join(args.results_root, "images", args.exp_name, clip)
        rows = [(lbl, files_matching(d, pat)) for lbl, pat in ROWS]
        rows = [(lbl, fs) for lbl, fs in rows if fs]
        ncols = max(len(fs) for _, fs in rows)
        fig, axes = plt.subplots(len(rows), ncols, figsize=(1.1 * ncols, 1.2 * len(rows)), squeeze=False)
        for r, (lbl, fs) in enumerate(rows):
            for c in range(ncols):
                ax = axes[r][c]
                ax.set_xticks([])
                ax.set_yticks([])
                if c < len(fs):
                    img = draw_border(Image.open(fs[c]), "red" if "pred" in lbl or "interp" in lbl else "lime")
                    ax.imshow(np.asarray(img), cmap="gray")
                if c == 0:
                    ax.set_ylabel(lbl, fontsize=7)
        fig.suptitle(clip, fontsize=8)
        fig.tight_layout()
        out = os.path.join(args.save_root, f"{clip}_intermediate.pdf")
        fig.savefig(out, bbox_inches="tight")
        plt.close(fig)
        print(f"wrote {out}")


if __name__ == "__main__":
    main()
