#!/usr/bin/env python
"""Side-by-side model comparison figures and videos.

Reference: compare_visual_results.py — PDF grids with optional zoom-region
insets plus stacked comparison videos.  fpdf/moviepy are unavailable in this
image; PDFs are rendered with matplotlib and videos with imageio (same
artifacts, same CLI surface).

Layout: one row per source (GT + each experiment), one column per displayed
frame; context frames bordered green, generated frames red; optional zoom
crop rendered under each frame.
"""

import argparse
import os
import sys

import numpy as np
from PIL import Image

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from vfi_tpu.eval.animate import draw_border, files_matching, labeled_stack_frame, write_gif


def _frame_sequence(clip_dir, pred=True):
    """Returns [(name, kind)] covering preceding/middle/following in order."""
    seq = []
    for pattern, kind in (
        (r"gt_preceding_[0-9]+\.png", "context"),
        (r"pred_middle_[0-9]+\.png" if pred else r"gt_middle_[0-9]+\.png", "generated"),
        (r"gt_following_[0-9]+\.png", "context"),
    ):
        seq += [(os.path.basename(f), kind) for f in files_matching(clip_dir, pattern)]
    return seq


def create_pdf(clip_name, gt_dir, exp_dirs, exp_labels, dest_path, zoom=None, frame_skip=1):
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    rows = [("GT", gt_dir, False)] + [(lbl, d, True) for lbl, d in zip(exp_labels, exp_dirs)]
    seq = _frame_sequence(gt_dir, pred=False)[::frame_skip]
    ncols = len(seq) * (2 if zoom else 1) if False else len(seq)
    nrows = len(rows) * (2 if zoom else 1)

    fig, axes = plt.subplots(nrows, ncols, figsize=(1.1 * ncols, 1.2 * nrows), squeeze=False)
    for r, (label, d, is_pred) in enumerate(rows):
        row_seq = _frame_sequence(d, pred=is_pred)[::frame_skip]
        for c, (name, kind) in enumerate(row_seq[:ncols]):
            img = Image.open(os.path.join(d, name))
            img = draw_border(img, "lime" if kind == "context" else "red")
            rr = r * (2 if zoom else 1)
            ax = axes[rr][c]
            ax.imshow(np.asarray(img), cmap="gray")
            ax.set_xticks([])
            ax.set_yticks([])
            if c == 0:
                ax.set_ylabel(label, fontsize=7)
            if zoom:
                x0, y0, w, h = zoom
                crop = np.asarray(img)[y0 : y0 + h, x0 : x0 + w]
                zax = axes[rr + 1][c]
                zax.imshow(crop, cmap="gray")
                zax.set_xticks([])
                zax.set_yticks([])
    fig.suptitle(clip_name, fontsize=8)
    fig.tight_layout()
    fig.savefig(dest_path, bbox_inches="tight")
    plt.close(fig)


def create_video(clip_name, exp_dirs, exp_labels, dest_path, fps=3):
    first = exp_dirs[0]
    out_frames = []
    for pattern, color, per_exp in (
        (r"gt_preceding_[0-9]+\.png", "lime", False),
        (r"pred_middle_[0-9]+\.png", "red", True),
        (r"gt_following_[0-9]+\.png", "lime", False),
    ):
        for f in files_matching(first, pattern):
            name = os.path.basename(f)
            if per_exp:
                frames = [Image.open(os.path.join(d, name)) for d in exp_dirs]
            else:
                frames = [Image.open(f)] * len(exp_dirs)
            out_frames.append(labeled_stack_frame(frames, exp_labels, color))
    write_gif(out_frames, dest_path, fps)


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--results_root", type=str, required=True)
    p.add_argument("--exp_names", type=str, nargs="+", required=True)
    p.add_argument("--exp_labels", type=str, nargs="+", default=None)
    p.add_argument("--clip_names", type=str, nargs="+", required=True)
    p.add_argument("--save_root", type=str, required=True)
    p.add_argument("--mode", type=str, choices=["pdf", "video", "both"], default="both")
    p.add_argument("--zoom", type=int, nargs=4, default=None, metavar=("X", "Y", "W", "H"),
                   help="zoom-inset crop region")
    p.add_argument("--frame_skip", type=int, default=1)
    p.add_argument("--fps", type=int, default=3)
    args = p.parse_args(argv)

    labels = args.exp_labels or args.exp_names
    os.makedirs(args.save_root, exist_ok=True)
    for clip in args.clip_names:
        dirs = [os.path.join(args.results_root, "images", e, clip) for e in args.exp_names]
        if args.mode in ("pdf", "both"):
            create_pdf(clip, dirs[0], dirs, labels, os.path.join(args.save_root, f"{clip}.pdf"),
                       zoom=args.zoom, frame_skip=args.frame_skip)
        if args.mode in ("video", "both"):
            create_video(clip, dirs, labels, os.path.join(args.save_root, f"{clip}.gif"), args.fps)
        print(f"processed {clip}")


if __name__ == "__main__":
    main()
