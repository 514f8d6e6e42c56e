"""Paper-artifact CLI tests: compare_visual_results (grid, one-middle-frame,
videos), compare_intermediate_preds (both subcommands), and the 4-panel
unified boxplot — the surfaces exercised by scripts/evaluation/paper/."""

import os
import subprocess
import sys

import numpy as np
import pytest
from PIL import Image

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, REPO)

K, T, F, H, W = 2, 2, 2, 24, 32
DATASET = "KTH-test_data_list_T=2"
EXPS = ["expA", "expB", "expC"]
CLIP = "person01_boxing_d1.avi_1-6"


@pytest.fixture(scope="module")
def results_tree(tmp_path_factory):
    root = tmp_path_factory.mktemp("results")
    rng = np.random.RandomState(0)
    for exp in EXPS:
        d = root / DATASET / "images" / exp / CLIP
        d.mkdir(parents=True)
        names = (
            [f"gt_preceding_{t:04d}.png" for t in range(K)]
            + [f"gt_middle_{t:04d}.png" for t in range(K, K + T)]
            + [f"pred_middle_{t:04d}.png" for t in range(K, K + T)]
            + [f"gt_following_{t:04d}.png" for t in range(K + T, K + T + F)]
            + [f"pred_middle_forward_{t:04d}.png" for t in range(K, K + T)]
            + [f"pred_middle_backward_{t:04d}.png" for t in range(K, K + T)]
            + [f"interp_net_outputs_1_{t:04d}.png" for t in range(K, K + T)]
            + [f"interp_net_outputs_2_{t:04d}.png" for t in range(K, K + T)]
        )
        for n in names:
            Image.fromarray(rng.randint(0, 255, (H, W, 3), np.uint8)).save(d / n)
    return str(root)


def test_compare_visual_results_pdf_grid_with_zoom(results_tree, tmp_path):
    from cli.compare_visual_results import main

    dest = str(tmp_path / "figs")
    main([
        "--results_root", results_tree, "--dataset_name", DATASET,
        "--clip_names", CLIP, "--exp_names", *EXPS[:2],
        "--model_labels", "Model A", "Model B",
        "--frame_indexes", "0", "2", "4", "--dest_path", dest,
        "--pdf_zoom_region", ".2", ".2", ".6", ".6",
        "--pdf_zoom_window_position", "0", "0", ".5", ".5",
    ])
    out = os.path.join(dest, f"{CLIP}.pdf")
    assert os.path.isfile(out) and os.path.getsize(out) > 1000


def test_compare_visual_results_one_middle_frame(results_tree, tmp_path):
    from cli.compare_visual_results import main

    dest = str(tmp_path / "omf")
    main([
        "--results_root", results_tree, "--dataset_name", DATASET,
        "--clip_names", CLIP, "--exp_names", *EXPS,
        "--model_labels", "A", "B", "C",
        "--frame_indexes", "1", "2", "4", "--dest_path", dest,
        "--pdf_zoom_region", ".2", ".2", ".6", ".6",
        "--pdf_zoom_window_position", "0", "0", ".5", ".5",
        "--pdf_one_middle_frame",
    ])
    assert os.path.isfile(os.path.join(dest, f"{CLIP}.pdf"))


def test_compare_visual_results_one_middle_frame_requires_zoom(results_tree, tmp_path):
    from cli.compare_visual_results import main

    with pytest.raises(ValueError, match="zoom"):
        main([
            "--results_root", results_tree, "--dataset_name", DATASET,
            "--clip_names", CLIP, "--exp_names", *EXPS,
            "--frame_indexes", "1", "2", "4",
            "--dest_path", str(tmp_path / "x"), "--pdf_one_middle_frame",
        ])


@pytest.mark.parametrize("video_type,artifact", [
    ("gif", "video.gif"),
    ("mp4", "video.mp4"),
    ("images", "00.jpg"),
    ("images-uncomp", os.path.join("video_frames", "00.png")),
])
def test_compare_visual_results_videos(results_tree, tmp_path, video_type, artifact):
    from cli.compare_visual_results import main

    dest = str(tmp_path / video_type)
    main([
        "--results_root", results_tree, "--dataset_name", DATASET,
        "--clip_names", CLIP, "--exp_names", *EXPS[:2],
        "--total_num_frames", str(K + T + F), "--dest_path", dest,
        "--no_pdf", "--video_type", video_type,
    ])
    out = os.path.join(dest, artifact)
    assert os.path.isfile(out) and os.path.getsize(out) > 0


@pytest.mark.parametrize("command", ["bidirectional_pred", "interp_net_pred"])
def test_compare_intermediate_preds_layouts(results_tree, tmp_path, command):
    from cli.compare_intermediate_preds import main

    dest = str(tmp_path / command)
    main([
        "--results_root", results_tree, "--dataset_name", DATASET,
        "--clip_names", CLIP, "--exp_names", *EXPS[:2],
        "--model_labels", "A", "B", "--ts", "2", "3",
        "--pdf_zoom_region", ".1", ".1", ".9", ".9",
        "--dest_path", dest, command,
    ])
    # reference output layout: <dest>/<clip>/<t:02d>.pdf
    for t in (2, 3):
        out = os.path.join(dest, CLIP, f"{t:02d}.pdf")
        assert os.path.isfile(out) and os.path.getsize(out) > 500


def test_unified_boxplot_four_panels(tmp_path):
    from cli.generate_unified_boxplot_fig import main

    rng = np.random.RandomState(1)
    for Tm in (3, 5):
        for exp in ("m1", "m2"):
            d = tmp_path / f"KTH-test_data_list_T={Tm}" / "quantitative" / exp
            d.mkdir(parents=True)
            np.savez(d / "results.npz",
                     psnr=rng.uniform(20, 40, (6, Tm)),
                     ssim=rng.uniform(0.7, 1.0, (6, Tm)),
                     video=np.array([f"v{i}" for i in range(6)]))
    dest = str(tmp_path / "boxplot.pdf")
    main([
        "--results_root", str(tmp_path), "--dest_path", dest,
        "--dataset", "KTH", "--T_a", "3", "--T_b", "5",
        "--exp_names", "m1", "m2", "--model_labels", "Model 1", "Model 2",
        "--psnr_range", "20", "44", "--ssim_range", ".6", "1",
    ])
    assert os.path.isfile(dest) and os.path.getsize(dest) > 1000


def test_check_quant_tables_script(tmp_path):
    gen = tmp_path / "gen"
    orig = tmp_path / "orig"
    gen.mkdir(); orig.mkdir()
    (orig / "a.txt").write_text("same\n")
    (gen / "a.txt").write_text("same\n")
    script = os.path.join(REPO, "scripts", "evaluation", "paper", "check_quant_tables.sh")
    r = subprocess.run(["bash", script, str(gen), str(orig)], capture_output=True, text=True)
    assert r.returncode == 0 and "1 match" in r.stdout
    (gen / "a.txt").write_text("different\n")
    r = subprocess.run(["bash", script, str(gen), str(orig)], capture_output=True, text=True)
    assert r.returncode != 0 and "DIFFERS" in r.stdout
