"""Convert a reference (PyTorch) checkpoint into a vfi_tpu snapshot.

The upstream project distributes pretrained snapshots (fetched by its
bashes/download/download_model_checkpoints.bash) saved as torch pickles:
``{'updates', 'sum_avg_psnr_err', 'sum_avg_ssim_err', 'generator':
state_dict, 'optimizer_G': ...}`` (src/environments/environments.py:178-194).
This tool maps the generator weights onto the matching vfi_tpu flax model
(NCHW->NHWC + deconv-kernel flips, see vfi_tpu/utils/torch_import.py) and
writes a snapshot that ``cli/predict.py --snapshot_file_name`` loads
directly — the bridge for reproducing quant_tables_orig with this framework.

Usage:
    python cli/import_torch_checkpoint.py CKPT --model_key TAI_gray \\
        --dest_dir checkpoints/kth_tai_imported [--snapshot_file_name model_best.ckpt]

Accepts either a full snapshot dict or a bare generator state_dict (.pth).
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))

from vfi_tpu.utils.jax_setup import setup_jax

setup_jax()

import jax
import numpy as np


def load_torch_pickle(path: str):
    """Load a torch checkpoint saved by the (python2) reference."""
    import torch

    try:
        return torch.load(path, map_location="cpu", weights_only=False, encoding="latin1")
    except TypeError:  # older torch without weights_only
        return torch.load(path, map_location="cpu", encoding="latin1")


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__, formatter_class=argparse.RawDescriptionHelpFormatter)
    ap.add_argument("checkpoint", help="path to the reference .ckpt / .pth file")
    ap.add_argument("--model_key", required=True, help="vfi_tpu registry key (e.g. TAI_gray) or JSON literal")
    ap.add_argument("--dest_dir", required=True, help="directory to write the snapshot into")
    ap.add_argument("--snapshot_file_name", default="model_best.ckpt")
    ap.add_argument("--image_size", type=int, nargs="+", default=[128],
                    help="resolution used only for the structural shape check")
    ap.add_argument("--df_dim", type=int, default=64,
                    help="discriminator feature width (needed to unflatten the "
                         "SN linear head when the checkpoint has a discriminator)")
    args = ap.parse_args(argv)

    from vfi_tpu.models.registry import create_model
    from vfi_tpu.train.environments import TrainState
    from vfi_tpu.utils import checkpoint as ckpt
    from vfi_tpu.utils.torch_import import import_generator_state_dict, model_kind_for_key

    payload = load_torch_pickle(args.checkpoint)
    if "generator" in payload:
        sd = payload["generator"]
        counters = {
            "updates": int(payload.get("updates", 0)),
            "sum_avg_psnr_err": float(payload.get("sum_avg_psnr_err", 0.0)),
            "sum_avg_ssim_err": float(payload.get("sum_avg_ssim_err", 0.0)),
        }
    else:  # bare state_dict
        sd = payload
        counters = {"updates": 0, "sum_avg_psnr_err": 0.0, "sum_avg_ssim_err": 0.0}
    sd = {k: np.asarray(v) for k, v in sd.items()}

    model = create_model(args.model_key)
    kind = model_kind_for_key(
        args.model_key if not args.model_key.strip().startswith("{") else type(model).__name__
    )
    num_block = getattr(model, "num_block", 5)
    layers = getattr(model, "layers", 3)
    params, report = import_generator_state_dict(sd, kind, num_block=num_block, layers=layers)
    print(f"import: {report}")

    # Structural gate: the imported tree must match a fresh init exactly.
    h = args.image_size[0]
    w = args.image_size[-1]
    c = getattr(model, "c_dim", 1)
    shape = jax.ShapeDtypeStruct((1, 2, h, w, c), np.float32)
    template = jax.eval_shape(
        lambda p, f: model.init(jax.random.PRNGKey(0), 2, p, f), shape, shape
    )["params"]
    want = jax.tree_util.tree_flatten_with_path(template)[0]
    got = jax.tree_util.tree_flatten_with_path(params)[0]
    want_keys = ["/".join(str(k.key) for k in path) for path, _ in want]
    got_keys = ["/".join(str(k.key) for k in path) for path, _ in got]
    if want_keys != got_keys:
        missing = sorted(set(want_keys) - set(got_keys))
        extra = sorted(set(got_keys) - set(want_keys))
        raise SystemExit(f"tree mismatch: missing={missing} extra={extra}")
    for (path, g), (_, t) in zip(got, want):
        if g.shape != t.shape:
            raise SystemExit(f"shape mismatch at {path}: got {g.shape}, model wants {t.shape}")

    # Training checkpoints also carry the discriminator (environments.py:178-194);
    # import it so GAN training can resume (optimizers restart — Adam moments
    # are not carried over).
    d_params = d_sn = None
    if "discriminator" in payload:
        from vfi_tpu.utils.torch_import import import_discriminator_state_dict

        dsd = {k: np.asarray(v) for k, v in payload["discriminator"].items()}
        d_params, d_sn, d_report = import_discriminator_state_dict(dsd, args.df_dim)
        print(f"discriminator import: {d_report}")

    state = TrainState(step=np.asarray(counters["updates"], np.int32), g_params=params, g_opt=None,
                       d_params=d_params, d_sn=d_sn)
    ckpt.save_snapshot(args.dest_dir, args.snapshot_file_name, state, counters)
    print(f"wrote {os.path.join(args.dest_dir, args.snapshot_file_name)} "
          f"({sum(int(np.prod(v.shape)) for _, v in got)} params, updates={counters['updates']})")


if __name__ == "__main__":
    main()
