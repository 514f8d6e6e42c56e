"""Options / flag system with reference-compatible surface.

Flag names, defaults and semantics mirror src/options/options.py:6-209.  The
reference composes flags from files by `cat default_args extra_args | strip
comments` in bashes/experiments/train.sh:6-10; we support the same files
natively via argparse's ``@file`` syntax with '#'-comment stripping, so

    python cli/train.py @exp_args/default_args/KTH/train.txt @exp_args/extra_args/KTH/TAI.txt

reproduces `train.sh <default> <extra>` (later flags override earlier ones).
"""

from __future__ import annotations

import argparse
import shlex
import sys
from dataclasses import dataclass
from typing import Optional, Sequence


class ArgFileParser(argparse.ArgumentParser):
    def __init__(self, *a, **kw):
        kw.setdefault("fromfile_prefix_chars", "@")
        kw.setdefault("formatter_class", argparse.ArgumentDefaultsHelpFormatter)
        super().__init__(*a, **kw)

    def convert_arg_line_to_args(self, line: str):
        line = line.split("#", 1)[0].strip()
        return shlex.split(line)


def _add_base_args(p: argparse.ArgumentParser, for_train: bool):
    g = p.add_argument_group("Experiment parameters")
    g.add_argument("--name", type=str, default="experiment_name")

    g = p.add_argument_group("Model input/output parameters")
    g.add_argument("--K", type=int, required=True, help="Length of the preceding sequence")
    g.add_argument("--T", type=int, required=True, help="Length of the middle sequence")
    g.add_argument("--F", type=int, required=True, help="Length of the following sequence")
    g.add_argument("--batch_size", type=int, default=4)
    g.add_argument("--image_size", type=int, nargs="+", default=[128], help="H [W]")
    g.add_argument("--padding_size", type=int, nargs="+", default=[0], help="pad_bottom [pad_right]")
    g.add_argument("--c_dim", type=int, default=3)

    g = p.add_argument_group("Model specification parameters")
    g.add_argument("--model_key", type=str, required=True)

    g = p.add_argument_group("Directory parameters")
    g.add_argument("--checkpoints_dir", type=str, default="checkpoints")

    g = p.add_argument_group("Common data loading parameters")
    g.add_argument("--num_threads", type=int, default=2)
    g.add_argument("--data_root", type=str, default="", help="Prefix for videolist paths")


def build_train_parser() -> ArgFileParser:
    p = ArgFileParser(description="vfi_tpu training")
    _add_base_args(p, True)

    g = p.add_argument_group("Optimization parameters")
    g.add_argument("--lr", type=float, default=1e-4)
    g.add_argument("--beta1", type=float, default=0.5)
    g.add_argument("--max_iter", type=int, default=100000)

    g = p.add_argument_group("Loss parameters")
    g.add_argument("--alpha", type=float, default=1.0)
    g.add_argument("--beta", type=float, default=0.02)

    g = p.add_argument_group("Training frequency parameters")
    g.add_argument("--print_freq", type=int, default=100)
    g.add_argument("--save_latest_freq", type=int, default=1000)
    g.add_argument("--validate_freq", type=int, default=10000)

    g = p.add_argument_group("Adversarial training parameters")
    g.add_argument("--df_dim", type=int, default=64)
    g.add_argument("--Ip", type=int, default=3)
    g.add_argument("--disc_window_size", type=int, default=3)

    g = p.add_argument_group("Training data loading parameters")
    g.add_argument("--alt_K", type=int, required=True)
    g.add_argument("--alt_T", type=int, required=True)
    g.add_argument("--alt_F", type=int, required=True)
    g.add_argument("--train_video_list_path", type=str, required=True)
    g.add_argument("--val_video_list_path", type=str, required=True)
    g.add_argument("--val_video_list_alt_T_path", type=str, default=None)
    g.add_argument("--val_video_list_alt_K_F_path", type=str, default=None)
    g.add_argument("--vis_video_list_path", type=str, default=None)
    g.add_argument("--vis_video_list_alt_T_path", type=str, default=None)
    g.add_argument("--vis_video_list_alt_K_F_path", type=str, default=None)
    g.add_argument("--serial_batches", action="store_true")
    g.add_argument("--no_backwards", action="store_true")
    g.add_argument("--no_flip", action="store_true")
    g.add_argument("--sample_KTF", action="store_true")

    g = p.add_argument_group("Transformer network training parameters")
    g.add_argument("--tf_p_min", type=float, default=0.0)
    g.add_argument("--tf_p_max", type=float, default=0.0)
    g.add_argument("--tf_offset", type=float, default=100000)
    g.add_argument("--tf_decay", type=float, default=20000)

    g = p.add_argument_group("SloMo network training parameters")
    g.add_argument("--lambda_r", type=float, default=0.8)
    g.add_argument("--lambda_p", type=float, default=0.005)
    g.add_argument("--lambda_w", type=float, default=0.4)
    g.add_argument("--lambda_s", type=float, default=1.0)
    g.add_argument("--lr_decay_count", type=int, default=40000)
    g.add_argument("--lr_decay_rate", type=float, default=0.1)
    g.add_argument("--vgg16_weights", type=str, default=None,
                   help="Path to a VGG16-features .npz for the SloMo perceptual loss "
                        "(the torchvision download of the reference is unavailable offline; "
                        "convert once with cli/convert_vgg16.py). Required whenever "
                        "lambda_p > 0 — SloMo training hard-errors without it.")

    g = p.add_argument_group("Training visualization parameters")
    g.add_argument("--tensorboard_dir", type=str, default="tb")

    g = p.add_argument_group("TPU parameters")
    g.add_argument("--seed", type=int, default=0)
    g.add_argument("--mesh_shape", type=int, nargs="+", default=None,
                   help="Device mesh shape, e.g. '8' for pure data parallel; default = all devices on one axis")
    g.add_argument("--profile_steps", type=int, nargs=2, default=None, metavar=("START", "STOP"),
                   help="Capture a jax.profiler trace between these iterations")
    g.add_argument("--profile_dir", type=str, default="/tmp/vfi_tpu_trace")
    g.add_argument("--device_normalize", action="store_true",
                   help="Ship uint8 batches to the device and normalize there "
                        "(4x less host->device traffic)")
    g.add_argument("--train_dtype", type=str, default="float32", choices=["float32", "bfloat16"],
                   help="Mixed-precision training: f32 params/optimizer, bf16 forward/backward")
    g.add_argument("--remat", action="store_true",
                   help="Gradient-checkpoint the MC-Net rollout submodules "
                        "(~33%% recompute for O(1) rollout activation memory)")
    g.add_argument("--device_cache", type=int, default=0, metavar="N",
                   help="Prefetch N training batches and keep them device-resident, "
                        "cycling through them in fixed order (data echoing). Removes "
                        "the per-iteration host->device upload — intended for hosts "
                        "whose link cannot sustain the step rate (e.g. the dev "
                        "tunnel) and for soak runs on small synthetic datasets; "
                        "with a real dataset this trains on only N distinct batches.")
    g.add_argument("--log_json", type=str, default=None, metavar="PATH",
                   help="Append machine-readable JSON lines (iteration timing, "
                        "losses, validation metrics, checkpoint/resume events) to "
                        "PATH; main process only")

    return p


def build_test_parser() -> ArgFileParser:
    p = ArgFileParser(description="vfi_tpu inference")
    _add_base_args(p, False)
    g = p.add_argument_group("Test data loading parameters")
    g.add_argument("--test_video_list_path", type=str, required=True)
    g.add_argument("--disjoint_clips", action="store_true")
    g = p.add_argument_group("Snapshot parameters")
    g.add_argument("--snapshot_file_name", type=str, default="model_best.ckpt")
    g = p.add_argument_group("Qualitative result destination parameters")
    g.add_argument("--qual_result_root", type=str, required=True)
    g = p.add_argument_group("Output parameters")
    g.add_argument("--intermediate_preds", action="store_true")
    g = p.add_argument_group("TPU parameters")
    g.add_argument("--dtype", type=str, default="float32", choices=["float32", "bfloat16"],
                   help="Inference dtype (bfloat16 is ~1.3x faster on TPU)")
    g.add_argument("--quantize", type=str, default="none",
                   choices=["none", "int8", "int8_dynamic"],
                   help="int8 conv serving mode (nn/quant.py): 'int8' = static "
                        "calibrated scales (fastest, +5%% over bf16; calibrated "
                        "on --calib_clips clips), 'int8_dynamic' = per-batch "
                        "scales (slower than bf16; diagnostic). Numerics change; "
                        "validate per-checkpoint via compute_quant_results.")
    g.add_argument("--calib_clips", type=int, default=8,
                   help="clips used to calibrate --quantize int8 activation scales")
    g.add_argument("--validate_quant", type=int, default=None, metavar="N",
                   help="Score N clips f32-vs-quantized on device before serving "
                        "and refuse to proceed if the quantized checkpoint degrades "
                        "beyond --quant_tol_db (default: 4 clips whenever --quantize "
                        "is active; 0 disables). Costs one extra compile of the "
                        "unquantized program (cached across runs).")
    g.add_argument("--quant_tol_db", type=float, default=0.5,
                   help="Max tolerated PSNR-vs-GT drop (dB) of the quantized path "
                        "relative to f32 in the --validate_quant check; without GT "
                        "(disjoint clips) the gate is 30 dB f32-vs-quantized "
                        "prediction agreement")
    g.add_argument("--force_quant", action="store_true",
                   help="Proceed past a failed --validate_quant gate (prints the "
                        "measured deltas either way)")
    g.add_argument("--device_normalize", action="store_true",
                   help="Ship uint8 batches to the device and normalize there "
                        "(4x less host->device traffic; same flag as train.py)")
    g.add_argument("--no_pad_final_batch", action="store_true",
                   help="Run the ragged final batch at its own (smaller) shape "
                        "instead of padding it to --batch_size. Padding keeps "
                        "the whole run on ONE compiled program (a new batch "
                        "shape is a fresh full-size XLA compile, minutes cold) "
                        "and on the sharded multi-chip path; padded rows are "
                        "never written.")
    g.add_argument("--profile_steps", type=int, nargs=2, default=None, metavar=("START", "STOP"),
                   help="Capture a jax.profiler trace between these prediction batches "
                        "(1-based, half-open; analyze with benchmarks/roofline_trace.py)")
    g.add_argument("--profile_dir", type=str, default="/tmp/vfi_tpu_trace")
    return p


def normalize_sizes(opt) -> None:
    """1-or-2-value normalization for image_size/padding_size (options.py:54-58)."""
    if len(opt.image_size) == 1:
        opt.image_size = [opt.image_size[0], opt.image_size[0]]
    if len(opt.padding_size) == 1:
        opt.padding_size = [opt.padding_size[0], opt.padding_size[0]]


def parse_args(parser: ArgFileParser, argv: Optional[Sequence[str]] = None, allow_unknown: bool = False):
    if allow_unknown:
        opt, unknown = parser.parse_known_args(argv)
        if unknown:
            print(f"Ignored arguments: {unknown}")
    else:
        opt = parser.parse_args(argv)
    normalize_sizes(opt)
    return opt


@dataclass(frozen=True)
class TrainConfig:
    """The static training hyper-parameters consumed by environments.

    Frozen/hashable so environments can be jit static arguments.
    """

    K: int
    T: int
    F: int
    lr: float = 1e-4
    beta1: float = 0.5
    alpha: float = 1.0
    beta: float = 0.02
    df_dim: int = 64
    Ip: int = 3
    disc_window_size: int = 3
    tf_p_min: float = 0.0
    tf_p_max: float = 0.0
    tf_offset: float = 100000.0
    tf_decay: float = 20000.0
    lambda_r: float = 0.8
    lambda_p: float = 0.005
    lambda_w: float = 0.4
    lambda_s: float = 1.0
    lr_decay_count: int = 40000
    lr_decay_rate: float = 0.1
    vgg16_weights: Optional[str] = None
    train_dtype: str = "float32"  # "bfloat16" -> mixed precision (f32 params/opt, bf16 compute)

    @classmethod
    def from_opt(cls, opt) -> "TrainConfig":
        names = {f for f in cls.__dataclass_fields__}
        return cls(**{k: v for k, v in vars(opt).items() if k in names})


def listopt(opt, f=None) -> None:
    """Pretty-print options (reference util.py:158-169)."""
    f = f or sys.stdout
    f.write("------------ Options -------------\n")
    for k, v in sorted(vars(opt).items()):
        f.write(f"{k}: {v}\n")
    f.write("-------------- End ----------------\n")
