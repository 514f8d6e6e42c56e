"""@argfile composition parity with the reference's train.sh cat-compose."""

import os

from vfi_tpu.utils.config import build_test_parser, build_train_parser, parse_args

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))


def test_exp_args_compose_like_reference(tmp_path):
    default = os.path.join(REPO, "exp_args", "default_args", "KTH", "train.txt")
    extra = os.path.join(REPO, "exp_args", "extra_args", "KTH", "bi-TAI.txt")
    opt = parse_args(build_train_parser(), [f"@{default}", f"@{extra}"])
    assert opt.K == 5 and opt.T == 5 and opt.F == 5
    assert opt.alt_T == 10 and opt.alt_K == 7
    assert opt.c_dim == 1 and opt.image_size == [128, 128]
    assert opt.sample_KTF
    assert opt.model_key == "TAI_gray"
    assert opt.name == "kth_bi-TAI"
    assert opt.max_iter == 200000


def test_later_flags_override_earlier(tmp_path):
    default = os.path.join(REPO, "exp_args", "default_args", "KTH", "train.txt")
    extra = os.path.join(REPO, "exp_args", "extra_args", "KTH", "bi-TAI.txt")
    opt = parse_args(build_train_parser(), [f"@{default}", f"@{extra}", "--name", "override"])
    assert opt.name == "override"


def test_comments_stripped(tmp_path):
    f = tmp_path / "args.txt"
    f.write_text("# a comment line\n--K=2  # trailing comment\n--T=1\n--F=2\n"
                 "--model_key=TimeWeightedPFFillInModel\n--test_video_list_path=x\n"
                 "--qual_result_root=y\n")
    opt = parse_args(build_test_parser(), [f"@{f}"])
    assert opt.K == 2 and opt.T == 1 and opt.F == 2


def test_ucf_slomo_quirk_files():
    train = os.path.join(REPO, "exp_args", "extra_args", "UCF-101", "SuperSloMo_train.txt")
    test = os.path.join(REPO, "exp_args", "extra_args", "UCF-101", "SuperSloMo_val_test.txt")
    default = os.path.join(REPO, "exp_args", "default_args", "UCF-101", "train.txt")
    opt = parse_args(build_train_parser(), [f"@{default}", f"@{train}"])
    assert opt.image_size == [160, 192]  # SloMo trains at reduced size
    d_test = os.path.join(REPO, "exp_args", "default_args", "UCF-101", "test_3.txt")
    opt2 = parse_args(build_test_parser(), [f"@{d_test}", f"@{test}", "--qual_result_root", "q"],
                      allow_unknown=True)
    assert opt2.padding_size == [16, 0]  # padded inference
