#!/usr/bin/env python
"""Convert a torchvision VGG16 state_dict (.pth) to the .npz layout consumed
by vfi_tpu.nn.vgg (conv1_1 .. conv4_3, HWIO kernels).

The reference downloads pretrained VGG16 at environment construction
(environments.py:541-544); offline TPU hosts can't, so convert once elsewhere:

    python cli/convert_vgg16.py vgg16-397923af.pth vgg16_features.npz

then pass --vgg16_weights vgg16_features.npz to cli/train.py for the SloMo
perceptual loss.
"""

import argparse


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("state_dict_path", type=str)
    p.add_argument("out_npz", type=str)
    args = p.parse_args(argv)

    import numpy as np
    import torch

    sd = torch.load(args.state_dict_path, map_location="cpu")
    # torchvision vgg16.features indices of the conv layers, in order
    conv_indices = [0, 2, 5, 7, 10, 12, 14, 17, 19, 21]
    names = [
        "conv1_1", "conv1_2", "conv2_1", "conv2_2",
        "conv3_1", "conv3_2", "conv3_3", "conv4_1", "conv4_2", "conv4_3",
    ]
    out = {}
    for idx, name in zip(conv_indices, names):
        w = sd[f"features.{idx}.weight"].numpy()  # OIHW
        b = sd[f"features.{idx}.bias"].numpy()
        out[f"{name}/kernel"] = np.transpose(w, (2, 3, 1, 0))  # -> HWIO
        out[f"{name}/bias"] = b
    np.savez(args.out_npz, **out)
    print(f"wrote {args.out_npz} ({len(out)} arrays)")


if __name__ == "__main__":
    main()
