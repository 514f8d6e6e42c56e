#!/usr/bin/env python
"""PNG prediction dirs -> results.npz (reference compute_quant_results.py CLI)."""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from vfi_tpu.utils.jax_setup import setup_jax

setup_jax()

from vfi_tpu.eval.quant import compute_quant_results


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("qual_results_root", type=str)
    p.add_argument("quant_results_root", type=str)
    p.add_argument("K", type=int)
    p.add_argument("T", type=int)
    p.add_argument("--depth", type=int, default=1)
    args = p.parse_args(argv)
    print("Now computing quantitative results...")
    compute_quant_results(args.qual_results_root, args.quant_results_root, args.K, args.T, args.depth)
    print("Done computing quantitative results.")


if __name__ == "__main__":
    main()
