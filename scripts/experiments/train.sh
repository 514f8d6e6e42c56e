#!/bin/bash
# Compose a default-args file with an extra-args file and launch training
# (equivalent of the reference's bashes/experiments/train.sh — here argparse
# reads the files natively via @file syntax, '#' comments stripped).
# Usage: train.sh <default_args_file> <extra_args_file> [extra flags...]
set -e
DIR="$(cd "$(dirname "$0")/../.." && pwd)"
python "$DIR/cli/train.py" @"$1" @"$2" "${@:3}"
