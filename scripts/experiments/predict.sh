#!/bin/bash
# Usage: predict.sh <default_args_file> <extra_args_file> <qual_result_root> [extra flags...]
set -e
DIR="$(cd "$(dirname "$0")/../.." && pwd)"
python "$DIR/cli/predict.py" @"$1" @"$2" --qual_result_root "$3" "${@:4}"
