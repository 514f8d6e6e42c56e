#!/bin/bash
# Generic qualitative comparison for selected clips: PDF grid + comparison GIF
# per clip (the paper's exact invocations live in scripts/evaluation/paper/).
# Usage: qualitative.sh <results_root> <dataset_name> <total_num_frames> <dest> \
#            <clip1> [clip2 ...] -- <exp1,label1> [<exp2,label2> ...]
set -e
DIR="$(cd "$(dirname "$0")/../.." && pwd)"
RESULTS=$1; DATASET=$2; NFRAMES=$3; DEST=$4; shift 4
CLIPS=(); while [ "$1" != "--" ]; do CLIPS+=("$1"); shift; done; shift
EXPS=(); LABELS=()
for pair in "$@"; do EXPS+=("${pair%%,*}"); LABELS+=("${pair##*,}"); done
python "$DIR/cli/compare_visual_results.py" --results_root "$RESULTS" \
    --dataset_name "$DATASET" --total_num_frames "$NFRAMES" \
    --exp_names "${EXPS[@]}" --model_labels "${LABELS[@]}" \
    --clip_names "${CLIPS[@]}" --dest_path "$DEST" --video_type gif
