#!/bin/bash
# Regenerate paper-style qualitative comparison figures for selected clips
# (equivalent of bashes/evaluation/paper/qualitative.sh).
# Usage: qualitative.sh <results_root> <dest> <clip1> [clip2 ...] -- <exp1,label1> [<exp2,label2> ...]
set -e
DIR="$(cd "$(dirname "$0")/../.." && pwd)"
RESULTS=$1; DEST=$2; shift 2
CLIPS=(); while [ "$1" != "--" ]; do CLIPS+=("$1"); shift; done; shift
EXPS=(); LABELS=()
for pair in "$@"; do EXPS+=("${pair%%,*}"); LABELS+=("${pair##*,}"); done
python "$DIR/cli/compare_visual_results.py" --results_root "$RESULTS" \
    --exp_names "${EXPS[@]}" --exp_labels "${LABELS[@]}" \
    --clip_names "${CLIPS[@]}" --save_root "$DEST" --mode both
