#!/bin/bash
# Regenerate the paper's quantitative tables/figures for a dataset
# (equivalent of bashes/evaluation/paper/quantitative.sh).
# Expects results/<dataset>-test_data_list_T=<m>/quantitative/<exp>/results.npz
# to exist for every experiment passed in.
# Usage: quantitative.sh <dataset> <m_a> <m_b> <dest> <exp1,label1> [<exp2,label2> ...]
set -e
DIR="$(cd "$(dirname "$0")/../.." && pwd)"
DATASET=$1; MA=$2; MB=$3; DEST=$4; shift 4
EXPS=(); LABELS=()
for pair in "$@"; do
  EXPS+=("${pair%%,*}"); LABELS+=("${pair##*,}")
done
ROOTS_A=(); ROOTS_B=()
for e in "${EXPS[@]}"; do
  ROOTS_A+=("results/${DATASET}-test_data_list_T=${MA}/quantitative/${e}")
  ROOTS_B+=("results/${DATASET}-test_data_list_T=${MB}/quantitative/${e}")
done
for METRIC in psnr ssim; do
  for M in $MA $MB; do
    ROOTS=(); for e in "${EXPS[@]}"; do ROOTS+=("results/${DATASET}-test_data_list_T=${M}/quantitative/${e}"); done
    python "$DIR/cli/summarize_quant_results.py" metric_summary_text_file \
        --quant_results_roots "${ROOTS[@]}" --labels "${LABELS[@]}" \
        --dest_path "$DEST/m=${M}" --metric $METRIC
    python "$DIR/cli/summarize_quant_results.py" metric_box_plot \
        --quant_results_roots "${ROOTS[@]}" --labels "${LABELS[@]}" \
        --dest_path "$DEST/m=${M}" --metric $METRIC
  done
done
python "$DIR/cli/generate_unified_avg_plot_fig.py" --dataset "$DATASET" \
    --T_a "$MA" --T_b "$MB" --exp_names "${EXPS[@]}" --model_labels "${LABELS[@]}" \
    --psnr_range 20 40 --ssim_range 0.6 1.0 --dest_path "$DEST/unified_avg_plot.pdf"
