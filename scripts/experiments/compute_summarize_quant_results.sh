#!/bin/bash
# Chain quantitative evaluation + all summaries for one experiment
# (equivalent of bashes/experiments/compute_summarize_quant_results.sh).
# Usage: compute_summarize_quant_results.sh <qual_root> <quant_root> <K> <T> <label> <dest>
set -e
DIR="$(cd "$(dirname "$0")/../.." && pwd)"
QUAL=$1; QUANT=$2; K=$3; T=$4; LABEL=$5; DEST=$6
python "$DIR/cli/compute_quant_results.py" "$QUAL" "$QUANT" "$K" "$T"
for METRIC in psnr ssim; do
  python "$DIR/cli/summarize_quant_results.py" avg_metric_plot \
      --quant_results_roots "$QUANT" --labels "$LABEL" --dest_path "$DEST" --metric $METRIC --T "$T"
  python "$DIR/cli/summarize_quant_results.py" video_metric_text_file \
      --quant_results_roots "$QUANT" --labels "$LABEL" --dest_path "$DEST" --metric $METRIC
  python "$DIR/cli/summarize_quant_results.py" metric_summary_text_file \
      --quant_results_roots "$QUANT" --labels "$LABEL" --dest_path "$DEST" --metric $METRIC
done
