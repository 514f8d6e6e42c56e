#!/bin/bash
# Delete every artifact of a named experiment (reference:
# bashes/misc/remove_experiment.sh — same layout: checkpoints/<name>,
# tb/<name>, results/{images,quantitative}/<dataset>/<name>_*).
# Usage: remove_experiment.sh <experiment_name> <dataset_name>

if [ -z "$1" ] || [ -z "$2" ]; then
    echo "usage: $0 <experiment_name> <dataset_name>" >&2
    exit 1
fi

CHECKPOINT_DIR=checkpoints/${1}
TB_DIR=tb/${1}

if [ -d "$CHECKPOINT_DIR" ]; then
    echo "deleting checkpoints"
    rm -r "$CHECKPOINT_DIR"
fi

if [ -d "$TB_DIR" ]; then
    echo "deleting tensorboard file"
    rm -r "$TB_DIR"
fi

for d in results/images/${2}/${1}_* results/quantitative/${2}/${1}_*; do
    if [ -d "$d" ]; then
        echo "deleting $d"
        rm -r "$d"
    fi
done
