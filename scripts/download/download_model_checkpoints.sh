#!/bin/bash
# Download the reference's pretrained PyTorch checkpoints (UMich-hosted tar,
# same source as bashes/download/download_model_checkpoints.bash:3-5).
# After extraction, convert any generator snapshot for this framework with:
#   python cli/import_torch_checkpoint.py <ckpt> <model_key> <out.ckpt>
set -e
wget -O model_checkpoints.tar.gz http://web.eecs.umich.edu/~szetor/media/bi-TAI-pami/model_checkpoints.tar.gz
tar -xzvf model_checkpoints.tar.gz
rm model_checkpoints.tar.gz
