#!/bin/bash
# Download UCF-101 into $1/UCF-101 (same source as the reference).
set -e
mkdir -p "${1}/UCF-101" && cd "${1}/UCF-101"
wget http://crcv.ucf.edu/data/UCF101/UCF101.rar
unrar x UCF101.rar && rm UCF101.rar
