#!/bin/bash
# Download the precomputed Newson-et-al. baseline results (split tar, same
# source as bashes/download/download_newson_results.bash:3-6).  These populate
# the results/<dataset>/quantitative/Newson rows used by 10 of the 20 paper
# tables (scripts/evaluation/paper/quantitative.sh).
set -e
wget -O newson_results.tar.gz.aa https://web.eecs.umich.edu/~szetor/media/bi-TAI-pami/newson_results.tar.gz.aa
wget -O newson_results.tar.gz.ab https://web.eecs.umich.edu/~szetor/media/bi-TAI-pami/newson_results.tar.gz.ab
cat newson_results.tar.gz.aa newson_results.tar.gz.ab | tar -xz
rm newson_results.tar.gz.aa newson_results.tar.gz.ab
