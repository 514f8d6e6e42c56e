#!/bin/bash
# Download HMDB-51 into $1/HMDB-51 (same source as the reference).
set -e
mkdir -p "${1}/HMDB-51" && cd "${1}/HMDB-51"
wget http://serre-lab.clps.brown.edu/wp-content/uploads/2013/10/hmdb51_org.rar
unrar x hmdb51_org.rar && rm hmdb51_org.rar
for f in *.rar; do unrar x "$f" && rm "$f"; done
