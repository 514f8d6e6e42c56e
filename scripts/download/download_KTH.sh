#!/bin/bash
# Download the KTH actions dataset into $1/KTH (same sources as the reference).
set -e
mkdir -p "${1}/KTH" && cd "${1}/KTH"
for cls in walking jogging running boxing handwaving handclapping; do
  wget "http://www.nada.kth.se/cvap/actions/${cls}.zip"
  unzip -o "${cls}.zip" && rm "${cls}.zip"
done
