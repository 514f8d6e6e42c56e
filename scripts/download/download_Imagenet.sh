#!/bin/bash
# Download ImageNet-VID test split into $1/Imagenet-VID (same source as the reference).
set -e
mkdir -p "${1}/Imagenet-VID" && cd "${1}/Imagenet-VID"
wget http://bvisionweb1.cs.unc.edu/ilsvrc2015/ILSVRC2015_VID.tar.gz
tar -xzvf ILSVRC2015_VID.tar.gz ILSVRC2015/Data/VID/test
mv ILSVRC2015/Data/VID/test/* . && rm -r ILSVRC2015 ILSVRC2015_VID.tar.gz
