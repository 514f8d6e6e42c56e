#!/bin/bash
# The clip-specification lists (videolist/) are dataset metadata shipped with
# the upstream MichiganCOG/video-frame-inpainting repository. Fetch them from
# upstream (they are data, not code):
set -e
git clone --depth 1 https://github.com/MichiganCOG/video-frame-inpainting /tmp/vfi_upstream
cp -r /tmp/vfi_upstream/videolist "$(dirname "$0")/../../videolist"
rm -rf /tmp/vfi_upstream
# Alternatively regenerate windowed/split lists from master lists with:
#   python cli/videolist_tools.py master_to_contiguous <master> <out> --clip_length 20
#   python cli/videolist_tools.py contiguous_to_split <contiguous> <out> --p 5 --m 5 --f 5
