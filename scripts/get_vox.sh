#!/usr/bin/env bash
# Fetch + preprocess VoxCeleb into the stacked-frame dataset layout
# (capability parity with the reference's data/get_vox.sh + preprocess_vox.py).
#
# Usage: scripts/get_vox.sh <vox_frames_dir> <out_dir> [size]
#   <vox_frames_dir>: unpacked VoxCeleb1 frames (one folder per video),
#     obtained per https://www.robots.ox.ac.uk/~vgg/data/voxceleb/ (the
#     dataset requires registration; download txt lists are data/*_vox1.txt
#     in the reference).
#   <out_dir>: where <video>.jpg stacked-frame files are written.
set -euo pipefail
IN_DIR=${1:?usage: get_vox.sh <vox_frames_dir> <out_dir> [size]}
OUT_DIR=${2:?usage: get_vox.sh <vox_frames_dir> <out_dir> [size]}
SIZE=${3:-256}
python -m monkeynet_tpu.data.tools preprocess "$IN_DIR" "$OUT_DIR" --size "$SIZE"
python -m monkeynet_tpu.data.tools split "$OUT_DIR" --test_size 0.1
