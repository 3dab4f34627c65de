#!/usr/bin/env bash
# Fetch + preprocess VoxCeleb1 into the stacked-frame dataset layout.
# Capability parity with the reference's data/get_vox.sh + preprocess_vox.py:
# downloads the dense-face-frames archive, then partitions identities by the
# bundled lists (data/train_vox1.txt, data/test_vox1.txt) and writes one
# 256^2 stacked-frame JPG per video part under <out_dir>/{train,test}/.
#
# Usage: scripts/get_vox.sh [out_dir] [size]
set -euo pipefail
REPO_ROOT="$(cd "$(dirname "${BASH_SOURCE[0]}")/.." && pwd)"
OUT_DIR=${1:-vox}
SIZE=${2:-256}

if [ ! -d unzippedIntervalFaces ]; then
  wget www.robots.ox.ac.uk/~vgg/research/CMBiometrics/data/dense-face-frames.tar.gz
  echo "Extracting..."
  tar -xf dense-face-frames.tar.gz
  rm -f dense-face-frames.tar.gz
fi

echo "Converting..."
python -m monkeynet_tpu.data.tools vox unzippedIntervalFaces/data "$OUT_DIR" \
  --lists_dir "$REPO_ROOT/data" --size "$SIZE"
rm -rf unzippedIntervalFaces
