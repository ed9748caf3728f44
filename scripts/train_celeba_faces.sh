#!/usr/bin/env bash
# TPU-native equivalent of the reference launcher
# (/root/reference/scripts/train_celeba_faces.sh).  The reference selects a
# GPU via CUDA_VISIBLE_DEVICES; on TPU the mesh spans every local chip
# automatically (override with --mesh_model / cfg.mesh_data).
#   usage: scripts/train_celeba_faces.sh [RESUME=0] [extra cli args...]
set -euo pipefail
RESUME=${1:-0}
shift || true
exec python -u -m dwcgan_tpu.cli.train \
  --config configs/celeba_faces.yaml \
  --output_path outputs \
  --resume "${RESUME}" "$@"
