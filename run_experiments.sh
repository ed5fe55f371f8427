#!/usr/bin/env bash
# Experiment sweep — equivalent of the reference's run_experiments.bat:15-22:
# 5 repeats × {hu2018, lasinger2019} × {efficientnet-b0, efficientnet-b4,
# resnet50}, aborting on first failure.
set -euo pipefail

REPEATS="${REPEATS:-5}"
DECODERS=(hu2018 lasinger2019)
ENCODERS=(efficientnet-b0 efficientnet-b4 resnet50)

for ((i = 1; i <= REPEATS; i++)); do
  for decoder in "${DECODERS[@]}"; do
    for encoder in "${ENCODERS[@]}"; do
      echo "=== repeat ${i}/${REPEATS}: ${encoder} × ${decoder} ==="
      python -m efficientdepthestimation_tpu.apps.train \
        --encoder "${encoder}" --decoder "${decoder}" "$@"
    done
  done
done
