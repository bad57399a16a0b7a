#!/usr/bin/env bash
# SSD training launcher — TPU-native counterpart of the reference's
# scripts/build_and_train_ssd.sh. Flags forward into the training module
# (REFCOMPAT: the reference script stored --coef_class_loss into the wrong
# variable, build_and_train_ssd.sh:33 — nothing to mis-store here).
set -euo pipefail

ARGS=()
usage() {
  sed -n '2,5p' "$0"
  python -m object_detection_destr_tpu.train.train_ssd --help
  exit 0
}

while [[ $# -gt 0 ]]; do
  case "$1" in
    -h|--help) usage ;;
    *) ARGS+=("$1"); shift ;;
  esac
done

cd "$(dirname "$0")/.."
exec python -m object_detection_destr_tpu.train.train_ssd "${ARGS[@]}"
