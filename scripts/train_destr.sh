#!/usr/bin/env bash
# DESTR training launcher — TPU-native counterpart of the reference's
# scripts/build_and_train.sh (flag parsing -> docker run -> python -m ...).
# On a TPU VM there is no container indirection: flags forward straight into
# the training module. Flag names mirror the reference (and REFCOMPAT fixes
# its undefined-variable forwarding, build_and_train.sh:84,92).
set -euo pipefail

ARGS=()
usage() {
  sed -n '2,6p' "$0"
  python -m object_detection_destr_tpu.train.train --help
  exit 0
}

while [[ $# -gt 0 ]]; do
  case "$1" in
    -h|--help) usage ;;
    *) ARGS+=("$1"); shift ;;
  esac
done

cd "$(dirname "$0")/.."
exec python -m object_detection_destr_tpu.train.train "${ARGS[@]}"
