#!/usr/bin/env bash
# Production-scale on-chip convergence run (VERDICT r3 #1).
#
# Trains the FULL production DESTR config — 640px, 6+6 blocks, top_k 300,
# bf16, flash attention + fused Pallas matcher + RBG dropout, letterbox
# eval geometry (the r4 default) — on a few-thousand-image synthetic set
# through the real CLI driver, to a substantial val mAP. The reference's
# train() contract (src/train/train.py:21-138) demonstrated at production
# scale, which the miniature CPU A/Bs cannot give.
#
# The dataset is generated at full canvas resolution (--synthetic_size 672)
# and served from device HBM (--device_cache): ~2.9 GB of uint8 canvases
# uploaded once, per-step host traffic = one index vector.
#
# --class_norm boxes (DETR-family focal normalization) is load-bearing at
# this scale: the first r4 run under the reference's query normalization
# drove losses down for 30 epochs while reference-metric mAP stayed 0.0 —
# at top_k=300 the positive-class gradient is diluted ~67x and the model
# never becomes argmax-confident (REFCOMPAT "class-loss normalization",
# BASELINE.md r4).
#
# Usage: scripts/train_prod_synth.sh [extra flags...]
#   e.g. scripts/train_prod_synth.sh --epochs 2 --resume --resume_from prod_r4_ep30
set -euo pipefail
cd "$(dirname "$0")/.."

exec python -m object_detection_destr_tpu.train.train \
    --dataset synthetic --synthetic_size 672 \
    --num_train_samples 2048 --num_valid_samples 256 --augment_factor 1 \
    --image_size 640 --batch_size 8 --compute_dtype bfloat16 \
    --num_encoder_blocks 6 --num_decoder_blocks 6 --top_k 300 \
    --epochs 60 --lr 2e-4 --lr_backbone 1e-4 --lr_drop 40 --class_norm boxes \
    --device_cache --coco_eval --save_as prod_r4 \
    --checkpoint_dir checkpoints_prod --log_dir runs_prod \
    --log_interval 64 \
    "$@"
