#!/bin/bash
# Canonical Act3D keypose training preset (hyperparameters follow the
# reference scripts/train_act3d.sh:9-52: batch 16, lr 1e-4, emb 60,
# 1000/10000 ghost points train/val, 3 sampling levels, weight tying on).
#
# Usage: scripts/train_act3d.sh <dataset> <valset> <instructions.pkl> \
#            <bounds.json> <task...>

set -e
dataset=$1; valset=$2; instructions=$3; bounds=$4; shift 4
tasks=${@:-pick_and_lift}

python -m act3d_tpu.train.main_keypose \
  --dataset "$dataset" \
  --valset "$valset" \
  --instructions "$instructions" \
  --gripper_loc_bounds "$bounds" \
  --tasks $tasks \
  --batch_size 16 \
  --batch_size_val 4 \
  --lr 1e-4 \
  --train_iters 200000 \
  --val_freq 500 \
  --embedding_dim 60 \
  --num_ghost_points 1000 \
  --num_ghost_points_val 10000 \
  --num_sampling_level 3 \
  --weight_tying 1 \
  --gp_emb_tying 1 \
  --use_instruction 1 \
  --cache_size 100 \
  --image_rescale 0.75,1.25 \
  --exp_log_dir act3d \
  --run_log_dir "$(date +%y%m%d_%H%M%S)"

# TPU-deployment extras (all optional):
#   --mixed_precision 1     bf16 compute, f32 master weights (headline cfg)
#   --fsdp N                ZeRO-style param/optimizer sharding over N-way axis
#   --num_workers K         multi-process shared-memory batch assembly
#   --compact_transfer 1    uint8 rgb + u16 pcd over the host->device link
