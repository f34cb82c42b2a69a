#!/bin/bash
# Canonical trajectory-diffusion training preset (hyperparameters follow
# the reference scripts/train_trajectory.sh:6-41: batch 22 (total), emb 120,
# 6 query layers, 6D rotation, 100 DDPM steps, dense interpolation 50).
# SPMD over all local TPU devices replaces the reference's torchrun DDP.
#
# Usage: scripts/train_trajectory.sh <dataset> <valset> <instructions.pkl> \
#            <bounds.json> <task...>

set -e
dataset=$1; valset=$2; instructions=$3; bounds=$4; shift 4
tasks=${@:-pick_and_lift}

python -m act3d_tpu.train.main_trajectory \
  --dataset "$dataset" \
  --valset "$valset" \
  --instructions "$instructions" \
  --gripper_loc_bounds "$bounds" \
  --tasks $tasks \
  --batch_size 22 \
  --batch_size_val 4 \
  --lr 1e-4 \
  --train_iters 500000 \
  --val_freq 1000 \
  --embedding_dim 120 \
  --num_query_cross_attn_layers 6 \
  --rotation_parametrization 6D \
  --diffusion_timesteps 100 \
  --dense_interpolation 1 \
  --interpolation_length 50 \
  --use_goal 1 \
  --use_goal_at_test 0 \
  --use_instruction 1 \
  --cache_size 600 \
  --image_rescale 0.75,1.25 \
  --exp_log_dir diffusion \
  --run_log_dir "$(date +%y%m%d_%H%M%S)"

# TPU-deployment extras (all optional):
#   --mixed_precision 1     bf16 compute, f32 master weights (headline cfg)
#   --fsdp N                ZeRO-style param/optimizer sharding over N-way axis
#   --num_workers K         multi-process shared-memory batch assembly
#   --compact_transfer 1    uint8 rgb + u16 pcd over the host->device link
