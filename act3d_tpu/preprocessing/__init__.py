"""Offline data-generation / preprocessing toolchain (host-side CPU).

Equivalents of the reference ``data_preprocessing/`` scripts:
  * compute_workspace_bounds — per-task gripper workspace JSON
  * preprocess_instructions — CLIP/BERT text features -> instructions.pkl
  * data_gen — replay stored demos -> packaged blosc .dat episodes
  * validate — count/verify generated episodes
"""
