"""Typed CLI configuration (argparse over dataclasses).

Mirrors the reference's tap.Tap argument schemas
(reference: main_keypose.py:22-95, main_trajectory.py:25-79) without the
external typed-argument-parser dependency.
"""

from __future__ import annotations

import argparse
import dataclasses
import json
from pathlib import Path
from typing import Optional, Tuple


@dataclasses.dataclass
class CommonConfig:
    cameras: Tuple[str, ...] = ("wrist", "left_shoulder", "right_shoulder")
    image_size: str = "256,256"
    max_episodes_per_task: int = 100
    instructions: Optional[str] = "instructions.pkl"
    seed: int = 0
    tasks: Tuple[str, ...] = ()
    variations: Tuple[int, ...] = (0,)
    checkpoint: Optional[str] = None
    accumulate_grad_batches: int = 1
    val_freq: int = 500
    gripper_loc_bounds: Optional[str] = None
    eval_only: int = 0

    dataset: str = ""
    valset: str = ""

    base_log_dir: str = "train_logs"
    exp_log_dir: str = "exp"
    run_log_dir: str = "run"

    num_workers: int = 1
    batch_size: int = 16
    batch_size_val: int = 4
    cache_size: int = 100
    cache_size_val: int = 100
    lr: float = 1e-4
    train_iters: int = 200_000
    max_episode_length: int = 5

    image_rescale: str = "0.75,1.25"
    point_cloud_rotate_yaw_range: float = 0.0

    backbone: str = "clip"
    use_instruction: int = 0

    # Metric key (post-aggregation) that drives the "best" checkpoint.
    # Reference semantics (engine.py:214-230): new_loss <= best_loss keeps
    # best; evaluate_nsteps returns `val-losses/action_mse` for keypose
    # (main_keypose.py:281) and `val-losses/traj_action_mse` for trajectory
    # (main_trajectory.py:274).  NOTE the keypose criterion never emits an
    # `action_mse` key, so the reference's keypose best degenerates to
    # last (save_checkpoint treats None as always-best); we default to the
    # meaningful `mean/pos_l2_final` instead — set this flag to "" to
    # reproduce the reference's always-overwrite behaviour.
    best_checkpoint_metric: str = "default"

    # TPU-specific
    num_devices: int = -1  # -1: all available
    # ZeRO-style parameter/optimizer sharding factor: the device mesh
    # becomes (num_devices/fsdp, fsdp) and params/moments shard over the
    # second axis (parallel/mesh.py).  1 = pure data parallelism (the
    # reference's DDP semantics).
    fsdp: int = 1
    # Ship training batches as uint8 rgb + workspace-bounded uint16 pcd
    # and decode inside the jitted step (data/compact.py): 2.6x less
    # host->device traffic at ~0.05 mm max pcd error.
    compact_transfer: int = 0
    # H2D wire for the point-cloud modality (data/depthwire.py):
    # "pcd" ships the XYZ image; "depth" ships 1-channel u16 depth +
    # pinhole params (+ resize index maps, rotation folded into the
    # extrinsic) and rebuilds the cloud in-jit — exact, ~2x less wire
    # + the host stops touching pixels (chip A/B: e2e 32.9->84.3
    # samples/s, BENCH_NOTES r5).  Requires slot-7 camera_params in the
    # episodes (preprocessing/data_gen.py); falls back to "pcd" if the
    # data is not pinhole-consistent.
    wire: str = "pcd"
    # "ids" ships int32 instruction-bank row indices instead of the
    # repeated (B, 53, 512) features; the bank lives device-resident in
    # the loss closure (train/flagship.py::_resolve_instr).
    instr_mode: str = "features"
    # Run the train-time Resize/Rotate augmentations on the TPU inside the
    # jitted step (data/device_augment.py) instead of on the host
    # (reference datasets/utils.py:40-214 runs them in DataLoader
    # workers): the host pipeline then only decodes and stacks — measured
    # ~2.5x more host samples/s per core (BENCH_NOTES 'Input pipeline').
    device_augment: int = 0
    # Resume from <log_dir>/last.msgpack automatically when it exists and
    # no --checkpoint was given — preemption-safe relaunch with the same
    # command line.  Pair with the SIGTERM checkpoint (GracefulShutdown).
    auto_resume: int = 1
    use_tensorboard: int = 0
    fast_prng: int = 1  # TPU-native rbg PRNG (see core.cache.enable_fast_prng)
    mixed_precision: int = 0  # bf16 compute with f32 master weights
    # Flattened-group AdamW (train/optim.py): each decay group updates one
    # concatenated vector (2 fused ops vs ~300 per-leaf fusions).  The
    # opt_state checkpoint layout differs from the per-leaf form — set 0
    # to load checkpoints written before the flat layout existed.
    flat_optimizer: int = 1

    @property
    def image_size_tuple(self) -> Tuple[int, int]:
        return tuple(int(x) for x in self.image_size.split(","))  # type: ignore

    @property
    def image_rescale_tuple(self) -> Tuple[float, float]:
        return tuple(float(x) for x in self.image_rescale.split(","))  # type: ignore

    @property
    def log_dir(self) -> Path:
        return Path(self.base_log_dir) / self.exp_log_dir / self.run_log_dir

    def save(self, path: Path):
        path.parent.mkdir(parents=True, exist_ok=True)
        path.write_text(json.dumps(dataclasses.asdict(self), indent=2, default=str))


@dataclasses.dataclass
class KeyposeConfig(CommonConfig):
    """Act3D training flags (reference main_keypose.py:22-95)."""

    position_prediction_only: int = 0
    position_loss: str = "ce"
    ground_truth_gaussian_spread: float = 0.01
    compute_loss_at_all_layers: int = 0
    position_loss_coeff: float = 1.0
    position_offset_loss_coeff: float = 10000.0
    rotation_loss_coeff: float = 10.0
    symmetric_rotation_loss: int = 0
    gripper_loss_coeff: float = 1.0
    label_smoothing: float = 0.0
    regress_position_offset: int = 0

    num_sampling_level: int = 3
    fine_sampling_ball_diameter: float = 0.16
    weight_tying: int = 1
    gp_emb_tying: int = 1
    num_ghost_points: int = 1000
    num_ghost_points_val: int = 10000
    use_ground_truth_position_for_sampling_train: int = 1
    use_ground_truth_position_for_sampling_val: int = 0

    embedding_dim: int = 60
    num_ghost_point_cross_attn_layers: int = 2
    num_query_cross_attn_layers: int = 2
    num_vis_ins_attn_layers: int = 2
    rotation_parametrization: str = "quat_from_query"
    # TPU extension (no reference counterpart): fine-context selection via
    # lax.approx_max_k (recall ~0.95) instead of exact top-k.  Off by
    # default = exact reference semantics.
    approx_topk: int = 0


@dataclasses.dataclass
class TrajectoryConfig(CommonConfig):
    """DiffusionPlanner training flags (reference main_trajectory.py:25-79)."""

    dense_interpolation: int = 0
    interpolation_length: int = 100

    action_dim: int = 7
    embedding_dim: int = 120
    num_query_cross_attn_layers: int = 6
    num_vis_ins_attn_layers: int = 2
    use_goal: int = 0
    use_goal_at_test: int = 1
    feat_scales_to_use: int = 1
    attn_rounds: int = 1
    weight_tying: int = 0
    rotation_parametrization: str = "6D"
    diffusion_timesteps: int = 100


def parse_config(cls, argv=None):
    """Build an argparse parser from the dataclass fields and parse."""
    parser = argparse.ArgumentParser()
    for f in dataclasses.fields(cls):
        name = f"--{f.name}"
        default = f.default
        if f.type in ("Tuple[str, ...]", "Tuple[int, ...]") or isinstance(
            default, tuple
        ):
            elem = int if default and isinstance(default[0], int) else str
            parser.add_argument(name, nargs="*", type=elem, default=list(default))
        elif f.type == "Optional[str]" or default is None:
            parser.add_argument(name, type=str, default=default)
        else:
            parser.add_argument(name, type=type(default), default=default)
    args = parser.parse_args(argv)
    kwargs = vars(args)
    for k, v in kwargs.items():
        if isinstance(getattr(cls, k, None), tuple) and isinstance(v, list):
            kwargs[k] = tuple(v)
    return cls(**kwargs)
