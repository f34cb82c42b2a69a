"""Config dataclass / CLI parsing tests."""

import json

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from act3d_tpu.core.config import (
    KeyposeConfig,
    TrajectoryConfig,
    parse_config,
)


def test_keypose_defaults_match_reference():
    cfg = parse_config(KeyposeConfig, [])
    # reference main_keypose.py:22-95 defaults
    assert cfg.batch_size == 16
    assert cfg.lr == 1e-4
    assert cfg.train_iters == 200_000
    assert cfg.embedding_dim == 60
    assert cfg.num_ghost_points == 1000
    assert cfg.num_ghost_points_val == 10000
    assert cfg.num_sampling_level == 3
    assert cfg.weight_tying == 1
    assert cfg.rotation_parametrization == "quat_from_query"
    assert cfg.position_loss == "ce"
    assert cfg.rotation_loss_coeff == 10.0
    assert cfg.image_size_tuple == (256, 256)
    assert cfg.image_rescale_tuple == (0.75, 1.25)


def test_trajectory_defaults_match_reference():
    cfg = parse_config(TrajectoryConfig, [])
    # reference main_trajectory.py:25-79 defaults
    assert cfg.embedding_dim == 120
    assert cfg.num_query_cross_attn_layers == 6
    assert cfg.diffusion_timesteps == 100
    assert cfg.action_dim == 7
    assert cfg.interpolation_length == 100
    assert cfg.use_goal_at_test == 1


def test_cli_overrides_and_tuples():
    cfg = parse_config(
        KeyposeConfig,
        [
            "--tasks", "pick_and_lift", "close_door",
            "--variations", "0", "1",
            "--batch_size", "4",
            "--cameras", "wrist",
        ],
    )
    assert cfg.tasks == ("pick_and_lift", "close_door")
    assert cfg.variations == (0, 1)
    assert cfg.batch_size == 4
    assert cfg.cameras == ("wrist",)


def test_config_save(tmp_path):
    cfg = parse_config(
        TrajectoryConfig, ["--base_log_dir", str(tmp_path)]
    )
    cfg.save(cfg.log_dir / "hparams.json")
    loaded = json.loads((cfg.log_dir / "hparams.json").read_text())
    assert loaded["embedding_dim"] == 120


def test_grad_accumulation_steps():
    import optax

    from act3d_tpu.parallel.mesh import make_mesh
    from act3d_tpu.train.engine import Trainer

    params = {"w": jnp.ones((2, 2))}

    def loss_fn(p, batch, rng):
        return jnp.sum(p["w"] * batch["x"]), {}

    trainer = Trainer(
        loss_fn, params, mesh=make_mesh(num_devices=1), lr=0.1,
        accumulate_grad_batches=2,
    )
    batch = {"x": jnp.ones((2, 2))}
    w0 = np.asarray(trainer.state.params["w"]).copy()
    trainer.step(batch, jax.random.PRNGKey(0))
    # first micro-step: accumulation only, no weight update
    np.testing.assert_allclose(np.asarray(trainer.state.params["w"]), w0)
    trainer.step(batch, jax.random.PRNGKey(1))
    assert not np.allclose(np.asarray(trainer.state.params["w"]), w0)


def test_round2_flags_parse():
    from act3d_tpu.core.config import KeyposeConfig, parse_config

    cfg = parse_config(
        KeyposeConfig,
        ["--fsdp", "4", "--compact_transfer", "1",
         "--best_checkpoint_metric", "mean/rot_l1"],
    )
    assert cfg.fsdp == 4
    assert cfg.compact_transfer == 1
    assert cfg.best_checkpoint_metric == "mean/rot_l1"
    # defaults: pure-dp mesh, f32 wire, per-entry best metric
    d = parse_config(KeyposeConfig, [])
    assert d.fsdp == 1 and d.compact_transfer == 0
    assert d.best_checkpoint_metric == "default"
    assert d.device_augment == 0


def test_device_augment_flag_parses():
    from act3d_tpu.core.config import TrajectoryConfig, parse_config

    cfg = parse_config(TrajectoryConfig, ["--device_augment", "1"])
    assert cfg.device_augment == 1
