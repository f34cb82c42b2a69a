"""End-to-end convert_diffusion_planner test with a synthetic full
reference-layout state dict (backbone + FPN + encoders + denoiser trunk).

Checks the top-level converter's key layout (prediction_head.* names as in
the reference DiffusionPlanner state dict), strict full consumption, and
that the converted model runs to a finite loss.
"""

import numpy as np
import torch
import torch.nn as nn

import jax
import jax.numpy as jnp

from act3d_tpu.convert.torch_to_jax import convert_diffusion_planner
from act3d_tpu.models import DiffusionPlanner

from tests.test_backbone_parity import TorchClipResNet, _randomize_bn_stats
from tests.test_diffusion_head_parity import TorchDiffusionTrunk, DIM, N_LAYERS


def build_reference_state_dict(rng):
    """prediction_head.* keys exactly as the reference module tree names
    them (diffusion_head.py setup + encoder.py)."""
    sd = {}
    backbone = TorchClipResNet(layers=(3, 4, 6, 3), width=64)
    _randomize_bn_stats(backbone, rng)
    for k, v in backbone.state_dict().items():
        sd[f"prediction_head.backbone.{k}"] = v.detach().numpy()

    # torchvision FPN layout (inner_blocks.N / layer_blocks.N)
    chans = [64, 256, 512, 1024, 2048]
    for i, c in enumerate(chans):
        sd[f"prediction_head.feature_pyramid.inner_blocks.{i}.weight"] = (
            rng.normal(size=(DIM, c, 1, 1)).astype(np.float32) * 0.05
        )
        sd[f"prediction_head.feature_pyramid.inner_blocks.{i}.bias"] = (
            rng.normal(size=DIM).astype(np.float32) * 0.05
        )
        sd[f"prediction_head.feature_pyramid.layer_blocks.{i}.weight"] = (
            rng.normal(size=(DIM, DIM, 3, 3)).astype(np.float32) * 0.05
        )
        sd[f"prediction_head.feature_pyramid.layer_blocks.{i}.bias"] = (
            rng.normal(size=DIM).astype(np.float32) * 0.05
        )

    trunk = TorchDiffusionTrunk()
    tsd = {k: v.detach().numpy() for k, v in trunk.state_dict().items()}

    def move(old, new):
        for suffix in ("weight", "bias"):
            sd[f"prediction_head.{new}.{suffix}"] = tsd.pop(f"{old}.{suffix}")

    move("traj_enc_fc1", "traj_encoder.0")
    move("traj_enc_fc2", "traj_encoder.3")
    move("pos_reg1", "pos_regressor.0.0")
    move("pos_reg2", "pos_regressor.0.3")
    move("rot_reg1", "rot_regressor.0.0")
    move("rot_reg2", "rot_regressor.0.3")

    def move_pa(old_prefix, new_prefix):
        for k in list(tsd):
            if k.startswith(old_prefix + "."):
                rest = k[len(old_prefix) + 1 :]
                rest = rest.replace("ffn_fc1", "ffn_12.0").replace(
                    "ffn_fc2", "ffn_12.3"
                )
                sd[f"prediction_head.{new_prefix}.{rest}"] = tsd.pop(k)

    for i in range(2):
        move_pa(f"vl.{i}", f"vl_attention.0.layers.{i}")
    move_pa("traj_lang", "traj_lang_attention.0.layers.0")
    for i in range(N_LAYERS - 2):
        move_pa(f"traj_attn.{i}", f"traj_attention.0.layers.{i}")
    for i in range(2):
        move_pa(f"pos_attn.{i}", f"pos_attention.0.layers.{i}")
        move_pa(f"rot_attn.{i}", f"rot_attention.0.layers.{i}")
    assert not tsd, list(tsd)

    # token encoders + embeddings (encoder.py / diffusion_head.py)
    sd["prediction_head.curr_gripper_encoder.weight"] = (
        rng.normal(size=(DIM, 9)).astype(np.float32) * 0.1
    )
    sd["prediction_head.curr_gripper_encoder.bias"] = np.zeros(DIM, np.float32)
    sd["prediction_head.goal_gripper_encoder.weight"] = (
        rng.normal(size=(DIM, 9)).astype(np.float32) * 0.1
    )
    sd["prediction_head.goal_gripper_encoder.bias"] = np.zeros(DIM, np.float32)
    sd["prediction_head.instruction_encoder.weight"] = (
        rng.normal(size=(DIM, 512)).astype(np.float32) * 0.02
    )
    sd["prediction_head.instruction_encoder.bias"] = np.zeros(DIM, np.float32)
    sd["prediction_head.curr_gripper_embed.weight"] = (
        rng.normal(size=(1, DIM)).astype(np.float32)
    )
    sd["prediction_head.goal_gripper_embed.weight"] = (
        rng.normal(size=(1, DIM)).astype(np.float32)
    )
    return {f"module.{k}": v for k, v in sd.items()}  # DDP-prefixed


def test_convert_full_diffusion_planner(rng):
    torch.manual_seed(0)
    sd = build_reference_state_dict(rng)

    model = DiffusionPlanner(
        image_size=(128, 128),
        embedding_dim=DIM,
        output_dim=7,
        num_query_cross_attn_layers=N_LAYERS,
        use_instruction=True,
        use_goal=True,
        rotation_parametrization="6D",
        diffusion_timesteps=5,
        gripper_loc_bounds=((-1.0,) * 3, (1.0,) * 3),
    )
    B, L, ncam = 1, 6, 1
    traj = jnp.asarray(rng.uniform(-0.5, 0.5, (B, L, 7)).astype(np.float32))
    mask = jnp.zeros((B, L), bool)
    rgb = jnp.asarray(rng.uniform(0, 1, (B, ncam, 3, 128, 128)).astype(np.float32))
    pcd = jnp.asarray(rng.uniform(-0.5, 0.5, (B, ncam, 3, 128, 128)).astype(np.float32))
    instr = jnp.asarray(rng.normal(size=(B, 53, 512)).astype(np.float32))
    grip = jnp.asarray(rng.uniform(-0.5, 0.5, (B, 7)).astype(np.float32))

    variables = model.init(
        jax.random.PRNGKey(0), traj, mask, rgb, pcd, instr, grip, grip,
        noise_rng=jax.random.PRNGKey(1),
    )
    converted = convert_diffusion_planner(
        sd, variables["params"],
        num_query_cross_attn_layers=N_LAYERS,
    )
    loss = model.apply(
        {"params": converted}, traj, mask, rgb, pcd, instr, grip, grip,
        noise_rng=jax.random.PRNGKey(2),
    )
    assert np.isfinite(float(loss))

    # converted params actually replaced the init (not a silent no-op)
    a = variables["params"]["prediction_head"]["traj_enc_fc1"]["kernel"]
    b = converted["prediction_head"]["traj_enc_fc1"]["kernel"]
    assert not np.allclose(np.asarray(a), np.asarray(b))
