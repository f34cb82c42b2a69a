"""Smoke + invariant tests for Act3D and DiffusionPlanner on tiny shapes."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from act3d_tpu.models import Act3D, DiffusionPlanner, compute_trajectory

IMAGE = (128, 128)
NCAM = 1
BOUNDS = ((-0.5, -0.5, 0.5), (0.5, 0.5, 1.5))


def tiny_obs(rng, b=1):
    rgb = rng.uniform(0, 1, size=(b, NCAM, 3, *IMAGE)).astype(np.float32)
    pcd = rng.uniform(-0.4, 1.4, size=(b, NCAM, 3, *IMAGE)).astype(np.float32)
    return jnp.asarray(rgb), jnp.asarray(pcd)


@pytest.fixture(scope="module")
def diffusion_setup():
    rng = np.random.default_rng(1)
    model = DiffusionPlanner(
        image_size=IMAGE,
        embedding_dim=24,
        num_query_cross_attn_layers=3,
        use_goal=True,
        use_instruction=True,
        gripper_loc_bounds=BOUNDS,
        diffusion_timesteps=5,
    )
    b, length = 2, 8
    rgb = jnp.asarray(rng.uniform(0, 1, (b, NCAM, 3, *IMAGE)).astype(np.float32))
    pcd = jnp.asarray(rng.uniform(-0.4, 1.4, (b, NCAM, 3, *IMAGE)).astype(np.float32))
    quat = rng.normal(size=(b, length, 4)).astype(np.float32)
    quat /= np.linalg.norm(quat, axis=-1, keepdims=True)
    traj = jnp.asarray(
        np.concatenate(
            [rng.uniform(-0.4, 1.4, (b, length, 3)).astype(np.float32), quat], -1
        )
    )
    mask = jnp.zeros((b, length), bool).at[:, -2:].set(True)
    instr = jnp.asarray(rng.normal(size=(b, 53, 512)).astype(np.float32))
    gq = rng.normal(size=(b, 4)).astype(np.float32)
    gq /= np.linalg.norm(gq, axis=-1, keepdims=True)
    grip = jnp.asarray(
        np.concatenate([rng.uniform(0, 1, (b, 3)).astype(np.float32), gq], -1)
    )
    variables = model.init(
        jax.random.PRNGKey(0),
        traj, mask, rgb, pcd, instr, grip, grip,
        noise_rng=jax.random.PRNGKey(1),
    )
    batch = dict(
        traj=traj, mask=mask, rgb=rgb, pcd=pcd, instr=instr, grip=grip
    )
    return model, variables, batch


def test_diffusion_train_loss_finite(diffusion_setup):
    model, variables, b = diffusion_setup
    loss = model.apply(
        variables, b["traj"], b["mask"], b["rgb"], b["pcd"], b["instr"],
        b["grip"], b["grip"], noise_rng=jax.random.PRNGKey(2),
    )
    assert np.isfinite(float(loss))
    assert float(loss) > 0


def test_diffusion_loss_finite_with_zero_padded_rows(diffusion_setup):
    """Regression: the dataset zero-pads variable-length trajectories
    (reference dataset_engine.py:216-224); a zero quaternion is singular
    under the 6D conversion and used to nan the loss AND its gradients.
    The masked loss must also equal the loss computed on only the valid
    prefix when padding changes."""
    model, variables, b = diffusion_setup
    traj = np.asarray(b["traj"]).copy()
    mask = np.asarray(b["mask"])
    traj[mask] = 0.0  # realistic dataset padding
    traj = jnp.asarray(traj)

    def loss_fn(params, t):
        return model.apply(
            {"params": params}, t, b["mask"], b["rgb"], b["pcd"],
            b["instr"], b["grip"], b["grip"], noise_rng=jax.random.PRNGKey(2),
        )

    loss = loss_fn(variables["params"], traj)
    assert np.isfinite(float(loss))
    grads = jax.grad(loss_fn)(variables["params"], traj)
    assert all(
        bool(jnp.isfinite(l).all()) for l in jax.tree_util.tree_leaves(grads)
    )
    # padded-row contents must not influence the loss
    traj2 = np.asarray(b["traj"]).copy()
    traj2[mask] = 123.0
    np.testing.assert_allclose(
        float(loss_fn(variables["params"], jnp.asarray(traj2))),
        float(loss_fn(variables["params"], traj)),
        rtol=1e-6,
    )


def test_diffusion_loss_grad_flows_not_into_backbone(diffusion_setup):
    model, variables, b = diffusion_setup

    def loss_fn(params):
        return model.apply(
            {"params": params}, b["traj"], b["mask"], b["rgb"], b["pcd"],
            b["instr"], b["grip"], b["grip"], noise_rng=jax.random.PRNGKey(2),
        )

    grads = jax.grad(loss_fn)(variables["params"])
    backbone = grads["prediction_head"]["visual"]["backbone"]
    leaves = jax.tree_util.tree_leaves(backbone)
    assert all(float(jnp.abs(l).max()) == 0.0 for l in leaves)
    fpn = grads["prediction_head"]["visual"]["feature_pyramid"]
    assert any(
        float(jnp.abs(l).max()) > 0 for l in jax.tree_util.tree_leaves(fpn)
    )


def test_diffusion_sampling_shapes_and_conditioning(diffusion_setup):
    model, variables, b = diffusion_setup
    out = compute_trajectory(
        model, variables, b["mask"], b["rgb"], b["pcd"], b["instr"],
        b["grip"], b["grip"], jax.random.PRNGKey(3),
    )
    out = np.asarray(out)
    assert out.shape == (2, 8, 7)
    assert np.isfinite(out).all()
    # start pose conditioning: index 0 must be the current gripper position
    np.testing.assert_allclose(out[:, 0, :3], np.asarray(b["grip"])[:, :3], atol=1e-4)
    # quaternions are unit-norm on non-padded positions (padded positions
    # are zero-conditioned -> degenerate rotation, same as the reference)
    valid = ~np.asarray(b["mask"])
    n = np.linalg.norm(out[..., 3:7], axis=-1)
    np.testing.assert_allclose(n[valid], 1.0, atol=1e-3)


@pytest.fixture(scope="module")
def act3d_setup():
    rng = np.random.default_rng(2)
    model = Act3D(
        image_size=IMAGE,
        embedding_dim=24,
        num_attn_heads=4,
        gripper_loc_bounds=BOUNDS,
        num_ghost_points=48,
        num_ghost_points_val=96,
        num_sampling_level=2,
        use_instruction=True,
    )
    b = 2
    rgb = jnp.asarray(rng.uniform(0, 1, (b, NCAM, 3, *IMAGE)).astype(np.float32))
    pcd = jnp.asarray(rng.uniform(-0.4, 1.4, (b, NCAM, 3, *IMAGE)).astype(np.float32))
    instr = jnp.asarray(rng.normal(size=(b, 53, 512)).astype(np.float32))
    grip = jnp.asarray(rng.uniform(0, 1, (b, 8)).astype(np.float32))
    # gt action positions must lie inside the workspace bounds (as real
    # data does; the reference's rejection sampler would never terminate
    # otherwise, act3d.py:417-436 / utils.py:76-84)
    lo, hi = np.asarray(BOUNDS[0]), np.asarray(BOUNDS[1])
    action = rng.uniform(-1, 1, (b, 8)).astype(np.float32)
    action[:, :3] = lo + rng.uniform(0.1, 0.9, (b, 3)) * (hi - lo)
    action = jnp.asarray(action)
    variables = model.init(
        jax.random.PRNGKey(0), rgb, pcd, instr, grip,
        sample_rng=jax.random.PRNGKey(1), gt_action=action,
    )
    return model, variables, dict(
        rgb=rgb, pcd=pcd, instr=instr, grip=grip, action=action
    )


def test_act3d_forward_shapes(act3d_setup):
    model, variables, b = act3d_setup
    out = model.apply(
        variables, b["rgb"], b["pcd"], b["instr"], b["grip"],
        sample_rng=jax.random.PRNGKey(5), gt_action=b["action"],
    )
    assert out["position"].shape == (2, 3)
    assert out["rotation"].shape == (2, 4)
    assert out["gripper"].shape == (2, 1)
    assert len(out["position_pyramid"]) == 2
    # 48 ghost points // 2 levels = 24 per level
    assert out["ghost_pcd_pyramid"][0].shape == (2, 24, 3)
    assert len(out["ghost_pcd_masks_pyramid"][0]) == 2  # per attn layer
    n = np.linalg.norm(np.asarray(out["rotation"]), axis=-1)
    np.testing.assert_allclose(n, 1.0, atol=1e-5)
    g = np.asarray(out["gripper"])
    assert ((g >= 0) & (g <= 1)).all()


def test_act3d_positions_within_bounds(act3d_setup):
    model, variables, b = act3d_setup
    out = model.apply(
        variables, b["rgb"], b["pcd"], b["instr"], b["grip"],
        sample_rng=jax.random.PRNGKey(6), gt_action=None, train_mode=False,
    )
    lo, hi = np.asarray(BOUNDS[0]), np.asarray(BOUNDS[1])
    # eval mode: 96 // 2 = 48 points/level
    assert out["ghost_pcd_pyramid"][0].shape == (2, 48, 3)
    for pts in out["ghost_pcd_pyramid"]:
        p = np.asarray(pts)
        assert (p >= lo - 1e-5).all() and (p <= hi + 1e-5).all()
    p = np.asarray(out["position"])
    assert (p >= lo - 1e-5).all() and (p <= hi + 1e-5).all()


def test_act3d_gt_anchor_biases_fine_sampling(act3d_setup):
    model, variables, b = act3d_setup
    out = model.apply(
        variables, b["rgb"], b["pcd"], b["instr"], b["grip"],
        sample_rng=jax.random.PRNGKey(7), gt_action=b["action"],
    )
    # level-1 ghost points must lie within the fine ball around gt position
    gt = np.asarray(b["action"])[:, None, :3]
    pts = np.asarray(out["ghost_pcd_pyramid"][1])
    d = np.linalg.norm(pts - gt, axis=-1)
    assert (d < 0.16 / 2 + 1e-5).all()


def test_keypose_loss_and_metrics(act3d_setup):
    from act3d_tpu.train.losses import KeyposeLossAndMetrics

    model, variables, b = act3d_setup
    out = model.apply(
        variables, b["rgb"], b["pcd"], b["instr"], b["grip"],
        sample_rng=jax.random.PRNGKey(8), gt_action=b["action"],
    )
    crit = KeyposeLossAndMetrics()
    losses = crit.compute_loss(out, b["action"])
    total = sum(losses.values())
    assert np.isfinite(float(total))
    metrics = crit.compute_metrics(out, b["action"])
    assert metrics["pos_l2_final"].shape == (2,)
    assert np.isfinite(np.asarray(metrics["pos_l2_final"])).all()


def test_diffusion_multiscale_local_attention(rng):
    """feat_scales=2 exercises the k-NN context pruning at the fine scale
    (reference diffusion_head.py:253-259 find_traj_nn path)."""
    model = DiffusionPlanner(
        image_size=IMAGE,
        embedding_dim=24,
        num_query_cross_attn_layers=3,
        feat_scales_to_use=2,
        use_goal=True,
        use_instruction=False,
        gripper_loc_bounds=BOUNDS,
        diffusion_timesteps=3,
    )
    b, length = 1, 4
    rng_np = np.random.default_rng(5)
    rgb = jnp.asarray(rng_np.uniform(0, 1, (b, NCAM, 3, *IMAGE)).astype(np.float32))
    pcd = jnp.asarray(rng_np.uniform(-0.4, 1.4, (b, NCAM, 3, *IMAGE)).astype(np.float32))
    quat = rng_np.normal(size=(b, length, 4)).astype(np.float32)
    quat /= np.linalg.norm(quat, axis=-1, keepdims=True)
    traj = jnp.asarray(np.concatenate(
        [rng_np.uniform(-0.4, 1.4, (b, length, 3)).astype(np.float32), quat], -1))
    mask = jnp.zeros((b, length), bool)
    gq = rng_np.normal(size=(b, 4)).astype(np.float32)
    gq /= np.linalg.norm(gq, axis=-1, keepdims=True)
    grip = jnp.asarray(np.concatenate(
        [rng_np.uniform(0, 1, (b, 3)).astype(np.float32), gq], -1))
    variables = model.init(
        jax.random.PRNGKey(0), traj, mask, rgb, pcd, None, grip, grip,
        noise_rng=jax.random.PRNGKey(1),
    )
    loss = model.apply(
        variables, traj, mask, rgb, pcd, None, grip, grip,
        noise_rng=jax.random.PRNGKey(2),
    )
    assert np.isfinite(float(loss))
