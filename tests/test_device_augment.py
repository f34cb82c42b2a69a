"""On-device augmentation == host augmentation for identical draws.

The host transforms (data.augment, reference datasets/utils.py:40-181)
are the oracle; the device versions (data.device_augment) must reproduce
them bit-for-bit given the same scale / crop / yaw draws.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from act3d_tpu.data.augment import Resize, Rotate
from act3d_tpu.data.device_augment import (
    make_device_augment,
    resize_with_params,
    yaw_rotate_batch,
)


class _FixedRng:
    """Stands in for np.random.Generator with scripted draws."""

    def __init__(self, uniforms, integers=()):
        self._uniforms = list(uniforms)
        self._integers = list(integers)

    def uniform(self, *a, **k):
        return self._uniforms.pop(0)

    def integers(self, low, high=None, *a, **k):
        v = self._integers.pop(0)
        hi = low if high is None else high
        assert v < hi, f"scripted draw {v} out of range [0, {hi})"
        return v


@pytest.mark.parametrize("scale", [0.75, 0.9, 1.0, 1.1, 1.25])
def test_resize_matches_host(rng, scale):
    h = w = 32
    rgbs = rng.uniform(0, 1, (2, 3, h, w)).astype(np.float32)
    pcds = rng.normal(size=(2, 3, h, w)).astype(np.float32)

    new = int(h * scale)
    crop_max = max(new - h, 0)
    crop_i = min(crop_max, 3)
    crop_j = min(crop_max, 1)

    host = Resize(
        scales=(scale, scale),
        rng=_FixedRng(uniforms=[scale], integers=[crop_i, crop_j]),
    )(rgbs=rgbs, pcds=pcds)

    dev = resize_with_params(
        {"rgbs": jnp.asarray(rgbs), "pcds": jnp.asarray(pcds)},
        jnp.float32(scale), jnp.int32(crop_i), jnp.int32(crop_j),
    )
    np.testing.assert_array_equal(np.asarray(dev["rgbs"]), host["rgbs"])
    np.testing.assert_array_equal(np.asarray(dev["pcds"]), host["pcds"])


def _pose_batch(rng, n):
    q = rng.normal(size=(n, 4))
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    return np.concatenate(
        [rng.uniform(-0.2, 0.6, (n, 3)), q, rng.uniform(0, 1, (n, 1))],
        axis=-1,
    ).astype(np.float32)


def test_yaw_rotate_matches_host(rng):
    bounds = np.array([[-2, -2, -2], [2, 2, 2]], np.float64)
    pcds = rng.normal(size=(1, 3, 3, 8, 8)).astype(np.float32)
    gripper = _pose_batch(rng, 1)
    action = _pose_batch(rng, 1)
    traj = _pose_batch(rng, 6).reshape(1, 6, 8)
    yaw = 0.3

    hp, hg, ha, ht = Rotate(
        gripper_loc_bounds=bounds, yaw_range=45.0,
        rng=_FixedRng(uniforms=[yaw]),
    )(pcds.copy(), gripper.copy(), action.copy(), traj.copy())

    dp, poses = yaw_rotate_batch(
        jax.random.PRNGKey(0),
        jnp.asarray(pcds),
        {
            "curr_gripper": jnp.asarray(gripper),
            "action": jnp.asarray(action),
            "trajectory": jnp.asarray(traj),
        },
        yaw_range_rad=np.deg2rad(45.0),
        bounds=jnp.asarray(bounds, jnp.float32),
        num_tries=1,
        yaws=jnp.full((1, 1), yaw),
    )
    np.testing.assert_allclose(np.asarray(dp), hp, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(poses["curr_gripper"]), hg, rtol=1e-5, atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(poses["action"]), ha, rtol=1e-5, atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(poses["trajectory"]), ht, rtol=1e-5, atol=1e-6
    )


def test_yaw_rotate_rejection_keeps_original(rng):
    """All tries out of bounds -> arrays unchanged (host keeps originals)."""
    bounds = np.array([[-0.01, -0.01, -2], [0.01, 0.01, 2]], np.float64)
    pcds = rng.normal(size=(1, 1, 3, 4, 4)).astype(np.float32)
    gripper = _pose_batch(rng, 1)
    gripper[:, :3] = [0.5, 0.5, 0.0]  # any yaw leaves it outside x/y bounds
    action = gripper.copy()

    dp, poses = yaw_rotate_batch(
        jax.random.PRNGKey(0),
        jnp.asarray(pcds),
        {"curr_gripper": jnp.asarray(gripper), "action": jnp.asarray(action)},
        yaw_range_rad=np.deg2rad(45.0),
        bounds=jnp.asarray(bounds, jnp.float32),
        num_tries=4,
        yaws=jnp.asarray([[0.3, 0.5, -0.2, 0.7]]),
    )
    np.testing.assert_array_equal(np.asarray(dp), pcds)
    np.testing.assert_array_equal(np.asarray(poses["curr_gripper"]), gripper)


def test_loss_fn_with_device_augment(rng):
    """diffusion_loss_fn(augment=...) composes the on-device Resize into
    the jitted step (the --device_augment CLI path): finite loss, and the
    augmentation actually perturbs it vs the no-augment path, including
    through a compact-encoded batch (expand runs first)."""
    from act3d_tpu.data.compact import compact_batch
    from act3d_tpu.train.flagship import (
        diffusion_loss_fn,
        make_diffusion_model,
    )
    from act3d_tpu.utils.testing import synthetic_trajectory_batch

    model = make_diffusion_model(
        image_size=(128, 128), embedding_dim=24,
        num_query_cross_attn_layers=1, diffusion_timesteps=5,
    )
    data = synthetic_trajectory_batch(
        batch=2, ncam=1, image_size=(128, 128), traj_len=4
    )
    variables = model.init(
        jax.random.PRNGKey(0),
        data["trajectory"], data["trajectory_mask"], data["rgbs"],
        data["pcds"], data["instr"], data["curr_gripper"], data["action"],
        noise_rng=jax.random.PRNGKey(1),
    )
    aug = make_device_augment(image_rescale=(0.75, 1.25))
    key = jax.random.PRNGKey(7)
    plain = diffusion_loss_fn(model)
    augged = diffusion_loss_fn(model, augment=aug)

    l_plain = float(jax.jit(lambda p, b: plain(p, b, key)[0])(
        variables["params"], data))
    l_aug = float(jax.jit(lambda p, b: augged(p, b, key)[0])(
        variables["params"], data))
    l_aug_compact = float(jax.jit(lambda p, b: augged(p, b, key)[0])(
        variables["params"], compact_batch(dict(data))))
    assert np.isfinite(l_plain) and np.isfinite(l_aug)
    assert l_aug != l_plain  # resize visibly perturbs the loss
    # compact decode happens before augmentation; loss stays finite and
    # close (uint8 rgb quantisation only)
    assert np.isfinite(l_aug_compact)
    np.testing.assert_allclose(l_aug_compact, l_aug, rtol=0.1)


def test_make_device_augment_jits(rng):
    batch = {
        "rgbs": jnp.asarray(rng.uniform(0, 1, (2, 2, 3, 16, 16)), jnp.float32),
        "pcds": jnp.asarray(rng.normal(size=(2, 2, 3, 16, 16)), jnp.float32),
        "curr_gripper": jnp.asarray(_pose_batch(rng, 2)),
        "action": jnp.asarray(_pose_batch(rng, 2)),
    }
    aug = make_device_augment(
        image_rescale=(0.8, 1.2), yaw_range_deg=10.0,
        gripper_loc_bounds=[[-2, -2, -2], [2, 2, 2]],
    )
    out = jax.jit(aug)(batch, jax.random.PRNGKey(1))
    assert out["rgbs"].shape == batch["rgbs"].shape
    assert out["pcds"].shape == batch["pcds"].shape
    assert np.isfinite(np.asarray(out["rgbs"])).all()
    # scale != 1 almost surely -> rgbs actually changed
    assert not np.array_equal(np.asarray(out["rgbs"]), np.asarray(batch["rgbs"]))
