"""Proof the framework *trains*: losses fall and predictions recover GT.

VERDICT r2 #1: forward parity alone doesn't prove the trainer works —
these tests overfit tiny models on one fixed batch for a few hundred
optimizer steps (one jitted lax.scan chain each) and assert (a) the loss
decreases by a large factor and (b) the keypose argmax actually recovers
the ground-truth position region without ground-truth-biased sampling.
The reference's implicit guarantee is its 200k-500k-step runs
(reference engine.py:146-181, scripts/train_act3d.sh:9-52); this is the
smallest falsifiable version of that claim.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from act3d_tpu.parallel.mesh import make_mesh, shard_batch
from act3d_tpu.train.engine import Trainer
from act3d_tpu.utils.testing import BOUNDS


def _overfit(loss_fn, params, batch, steps, lr, seed=0):
    """Run `steps` optimizer steps as scan chains; return the loss trace."""
    mesh = make_mesh(num_devices=1)
    trainer = Trainer(loss_fn, params, mesh=mesh, lr=lr)
    chain = trainer.make_scanned_steps(steps)
    keys = jax.random.split(jax.random.PRNGKey(seed), steps)
    state, losses = chain(trainer.state, shard_batch(batch, mesh), keys)
    trainer.state = state
    return trainer, np.asarray(losses)


def _keypose_batch(batch=2, ncam=1, image_size=(128, 128), seed=0):
    """Like utils.testing.synthetic_keypose_batch but with action positions
    strictly inside the workspace BOUNDS (the synthetic default draws from
    a wider box, which would cap achievable accuracy for cube-sampled
    ghost points)."""
    rng = np.random.default_rng(seed)
    h, w = image_size
    lo, hi = np.asarray(BOUNDS[0]), np.asarray(BOUNDS[1])

    def pose8():
        q = rng.normal(size=(batch, 4)).astype(np.float32)
        q /= np.linalg.norm(q, axis=-1, keepdims=True)
        p = (lo + (hi - lo) * rng.uniform(0.2, 0.8, (batch, 3))).astype(
            np.float32
        )
        g = rng.integers(0, 2, (batch, 1)).astype(np.float32)
        return np.concatenate([p, q, g], axis=-1)

    return {
        "rgbs": jnp.asarray(
            rng.uniform(0, 1, (batch, ncam, 3, h, w)).astype(np.float32)
        ),
        "pcds": jnp.asarray(
            (
                lo
                + (hi - lo)
                * rng.uniform(0, 1, (batch, ncam, h, w, 3))
            )
            .transpose(0, 1, 4, 2, 3)
            .astype(np.float32)
        ),
        "instr": jnp.asarray(
            rng.normal(size=(batch, 53, 512)).astype(np.float32)
        ),
        "curr_gripper": jnp.asarray(pose8()),
        "action": jnp.asarray(pose8()),
    }


@pytest.mark.slow
def test_diffusion_planner_overfits_one_batch():
    from act3d_tpu.train.flagship import diffusion_loss_fn, make_diffusion_model
    from act3d_tpu.utils.testing import synthetic_trajectory_batch

    model = make_diffusion_model(
        image_size=(128, 128), embedding_dim=24,
        num_query_cross_attn_layers=2, diffusion_timesteps=5,
    )
    batch = synthetic_trajectory_batch(
        batch=2, ncam=1, image_size=(128, 128), traj_len=8
    )
    variables = model.init(
        jax.random.PRNGKey(0),
        batch["trajectory"], batch["trajectory_mask"], batch["rgbs"],
        batch["pcds"], batch["instr"], batch["curr_gripper"], batch["action"],
        noise_rng=jax.random.PRNGKey(1),
    )
    _, losses = _overfit(
        diffusion_loss_fn(model), variables["params"], batch,
        steps=300, lr=1e-3,
    )
    start = float(np.mean(losses[:10]))
    end = float(np.mean(losses[-10:]))
    assert np.isfinite(losses).all()
    assert end < 0.25 * start, (start, end)


@pytest.mark.slow
def test_act3d_overfits_and_argmax_recovers_gt_position():
    from act3d_tpu.train.flagship import keypose_loss_fn, make_keypose_model
    from act3d_tpu.train.losses import KeyposeLossAndMetrics

    model = make_keypose_model(
        image_size=(128, 128), embedding_dim=24,
        num_ghost_points=256, num_ghost_points_val=768,
        num_sampling_level=2,
    )
    batch = _keypose_batch(batch=2, ncam=1, image_size=(128, 128))
    variables = model.init(
        jax.random.PRNGKey(0),
        batch["rgbs"], batch["pcds"], batch["instr"], batch["curr_gripper"],
        sample_rng=jax.random.PRNGKey(1), gt_action=batch["action"],
    )
    # wider soft-CE spread than the reference default (0.01): at this toy
    # ghost-point density the coarse level's nearest point sits ~0.1-0.2
    # from GT, so a 1 cm Gaussian gives the coarse classifier an all-zero
    # label — 5 cm keeps the pyramid trainable at tiny scale
    criterion = KeyposeLossAndMetrics(ground_truth_gaussian_spread=0.05)
    trainer, losses = _overfit(
        keypose_loss_fn(model, criterion), variables["params"], batch,
        steps=400, lr=1e-3,
    )
    start = float(np.mean(losses[:10]))
    end = float(np.mean(losses[-10:]))
    assert np.isfinite(losses).all()
    assert end < 0.5 * start, (start, end)

    # the real claim: WITHOUT ground-truth-biased sampling, the trained
    # ghost-point argmax lands near the GT keypose position (val-mode
    # forward, 512 ghost points — reference eval protocol, eval1.py:94-133)
    params = jax.device_get(trainer.state.params)
    out = model.apply(
        {"params": params},
        batch["rgbs"], batch["pcds"], batch["instr"], batch["curr_gripper"],
        sample_rng=jax.random.PRNGKey(2),
        gt_action=None, train_mode=False, deterministic=True,
    )
    err = np.linalg.norm(
        np.asarray(out["position"]) - np.asarray(batch["action"][:, :3]),
        axis=-1,
    )
    # random argmax over the bounds cube would average ~0.4-0.6 m; the
    # trained model must localise each sample's keypose
    assert float(err.mean()) < 0.15, err
