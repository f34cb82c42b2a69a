"""Trainer extras: optimizer groups, checkpoint round-trip, profiling, viz."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


def test_param_labels_frozen_and_decay():
    from act3d_tpu.train.optim import param_labels

    params = {
        "visual": {
            "backbone": {"conv1": {"kernel": jnp.zeros((3, 3, 3, 8))}},
            "feature_pyramid": {"inner_res1": {"kernel": jnp.zeros((1, 1, 8, 4)),
                                               "bias": jnp.zeros(4)}},
        },
        "head": {"dense": {"kernel": jnp.zeros((4, 4)), "bias": jnp.zeros(4)},
                 "norm": {"scale": jnp.ones(4), "bias": jnp.zeros(4)}},
    }
    labels = param_labels(params)
    assert labels["visual"]["backbone"]["conv1"]["kernel"] == "frozen"
    assert labels["visual"]["feature_pyramid"]["inner_res1"]["kernel"] == "decay"
    assert labels["visual"]["feature_pyramid"]["inner_res1"]["bias"] == "no_decay"
    assert labels["head"]["dense"]["kernel"] == "decay"
    assert labels["head"]["norm"]["scale"] == "no_decay"


def test_frozen_params_never_update(rng):
    from act3d_tpu.train.optim import make_optimizer
    import optax

    params = {
        "backbone": {"w": jnp.ones((4, 4))},
        "head": {"w": jnp.ones((4, 4))},
    }
    tx = make_optimizer(params, lr=0.1)
    state = tx.init(params)
    grads = jax.tree.map(jnp.ones_like, params)
    updates, _ = tx.update(grads, state, params)
    new = optax.apply_updates(params, updates)
    np.testing.assert_allclose(new["backbone"]["w"], params["backbone"]["w"])
    assert not np.allclose(new["head"]["w"], params["head"]["w"])


def test_trainer_checkpoint_round_trip(tmp_path, rng):
    from act3d_tpu.parallel.mesh import make_mesh
    from act3d_tpu.train.engine import Trainer

    params = {"w": jnp.asarray(rng.normal(size=(4, 4)).astype(np.float32)),
              "b": jnp.zeros(4)}

    def loss_fn(p, batch, rng_):
        pred = batch["x"] @ p["w"] + p["b"]
        return jnp.mean((pred - batch["y"]) ** 2), {}

    mesh = make_mesh(num_devices=2)
    trainer = Trainer(loss_fn, params, mesh=mesh, lr=1e-2)
    batch = {
        "x": jnp.asarray(rng.normal(size=(8, 4)).astype(np.float32)),
        "y": jnp.asarray(rng.normal(size=(8, 4)).astype(np.float32)),
    }
    l0 = float(trainer.step(batch, jax.random.PRNGKey(0))["loss"])
    for _ in range(5):
        out = trainer.step(batch, jax.random.PRNGKey(0))
    assert float(out["loss"]) < l0  # it learns

    trainer.save_checkpoint(tmp_path, new_loss=float(out["loss"]))
    assert (tmp_path / "best.msgpack").exists()
    assert (tmp_path / "last.msgpack").exists()

    w_before = np.asarray(trainer.state.params["w"])
    step_before = int(trainer.state.step)

    trainer2 = Trainer(loss_fn, params, mesh=mesh, lr=1e-2)
    trainer2.load_checkpoint(tmp_path / "last.msgpack")
    np.testing.assert_allclose(
        np.asarray(trainer2.state.params["w"]), w_before
    )
    assert int(trainer2.state.step) == step_before
    # resumed trainer keeps optimizing
    out2 = trainer2.step(batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(out2["loss"]))


def test_last_only_checkpoint_preserves_best(tmp_path, rng):
    """ADVICE r2 (medium): the preemption path must write only
    last.msgpack — a SIGTERM mid-run must not replace the tracked best
    checkpoint or reset best_loss."""
    from act3d_tpu.parallel.mesh import make_mesh
    from act3d_tpu.train.engine import Trainer

    params = {"w": jnp.asarray(rng.normal(size=(4, 4)).astype(np.float32))}

    def loss_fn(p, batch, rng_):
        return jnp.mean((batch["x"] @ p["w"] - batch["y"]) ** 2), {}

    mesh = make_mesh(num_devices=2)
    trainer = Trainer(loss_fn, params, mesh=mesh, lr=1e-2)
    batch = {
        "x": jnp.asarray(rng.normal(size=(8, 4)).astype(np.float32)),
        "y": jnp.asarray(rng.normal(size=(8, 4)).astype(np.float32)),
    }
    trainer.step(batch, jax.random.PRNGKey(0))
    trainer.save_checkpoint(tmp_path, new_loss=0.5)
    best_blob = (tmp_path / "best.msgpack").read_bytes()

    trainer.step(batch, jax.random.PRNGKey(1))
    trainer.save_checkpoint(tmp_path, last_only=True)  # preemption path
    assert (tmp_path / "best.msgpack").read_bytes() == best_blob
    assert trainer.best_loss == 0.5
    # last.msgpack did advance
    from flax import serialization

    payload = serialization.msgpack_restore(
        (tmp_path / "last.msgpack").read_bytes()
    )
    assert int(payload["step"]) == 2

    # reference-degenerate mode unchanged: new_loss=None without
    # last_only still overwrites best (best_checkpoint_metric="")
    trainer.save_checkpoint(tmp_path)
    assert (tmp_path / "best.msgpack").read_bytes() != best_blob
    assert trainer.best_loss is None


def test_flat_optimizer_layout_mismatch_is_actionable(tmp_path, rng):
    """ADVICE r2: loading a per-leaf-layout checkpoint into a flat-AdamW
    trainer must raise an error that names the --flat_optimizer flag."""
    from act3d_tpu.parallel.mesh import make_mesh
    from act3d_tpu.train.engine import Trainer

    params = {"head": {"w": jnp.ones((4, 4))}}

    def loss_fn(p, batch, rng_):
        return jnp.mean((batch["x"] @ p["head"]["w"]) ** 2), {}

    mesh = make_mesh(num_devices=1)
    batch = {"x": jnp.ones((4, 4), jnp.float32)}
    legacy = Trainer(loss_fn, params, mesh=mesh, flat_optimizer=False)
    legacy.step(batch, jax.random.PRNGKey(0))
    legacy.save_checkpoint(tmp_path)

    flat = Trainer(loss_fn, params, mesh=mesh, flat_optimizer=True)
    with pytest.raises(ValueError, match="flat_optimizer"):
        flat.load_checkpoint(tmp_path / "last.msgpack")
    # and the legacy trainer itself can resume its own layout
    legacy2 = Trainer(loss_fn, params, mesh=mesh, flat_optimizer=False)
    legacy2.load_checkpoint(tmp_path / "last.msgpack")
    assert int(legacy2.state.step) == 1


def test_scanned_steps_match_individual(rng):
    from act3d_tpu.parallel.mesh import make_mesh, shard_batch
    from act3d_tpu.train.engine import Trainer

    params = {"w": jnp.asarray(rng.normal(size=(4, 4)).astype(np.float32))}

    def loss_fn(p, batch, key):
        return jnp.mean((batch["x"] @ p["w"] - batch["y"]) ** 2), {}

    batch = {
        "x": jnp.asarray(rng.normal(size=(8, 4)).astype(np.float32)),
        "y": jnp.asarray(rng.normal(size=(8, 4)).astype(np.float32)),
    }
    mesh = make_mesh(num_devices=2)
    keys = jax.random.split(jax.random.PRNGKey(0), 4)

    t1 = Trainer(loss_fn, params, mesh=mesh, lr=1e-2)
    for k in keys:
        out = t1.step(batch, k)
    w_seq = np.asarray(t1.state.params["w"])

    t2 = Trainer(loss_fn, params, mesh=mesh, lr=1e-2)
    scanned = t2.make_scanned_steps(4)
    state, losses = scanned(t2.state, shard_batch(batch, mesh), keys)
    np.testing.assert_allclose(np.asarray(state.params["w"]), w_seq, atol=1e-6)
    assert losses.shape == (4,)
    assert int(state.step) == 4


def test_step_timer():
    from act3d_tpu.train.profiling import StepTimer

    t = StepTimer(window=3)
    assert t.tick() is None
    for _ in range(4):
        t.tick()
    assert t.mean_step_time is not None
    assert t.throughput(10) > 0
    assert t.summary(10)["steps_measured"] == 3


def test_trajectory_scatter_image(rng):
    from act3d_tpu.train.viz import trajectory_scatter_image

    pred = rng.normal(size=(20, 7)).astype(np.float32)
    gt = rng.normal(size=(20, 7)).astype(np.float32)
    mask = np.zeros(20, bool)
    mask[-5:] = True
    img = trajectory_scatter_image(pred, gt, mask)
    assert img.ndim == 3 and img.shape[0] == 3
    assert img.dtype == np.uint8


def test_visualize_episode(tmp_path):
    from act3d_tpu.data.fixtures import make_episode
    from act3d_tpu.data.episode import save_episode
    from act3d_tpu.train.viz import visualize_episode

    ep = make_episode(n_frames=2, n_cam=2, image_size=16)
    path = tmp_path / "ep0.dat"
    save_episode(path, ep)
    img = visualize_episode(path, out_path=tmp_path / "viz.png")
    assert img.ndim == 3 and img.shape[-1] == 3
    assert (tmp_path / "viz.png").exists()


def test_graceful_shutdown_flag_and_restore():
    import os
    import signal

    from act3d_tpu.train.engine import GracefulShutdown

    prev = signal.getsignal(signal.SIGTERM)
    with GracefulShutdown() as stop:
        assert not stop.requested
        os.kill(os.getpid(), signal.SIGTERM)
        assert stop.requested
    # original handler restored on exit
    assert signal.getsignal(signal.SIGTERM) is prev


def test_shutdown_checkpoints_and_resumes(tmp_path, rng):
    """The preemption pattern: loop breaks on signal, saves last.msgpack,
    a fresh trainer auto-resumes from it at the interrupted step."""
    import os
    import signal

    import jax
    import jax.numpy as jnp
    import numpy as np

    from act3d_tpu.parallel.mesh import make_mesh
    from act3d_tpu.train.engine import GracefulShutdown, Trainer

    params = {"w": jnp.asarray(rng.normal(size=(4, 4)).astype(np.float32))}

    def loss_fn(p, batch, key):
        return jnp.mean((batch["x"] @ p["w"]) ** 2), {}

    batch = {"x": jnp.asarray(rng.normal(size=(4, 4)).astype(np.float32))}
    t1 = Trainer(loss_fn, params, mesh=make_mesh(num_devices=1), lr=1e-2)
    with GracefulShutdown() as stop:
        for step in range(100):
            if stop.requested:
                t1.save_checkpoint(tmp_path)
                break
            t1.step(batch, jax.random.PRNGKey(step))
            if step == 2:  # preemption notice arrives mid-training
                os.kill(os.getpid(), signal.SIGTERM)
    assert (tmp_path / "last.msgpack").exists()

    t2 = Trainer(loss_fn, params, mesh=make_mesh(num_devices=1), lr=1e-2)
    t2.load_checkpoint(tmp_path / "last.msgpack")
    assert int(t2.state.step) == 3
    np.testing.assert_array_equal(
        np.asarray(t1.state.params["w"]), np.asarray(t2.state.params["w"])
    )
