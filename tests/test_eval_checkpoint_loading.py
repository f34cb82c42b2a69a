"""eval CLI checkpoint loading must round-trip the Trainer's save format."""

import numpy as np

import jax
import jax.numpy as jnp

from act3d_tpu.eval.main import load_params
from act3d_tpu.parallel.mesh import make_mesh
from act3d_tpu.train.engine import Trainer


def test_load_params_msgpack_round_trip(tmp_path, rng):
    params = {
        "head": {"kernel": jnp.asarray(rng.normal(size=(4, 4)).astype(np.float32)),
                 "bias": jnp.zeros(4)},
    }

    def loss_fn(p, batch, key):
        return jnp.mean((batch["x"] @ p["head"]["kernel"] + p["head"]["bias"]) ** 2), {}

    trainer = Trainer(loss_fn, params, mesh=make_mesh(num_devices=1), lr=1e-2)
    batch = {"x": jnp.asarray(rng.normal(size=(8, 4)).astype(np.float32))}
    trainer.step(batch, jax.random.PRNGKey(0))
    trainer.save_checkpoint(tmp_path, new_loss=1.0)
    want = jax.device_get(trainer.state.params)

    class FakeModel:
        ...

    def example_init():
        return {"params": params}

    loaded = load_params(
        str(tmp_path / "best.msgpack"), FakeModel(), example_init,
        convert_fn=None,
    )
    np.testing.assert_allclose(
        np.asarray(loaded["head"]["kernel"]), want["head"]["kernel"]
    )
    np.testing.assert_allclose(
        np.asarray(loaded["head"]["bias"]), want["head"]["bias"]
    )
