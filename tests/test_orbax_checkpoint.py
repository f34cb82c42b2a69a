"""Orbax checkpoint backend round trip."""

import numpy as np

import jax.numpy as jnp


def test_orbax_round_trip(tmp_path, rng):
    from act3d_tpu.core.checkpoint import OrbaxCheckpointer

    ckpt = OrbaxCheckpointer(tmp_path / "ckpts", max_to_keep=2)
    payload = {
        "params": {"w": np.asarray(rng.normal(size=(4, 4)).astype(np.float32))},
        "step": np.asarray(7, np.int32),  # orbax wants arrays, not np scalars
    }
    ckpt.save(7, payload, wait=True)
    ckpt.save(8, payload, wait=True)
    ckpt.save(9, payload, wait=True)
    assert ckpt.latest_step == 9
    restored = ckpt.restore(template=payload)
    np.testing.assert_allclose(restored["params"]["w"], payload["params"]["w"])
    # retention: max_to_keep=2 -> step 7 dropped
    steps = ckpt.manager.all_steps()
    assert 7 not in steps and 9 in steps
    ckpt.close()
