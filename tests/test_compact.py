"""Compact host->device batch encoding (data/compact.py)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from act3d_tpu.data.compact import compact_batch, expand_batch


def test_rgb_roundtrip_lossless_on_sensor_palette(rng):
    """Episode RGB originates from uint8 sensor images; u8 encode/decode
    of those exact values is bit-lossless."""
    u8 = rng.integers(0, 256, (2, 3, 3, 16, 16), dtype=np.uint8)
    rgbs = (u8 / 255.0).astype(np.float32)
    enc = compact_batch({"rgbs": rgbs})
    assert enc["rgbs"].dtype == np.uint8
    np.testing.assert_array_equal(enc["rgbs"], u8)
    dec = expand_batch({"rgbs": jnp.asarray(enc["rgbs"])})
    np.testing.assert_allclose(np.asarray(dec["rgbs"]), rgbs, atol=1e-7)


def test_pcd_f16_quantisation_below_metric_resolution(rng):
    pcds = rng.uniform(-2.0, 2.0, (2, 3, 3, 16, 16)).astype(np.float32)
    enc = compact_batch({"pcds": pcds}, pcd_mode="f16")
    assert enc["pcds"].dtype == np.float16
    dec = expand_batch({"pcds": jnp.asarray(enc["pcds"])})
    err = np.abs(np.asarray(dec["pcds"]) - pcds).max()
    # worst case ulp at |x|<2 is 2^-10 ~ 0.98 mm << the 1 cm metric
    assert err < 1.1e-3
    assert np.asarray(dec["pcds"]).dtype == np.float32


def test_pcd_u16_default_quantisation_sub_tenth_mm(rng):
    """Default pcd encoding: workspace-bounded uint16, step ~0.098 mm
    uniform over ±3.2 m (an order tighter than f16 at workspace edges)."""
    from act3d_tpu.data.compact import PCD_U16_BOUNDS

    lo, hi = PCD_U16_BOUNDS
    pcds = rng.uniform(-3.0, 3.0, (2, 3, 3, 16, 16)).astype(np.float32)
    enc = compact_batch({"pcds": pcds})
    assert enc["pcds"].dtype == np.uint16
    dec = expand_batch({"pcds": jnp.asarray(enc["pcds"])})
    err = np.abs(np.asarray(dec["pcds"]) - pcds).max()
    half_step = 0.5 * (hi - lo) / 65535.0
    assert err <= half_step * 1.01  # ~0.049 mm
    assert np.asarray(dec["pcds"]).dtype == np.float32
    # out-of-bounds points clip to the workspace edge
    wild = np.array([[-10.0, 10.0, 0.0]], np.float32)
    enc2 = compact_batch({"pcds": wild})
    dec2 = np.asarray(expand_batch({"pcds": jnp.asarray(enc2["pcds"])})["pcds"])
    np.testing.assert_allclose(dec2, [[lo, hi, 0.0]], atol=1e-4)


def test_expand_is_identity_on_float_batches(rng):
    batch = {
        "rgbs": jnp.asarray(rng.uniform(0, 1, (1, 2, 3, 4, 4)), jnp.float32),
        "pcds": jnp.asarray(rng.normal(size=(1, 2, 3, 4, 4)), jnp.float32),
        "action": jnp.zeros((1, 8)),
    }
    out = expand_batch(batch)
    for k in batch:
        assert out[k] is batch[k]


def test_compact_keypose_loss_matches_full(rng):
    """The compact-encoded batch must train the same model: loss within
    the f16-pcd quantisation tolerance of the full-precision batch."""
    from act3d_tpu.train.flagship import keypose_loss_fn, make_keypose_model
    from act3d_tpu.train.losses import KeyposeLossAndMetrics
    from act3d_tpu.utils.testing import synthetic_keypose_batch

    model = make_keypose_model(
        image_size=(128, 128), embedding_dim=12, num_ghost_points=32,
        num_ghost_points_val=32, num_sampling_level=2,
    )
    data = synthetic_keypose_batch(batch=2, ncam=1, image_size=(128, 128))
    # snap rgb onto the uint8 palette (real episode data always is)
    data["rgbs"] = np.rint(np.asarray(data["rgbs"]) * 255).astype(
        np.float32
    ) / 255.0
    variables = model.init(
        jax.random.PRNGKey(0),
        data["rgbs"], data["pcds"], data["instr"], data["curr_gripper"],
        sample_rng=jax.random.PRNGKey(1), gt_action=data["action"],
    )
    loss_fn = keypose_loss_fn(model, KeyposeLossAndMetrics())
    full, _ = loss_fn(variables["params"], data, jax.random.PRNGKey(2))
    comp, _ = loss_fn(
        variables["params"],
        compact_batch({k: np.asarray(v) for k, v in data.items()}),
        jax.random.PRNGKey(2),
    )
    assert float(comp) == pytest.approx(float(full), rel=2e-2)
