"""Depth H2D wire: exactness vs the host XYZ path, validation fallback,
instruction-id bank.

The claim under test (data/depthwire.py): shipping 1-channel u16 depth +
pinhole params + NEAREST-resize index maps and reconstructing the XYZ
image in-jit reproduces the reference's host-augmented point cloud
(reference datasets/utils.py:40-181 transforms over the XYZ channels of
datasets/dataset_engine.py:139-149 episodes) bit-for-bit modulo the wire
quantisation.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from act3d_tpu.data.augment import Resize, Rotate
from act3d_tpu.data.compact import compact_batch, expand_batch
from act3d_tpu.data.dataset import RLBenchDataset
from act3d_tpu.data.depthwire import (
    derive_depth,
    gather_hw,
    pinhole_residual,
    reconstruct_pcds,
)
from act3d_tpu.data.fixtures import (
    CAMERAS,
    make_dataset_tree,
    make_instructions,
)

TASKS = ("pick_and_lift", "push_button")


def _tree(tmp_path, n_cam=2, image_size=32):
    return make_dataset_tree(
        tmp_path, tasks=TASKS, variations=(0,), episodes_per_variation=2,
        n_frames=3, n_cam=n_cam, image_size=image_size,
    )


def _ds(root, wire, seed=3, instr_mode="features", training=True, **over):
    kw = dict(
        instructions=make_instructions(TASKS, (0,)),
        taskvar=[(t, 0) for t in TASKS],
        cameras=CAMERAS[:2],
        training=training,
        image_rescale=(0.75, 1.25),
        point_cloud_rotate_yaw_range=15.0,
        return_low_lvl_trajectory=True,
        dense_interpolation=True,
        interpolation_length=8,
        action_dim=7,
        seed=seed,
    )
    kw.update(over)
    return RLBenchDataset(root, wire=wire, instr_mode=instr_mode, **kw)


# u16 depth step over 6.4 m is ~0.098 mm; × |K^-1 u| rays ≲ 2e-4 m world
WIRE_TOL = 5e-4


def test_augmented_roundtrip_matches_host_path(tmp_path):
    """Rotation+resize depth wire == host-augmented XYZ, same seed."""
    root = _tree(tmp_path)
    b_host = _ds(root, "pcd").sample_batch(6)
    ds = _ds(root, "depth")
    assert ds.wire == "depth"
    b_wire = ds.sample_batch(6)
    assert "pcds" not in b_wire and "depth" in b_wire

    dev = {
        k: jnp.asarray(v)
        for k, v in compact_batch(b_wire).items() if k != "task"
    }
    assert dev["depth"].dtype == jnp.uint16
    out = expand_batch(dev)

    np.testing.assert_allclose(
        np.asarray(out["pcds"]), b_host["pcds"], atol=WIRE_TOL
    )
    # rgb: u8 wire quantisation only
    np.testing.assert_allclose(
        np.asarray(out["rgbs"]), b_host["rgbs"], atol=0.5 / 255 + 1e-6
    )
    # poses see the identical rotation draw
    for k in ("action", "curr_gripper", "trajectory"):
        np.testing.assert_array_equal(b_wire[k], b_host[k])


def test_eval_path_no_maps(tmp_path):
    """training=False ships no index maps; identity reconstruction."""
    root = _tree(tmp_path)
    b_host = _ds(root, "pcd", training=False).sample_batch(4)
    b_wire = _ds(root, "depth", training=False).sample_batch(4)
    assert "aug_rows" not in b_wire
    out = expand_batch(
        {k: jnp.asarray(v) for k, v in compact_batch(b_wire).items()
         if k != "task"}
    )
    np.testing.assert_allclose(
        np.asarray(out["pcds"]), b_host["pcds"], atol=WIRE_TOL
    )


def test_wire_bytes_shrink(tmp_path):
    """The point-cloud leg is 6x smaller (u16 depth vs f32 XYZ -> 3ch*2)
    and instr ids drop the feature tensor from the wire entirely."""
    root = _tree(tmp_path)
    b_pcd = compact_batch(_ds(root, "pcd").sample_batch(6))
    b_dep = compact_batch(_ds(root, "depth", instr_mode="ids").sample_batch(6))
    pcd_leg = b_pcd["pcds"].nbytes
    dep_leg = (
        b_dep["depth"].nbytes + b_dep["cam_intr"].nbytes
        + b_dep["cam_c2w"].nbytes + b_dep["aug_rows"].nbytes
        + b_dep["aug_cols"].nbytes
    )
    assert dep_leg < pcd_leg / 2.5
    assert b_dep["instr_id"].nbytes < b_pcd["instr"].nbytes / 1000


def test_pinhole_fallback_on_inconsistent_data(tmp_path, caplog):
    """Episodes whose cloud is not the depth reprojection fall back."""
    root = _tree(tmp_path)
    # corrupt every episode's XYZ channel
    from act3d_tpu.data.episode import load_episode, save_episode

    for f in sorted(root.rglob("*.dat")):
        ep = load_episode(f)
        for i in range(len(ep[1])):
            ep[1][i][:, 1] += np.float32(0.05)  # 5 cm shear vs camera model
        # break consistency further: nonlinear warp
        ep[1][0][:, 1, 0] *= np.float32(1.1)
        save_episode(f, ep)
    ds = _ds(root, "depth")
    assert ds.wire == "pcd"  # silently fell back at init
    assert "pcds" in ds.sample_batch(2)


def test_depth_derivation_and_residual():
    """derive_depth + pinhole_residual agree on consistent data and
    reject a broken camera model."""
    rng = np.random.default_rng(0)
    h = w = 24
    k = np.array([[30.0, 0, 11.5], [0, 30.0, 11.5], [0, 0, 1]])
    c2w = np.eye(4)
    c2w[:3, 3] = [0.3, -0.2, 0.5]
    d = rng.uniform(0.5, 2.0, (h, w))
    u, v = np.meshgrid(np.arange(w), np.arange(h))
    cam = np.stack(
        [(u - k[0, 2]) / k[0, 0] * d, (v - k[1, 2]) / k[1, 1] * d, d]
    )
    pcd = (c2w[:3, :3] @ cam.reshape(3, -1)).reshape(3, h, w) + c2w[
        :3, 3
    ][:, None, None]
    dd = derive_depth(pcd[None], c2w[None])
    np.testing.assert_allclose(dd[0], d, atol=1e-5)
    assert pinhole_residual(pcd[None], dd, k[None], c2w[None]) < 1e-5
    bad_k = k.copy()
    bad_k[0, 0] *= 1.05
    assert pinhole_residual(pcd[None], dd, bad_k[None], c2w[None]) > 1e-3


def test_gather_hw_matches_numpy():
    rng = np.random.default_rng(1)
    a = rng.normal(size=(2, 3, 4, 8, 10)).astype(np.float32)
    rows = rng.integers(0, 8, size=(2, 8))
    cols = rng.integers(0, 10, size=(2, 10))
    got = np.asarray(
        gather_hw(jnp.asarray(a), jnp.asarray(rows), jnp.asarray(cols))
    )
    want = np.stack(
        [a[i][..., rows[i][:, None], cols[i][None, :]] for i in range(2)]
    )
    np.testing.assert_array_equal(got, want)


def test_resize_index_maps_equal_legacy_resize():
    """sample_index_maps reproduces the composed resize+pad+crop and
    consumes the identical RNG stream (device_augment parity depends on
    the draw order)."""
    for seed, scales in [(0, (0.75, 1.25)), (1, (0.6, 0.9)), (2, (1.1, 1.4))]:
        a = np.random.default_rng(99).normal(size=(2, 3, 16, 20))
        r1 = Resize(scales=scales, rng=np.random.default_rng(seed))
        out = r1(x=a.copy())["x"]
        r2 = Resize(scales=scales, rng=np.random.default_rng(seed))
        rows, cols = r2.sample_index_maps(16, 20)
        np.testing.assert_array_equal(
            out, a[..., rows[:, None], cols[None, :]]
        )


def test_rotate_sample_matches_call():
    rng_kw = dict(
        gripper_loc_bounds=np.array([[-2, -2, -2], [2, 2, 2]], np.float64),
        yaw_range=20.0,
    )
    rng = np.random.default_rng(5)
    g = rng.normal(size=(4, 8)).astype(np.float32)
    g[:, :3] = rng.uniform(-0.5, 0.5, (4, 3))
    a = g.copy()
    pcds = rng.normal(size=(4, 2, 3, 8, 8)).astype(np.float32)
    r1 = Rotate(rng=np.random.default_rng(7), **rng_kw)
    p1, g1, a1, _ = r1(pcds.copy(), g.copy(), a.copy())
    r2 = Rotate(rng=np.random.default_rng(7), **rng_kw)
    rot, g2, a2, _ = r2.sample(g.copy(), a.copy())
    np.testing.assert_array_equal(g1, g2)
    np.testing.assert_array_equal(a1, a2)
    assert rot is not None
    np.testing.assert_allclose(
        p1, np.einsum("ij,tcjhw->tcihw", rot, pcds), rtol=1e-6
    )


def test_instr_bank_rows_match_features(tmp_path):
    """bank[instr_id] == the features the same draws would have shipped."""
    root = _tree(tmp_path)
    b_feat = _ds(root, "pcd", instr_mode="features").sample_batch(6)
    ds_ids = _ds(root, "pcd", instr_mode="ids")
    b_ids = ds_ids.sample_batch(6)
    bank = ds_ids.instruction_bank
    np.testing.assert_array_equal(bank[b_ids["instr_id"]], b_feat["instr"])


def test_loss_fn_resolves_instr_bank(tmp_path):
    """keypose loss with instr_id + bank == loss with explicit instr."""
    import jax

    from act3d_tpu.train.flagship import (
        keypose_loss_fn,
        make_keypose_model,
    )
    from act3d_tpu.train.losses import KeyposeLossAndMetrics
    from act3d_tpu.utils.testing import synthetic_keypose_batch

    model = make_keypose_model(
        image_size=(128, 128), embedding_dim=24, num_ghost_points=64,
        num_ghost_points_val=64, num_sampling_level=2,
    )
    batch = synthetic_keypose_batch(batch=2, ncam=1, image_size=(128, 128))
    params = model.init(
        jax.random.PRNGKey(0), batch["rgbs"], batch["pcds"],
        batch["instr"], batch["curr_gripper"],
        sample_rng=jax.random.PRNGKey(1), gt_action=batch["action"],
    )["params"]
    crit = KeyposeLossAndMetrics()
    bank = np.stack([np.asarray(batch["instr"][0]),
                     np.asarray(batch["instr"][1])])
    b_ids = {k: v for k, v in batch.items() if k != "instr"}
    b_ids["instr_id"] = jnp.asarray([0, 1], jnp.int32)
    l_ref = keypose_loss_fn(model, crit)(params, batch, jax.random.PRNGKey(2))
    l_ids = keypose_loss_fn(model, crit, instr_bank=bank)(
        params, b_ids, jax.random.PRNGKey(2)
    )
    np.testing.assert_allclose(
        float(l_ids[0]), float(l_ref[0]), rtol=1e-6
    )
    with pytest.raises(ValueError):
        keypose_loss_fn(model, crit)(params, b_ids, jax.random.PRNGKey(2))
