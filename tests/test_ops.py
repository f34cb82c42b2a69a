"""Tests for rotary PE, schedulers, sampling, geometry ops."""

import math

import jax
import jax.numpy as jnp
import numpy as np

from act3d_tpu.ops import geometry, rotary, sampling
from act3d_tpu.ops.schedulers import make_ddpm_schedule


# ---------------------------------------------------------------- rotary


def reference_rotary_3d_numpy(xyz, feature_dim):
    """Direct numpy transcription of the reference maths for cross-checking
    (reference model/utils/position_encodings.py:58-97)."""
    b, n, _ = xyz.shape
    d = feature_dim // 3
    div_term = np.exp(
        np.arange(0, d, 2, dtype=np.float32) * (-math.log(10000.0) / d)
    ).reshape(1, 1, -1)
    outs = []
    for axis in range(3):
        pos = xyz[..., axis : axis + 1]
        sin, cos = np.sin(pos * div_term), np.cos(pos * div_term)
        dup = lambda f: np.stack([f, f], -1).reshape(b, n, -1)
        outs.append((dup(cos), dup(sin)))
    cos_pos = np.concatenate([o[0] for o in outs], -1)
    sin_pos = np.concatenate([o[1] for o in outs], -1)
    return np.stack([cos_pos, sin_pos], -1)


def test_rotary_pe_3d_matches_reference_math(rng):
    xyz = rng.normal(size=(2, 5, 3)).astype(np.float32)
    got = np.asarray(rotary.rotary_pe_3d(xyz, 60))
    want = reference_rotary_3d_numpy(xyz, 60)
    np.testing.assert_allclose(got, want, atol=1e-6)
    assert got.shape == (2, 5, 60, 2)


def test_embed_rotary_is_rotation(rng):
    # Applying the code must preserve norms pairwise (it is a 2D rotation).
    xyz = rng.normal(size=(1, 7, 3)).astype(np.float32)
    code = rotary.rotary_pe_3d(xyz, 60)
    x = rng.normal(size=(1, 7, 60)).astype(np.float32)
    y = np.asarray(rotary.embed_rotary(x, code))
    nx = (x.reshape(1, 7, 30, 2) ** 2).sum(-1)
    ny = (y.reshape(1, 7, 30, 2) ** 2).sum(-1)
    np.testing.assert_allclose(nx, ny, rtol=1e-4)


def test_rotary_relative_property(rng):
    # <rot(q, p1), rot(k, p2)> depends only on p1 - p2 per axis.
    q = rng.normal(size=(1, 1, 60)).astype(np.float32)
    k = rng.normal(size=(1, 1, 60)).astype(np.float32)
    p1 = np.array([[[0.3, -0.2, 0.5]]], np.float32)
    p2 = np.array([[[0.1, 0.4, -0.3]]], np.float32)
    shift = np.array([[[0.25, -0.5, 0.75]]], np.float32)

    def score(a, b):
        qe = rotary.embed_rotary(q, rotary.rotary_pe_3d(a, 60))
        ke = rotary.embed_rotary(k, rotary.rotary_pe_3d(b, 60))
        return float(jnp.sum(qe * ke))

    assert abs(score(p1, p2) - score(p1 + shift, p2 + shift)) < 1e-3


def test_sinusoidal_pos_emb():
    t = jnp.asarray([0.0, 1.0, 50.0])
    emb = np.asarray(rotary.sinusoidal_pos_emb(t, 120))
    assert emb.shape == (3, 120)
    # t=0: sin half zero, cos half one
    np.testing.assert_allclose(emb[0, :60], 0.0, atol=1e-7)
    np.testing.assert_allclose(emb[0, 60:], 1.0, atol=1e-7)


# ------------------------------------------------------------- schedulers


def test_scaled_linear_betas():
    s = make_ddpm_schedule("scaled_linear", 100)
    betas = np.asarray(s.betas)
    np.testing.assert_allclose(betas[0], 1e-4, rtol=1e-6)
    np.testing.assert_allclose(betas[-1], 0.02, rtol=1e-6)
    # endpoints of sqrt-space linspace
    mid = (math.sqrt(1e-4) + (math.sqrt(0.02) - math.sqrt(1e-4)) * 50 / 99) ** 2
    np.testing.assert_allclose(betas[50], mid, rtol=1e-5)


def test_squaredcos_betas():
    s = make_ddpm_schedule("squaredcos_cap_v2", 100)
    betas = np.asarray(s.betas)
    ab = lambda t: math.cos((t + 0.008) / 1.008 * math.pi / 2) ** 2
    want0 = min(1 - ab(1 / 100) / ab(0), 0.999)
    np.testing.assert_allclose(betas[0], want0, rtol=1e-5)
    assert betas[-1] <= 0.999 + 1e-8
    assert (betas > 0).all()


def test_add_noise_endpoints(rng):
    s = make_ddpm_schedule("scaled_linear", 100)
    x0 = rng.normal(size=(4, 10, 9)).astype(np.float32)
    noise = rng.normal(size=(4, 10, 9)).astype(np.float32)
    t0 = jnp.zeros((4,), jnp.int32)
    noisy = np.asarray(s.add_noise(x0, noise, t0))
    want = np.sqrt(1 - 1e-4) * x0 + math.sqrt(1e-4) * noise
    np.testing.assert_allclose(noisy, want, rtol=1e-4, atol=1e-5)


def test_step_recovers_x0_when_model_perfect(rng):
    """If the model predicts x0 exactly, iterating step() from pure noise
    must converge to x0 (|x0| <= 1 so clip_sample is inert)."""
    s = make_ddpm_schedule("scaled_linear", 100)
    x0 = jnp.asarray(rng.uniform(-0.9, 0.9, size=(2, 5, 3)).astype(np.float32))
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, x0.shape)
    for t in range(99, 0, -1):
        key, sub = jax.random.split(key)
        x = s.step(x0, jnp.asarray(t), x, jax.random.normal(sub, x.shape))
    # reference takes the model output directly at t == 0
    np.testing.assert_allclose(np.asarray(x0), np.asarray(x0), atol=1e-6)
    # after the loop, x should already be close to x0
    assert float(jnp.mean(jnp.abs(x - x0))) < 0.15


def test_step_coefficients_ddpm_identity():
    # c0 + c1 * sqrt(abar_t)/... : verify posterior mean formula at a point
    s = make_ddpm_schedule("scaled_linear", 100)
    t = 50
    ab_t = float(s.alphas_cumprod[t])
    ab_prev = float(s.alphas_cumprod[t - 1])
    beta_t = 1 - ab_t / ab_prev
    c0 = math.sqrt(ab_prev) * beta_t / (1 - ab_t)
    c1 = math.sqrt(ab_t / ab_prev) * (1 - ab_prev) / (1 - ab_t)
    np.testing.assert_allclose(float(s.posterior_x0_coeff[t]), c0, rtol=1e-5)
    np.testing.assert_allclose(float(s.posterior_xt_coeff[t]), c1, rtol=1e-5)


# --------------------------------------------------------------- sampling


def test_cube_sampling_bounds():
    bounds = jnp.asarray([[-1.0, 0.0, 2.0], [1.0, 0.5, 3.0]])
    pts = np.asarray(
        sampling.sample_uniform_cube(jax.random.PRNGKey(0), bounds, 512)
    )
    assert pts.shape == (512, 3)
    assert (pts >= np.asarray(bounds)[0] - 1e-6).all()
    assert (pts <= np.asarray(bounds)[1] + 1e-6).all()


def test_ball_sampling_inside():
    center = jnp.asarray([[0.1, 0.2, 0.3]])
    ws = jnp.asarray([[-1.0, -1.0, -1.0], [1.0, 1.0, 1.0]])
    bounds = sampling.ghost_point_bounds(center, 0.16, ws)
    pts = np.asarray(
        sampling.sample_uniform_ball(
            jax.random.PRNGKey(1), center, 0.08, bounds, 333
        )
    )
    assert pts.shape == (1, 333, 3)
    d = np.linalg.norm(pts - np.asarray(center)[:, None], axis=-1)
    assert (d < 0.08 + 1e-6).all()


def test_ball_sampling_uniformity():
    # mean radius of uniform ball samples is 3R/4
    center = jnp.zeros((1, 3))
    ws = jnp.asarray([[-1.0] * 3, [1.0] * 3])
    bounds = sampling.ghost_point_bounds(center, 2.0, ws)
    pts = np.asarray(
        sampling.sample_uniform_ball(
            jax.random.PRNGKey(2), center, 1.0, bounds, 8192
        )
    )
    d = np.linalg.norm(pts[0], axis=-1)
    assert abs(d.mean() - 0.75) < 0.02


def test_ghost_point_bounds_clips():
    ws = jnp.asarray([[0.0, 0.0, 0.0], [1.0, 1.0, 1.0]])
    anchor = jnp.asarray([[0.01, 0.5, 0.99]])
    b = np.asarray(sampling.ghost_point_bounds(anchor, 0.2, ws))
    np.testing.assert_allclose(b[0, 0], [0.0, 0.4, 0.89], atol=1e-6)
    np.testing.assert_allclose(b[0, 1], [0.11, 0.6, 1.0], atol=1e-6)


# --------------------------------------------------------------- geometry


def test_topk_nearest_context(rng):
    anchor = jnp.zeros((2, 3))
    cloud = jnp.asarray(rng.normal(size=(2, 100, 3)).astype(np.float32))
    idx = np.asarray(geometry.topk_nearest_context(anchor, cloud, 10))
    d = np.linalg.norm(np.asarray(cloud), axis=-1)
    for b in range(2):
        want = set(np.argsort(d[b])[:10].tolist())
        assert set(idx[b].tolist()) == want


def test_find_traj_nn_shape(rng):
    traj = jnp.asarray(rng.normal(size=(2, 4, 3)).astype(np.float32))
    cloud = jnp.asarray(rng.normal(size=(2, 500, 3)).astype(np.float32))
    idx = geometry.find_traj_nn(traj, cloud, nn_per_step=16)
    assert idx.shape == (2, 64)


def test_sample_grid():
    bounds = jnp.asarray([[0.0, 0.0, 0.0], [1.0, 2.0, 3.0]])
    pts = np.asarray(sampling.sample_grid(bounds, 3))
    assert pts.shape == (27, 3)
    np.testing.assert_allclose(pts[0], [0, 0, 0])
    np.testing.assert_allclose(pts[-1], [1, 2, 3])
    # x-major ordering: first axis changes slowest
    np.testing.assert_allclose(pts[1], [0, 0, 1.5])


def test_rotation_from_svd(rng):
    from act3d_tpu.ops import rotations as R

    q = rng.normal(size=(4,)).astype(np.float32)
    q /= np.linalg.norm(q)
    rot = np.asarray(R.quaternion_to_matrix(q))
    pts = rng.normal(size=(30, 3)).astype(np.float32)
    rotated = pts @ rot.T
    got = np.asarray(R.rotation_from_svd(rotated[None], pts[None]))[0]
    np.testing.assert_allclose(got, rot, atol=1e-4)
    np.testing.assert_allclose(np.linalg.det(got), 1.0, atol=1e-5)


def test_embed_rotary_padded_layout_matches_unpadded(rng):
    """pair_rotation_matrix re-indexed by a head lane_map: rotary applied
    to head-padded features (zero pad lanes) equals padding the unpadded
    result — including pairs that straddle head boundaries at odd d."""
    E, H, d, dp = 60, 4, 15, 16
    x = rng.normal(size=(2, 9, E)).astype(np.float32)
    xyz = rng.normal(size=(2, 9, 3)).astype(np.float32)
    code = rotary.rotary_pe_3d(jnp.asarray(xyz), E)

    want = np.asarray(rotary.embed_rotary(jnp.asarray(x), code))

    lane_map = (np.arange(E) // d) * dp + np.arange(E) % d
    xp = np.zeros((2, 9, H * dp), np.float32)
    xp[..., lane_map] = x
    codep = np.zeros((2, 9, H * dp, 2), np.float32)
    codep[..., lane_map, :] = np.asarray(code)
    rot = rotary.pair_rotation_matrix(E, jnp.float32, lane_map, H * dp)
    got = np.asarray(
        rotary.embed_rotary(jnp.asarray(xp), jnp.asarray(codep), rot=rot)
    )
    # real lanes match, pad lanes are exactly zero
    np.testing.assert_allclose(got[..., lane_map], want, atol=1e-6)
    pad_lanes = np.setdiff1d(np.arange(H * dp), lane_map)
    assert np.all(got[..., pad_lanes] == 0.0)


def test_embed_rotary_matmul_env_matches_default(rng, monkeypatch):
    """ACT3D_ROTARY_MATMUL=1 (dense ±1-matmul rotate_pairs) is exact vs the
    default stack/reshape lane shuffle — keeps the env-gated branch from
    rotting while it ships default-OFF (see ops/rotary.py:124-139)."""
    xyz = rng.normal(size=(2, 9, 3)).astype(np.float32)
    code = rotary.rotary_pe_3d(jnp.asarray(xyz), 60)
    x = jnp.asarray(rng.normal(size=(2, 9, 60)).astype(np.float32))

    monkeypatch.delenv("ACT3D_ROTARY_MATMUL", raising=False)
    want = np.asarray(rotary.embed_rotary(x, code))
    monkeypatch.setenv("ACT3D_ROTARY_MATMUL", "1")
    got = np.asarray(rotary.embed_rotary(x, code))
    np.testing.assert_allclose(got, want, atol=1e-6)
