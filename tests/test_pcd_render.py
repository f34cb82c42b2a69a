"""Tests for the numpy point-cloud renderer (eval/pcd_render.py) — the
open3d-free equivalent of reference utils/video_utils.py:19-215."""

import numpy as np
import pytest

from act3d_tpu.eval.pcd_render import (
    COARSE_PRED_COLOR,
    FINE_PRED_COLOR,
    GT_COLOR,
    cylinder_points,
    default_intrinsic,
    euler_matrix,
    get_point_cloud_images,
    gripper_control_points,
    look_at_extrinsic,
    render_points,
    sphere_points,
    topdown_extrinsic,
)


def test_euler_matrix_matches_scipy():
    scipy = pytest.importorskip("scipy.spatial.transform")
    rng = np.random.default_rng(0)
    for _ in range(5):
        ai, aj, ak = rng.uniform(-np.pi, np.pi, 3)
        ours = euler_matrix(ai, aj, ak)[:3, :3]
        # trimesh 'sxyz' static-axes == scipy extrinsic lowercase 'xyz'
        ref = scipy.Rotation.from_euler("xyz", [ai, aj, ak]).as_matrix()
        np.testing.assert_allclose(ours, ref, atol=1e-12)


def test_render_single_point_lands_at_principal_point():
    ext = look_at_extrinsic([0, 0, 2.0], [0, 0, 0], up=(0, 1, 0))
    intr = default_intrinsic((64, 64))
    img = render_points(
        np.array([[0.0, 0.0, 0.0]]),
        np.array([[1.0, 0.0, 0.0]]),
        ext, intr, (64, 64), point_radius=0,
    )
    assert tuple(img[32, 32]) == (255, 0, 0)
    # background is white
    assert tuple(img[0, 0]) == (255, 255, 255)


def test_zbuffer_nearest_point_wins():
    ext = look_at_extrinsic([0, 0, 2.0], [0, 0, 0], up=(0, 1, 0))
    intr = default_intrinsic((64, 64))
    # two points on the optic axis; the one nearer the camera (z=0.5
    # world, i.e. 1.5 in front) must win regardless of input order
    pts = np.array([[0.0, 0.0, 0.0], [0.0, 0.0, 0.5]])
    cols = np.array([[1.0, 0.0, 0.0], [0.0, 0.0, 1.0]])
    for order in ([0, 1], [1, 0]):
        img = render_points(pts[order], cols[order], ext, intr, (64, 64))
        assert tuple(img[32, 32]) == (0, 0, 255)


def test_far_edge_pixel_never_overwrites_near_center():
    """ADVICE r2 regression: a far point whose splat *edge* covers a pixel
    must lose to a near point whose splat *center* covers it, regardless
    of which offset pass each write lands in."""
    ext = look_at_extrinsic([0, 0, 2.0], [0, 0, 0], up=(0, 1, 0))
    intr = default_intrinsic((64, 64))
    f = intr[0, 0]
    # near point projects exactly to (32, 32); far point one pixel up-left
    # of it, so its (+1, +1) splat corner covers (32, 32) — in the old
    # per-pass loop that corner write happened in the LAST pass and won.
    far_off = 2.0 / f  # 1 px at depth 2.0 (far point at z=0.0 world)
    pts = np.array([[0.0, 0.0, 0.5], [-far_off, far_off, 0.0]])
    cols = np.array([[0.0, 0.0, 1.0], [1.0, 0.0, 0.0]])
    img = render_points(pts, cols, ext, intr, (64, 64), point_radius=1)
    assert tuple(img[32, 32]) == (0, 0, 255)


def test_render_points_decal_base_layer():
    ext = look_at_extrinsic([0, 0, 2.0], [0, 0, 0], up=(0, 1, 0))
    intr = default_intrinsic((64, 64))
    base = render_points(
        np.array([[0.0, 0.0, 0.5]]), np.array([[0.0, 0.0, 1.0]]),
        ext, intr, (64, 64), point_radius=0,
    )
    # decal point is FARTHER but paints over the base (annotation layer)
    out = render_points(
        np.array([[0.0, 0.0, 0.0]]), np.array([[1.0, 0.0, 0.0]]),
        ext, intr, (64, 64), point_radius=0, base=base,
    )
    assert tuple(out[32, 32]) == (255, 0, 0)
    assert tuple(out[0, 0]) == (255, 255, 255)  # background preserved


def test_points_behind_camera_are_clipped():
    ext = look_at_extrinsic([0, 0, 2.0], [0, 0, 0], up=(0, 1, 0))
    intr = default_intrinsic((32, 32))
    img = render_points(
        np.array([[0.0, 0.0, 5.0]]),  # behind the camera
        np.array([[0.0, 0.0, 0.0]]),
        ext, intr, (32, 32),
    )
    assert (img == 255).all()


def test_cylinder_points_respect_transform():
    t = np.eye(4)
    t[:3, 3] = [1.0, 2.0, 3.0]
    pts = cylinder_points(0.01, 0.1, t, n=100)
    center = pts.mean(axis=0)
    np.testing.assert_allclose(center, [1.0, 2.0, 3.0], atol=0.01)
    # max distance from axis center bounded by sqrt(r^2 + (h/2)^2)
    d = np.linalg.norm(pts - center, axis=1)
    assert d.max() <= np.hypot(0.01, 0.05) + 1e-9


def test_sphere_points_radius():
    pts = sphere_points([1.0, 0.0, -1.0], 0.25, n=200)
    d = np.linalg.norm(pts - np.array([1.0, 0.0, -1.0]), axis=1)
    np.testing.assert_allclose(d, 0.25, atol=1e-9)


def test_gripper_points_near_grasp_origin_and_equivariant():
    grasp = np.eye(4)
    grasp[:3, 3] = [0.3, -0.2, 0.9]
    pts, cols = gripper_control_points(grasp, color=GT_COLOR)
    # the jaw assembly spans ~0.14 m around the grasp frame
    d = np.linalg.norm(pts - grasp[:3, 3], axis=1)
    assert d.max() < 0.25
    assert (cols == np.asarray(GT_COLOR, np.float32)).all()

    # rigid-transform equivariance: moving the grasp moves the points
    rot = euler_matrix(0.3, -0.5, 1.1)
    rot[:3, 3] = [0.1, 0.2, 0.3]
    pts2, _ = gripper_control_points(rot @ grasp, color=GT_COLOR)
    expect = pts @ rot[:3, :3].T + rot[:3, 3]
    np.testing.assert_allclose(pts2, expect, atol=1e-9)


def _scene(ncam=3):
    rng = np.random.default_rng(1)
    h = w = 24
    pcd = rng.uniform(-0.3, 0.3, (ncam, h, w, 3))
    pcd[..., 2] += 0.8
    rgb = rng.uniform(0.2, 0.4, (ncam, h, w, 3))  # dull colors
    return rgb, pcd


def test_get_point_cloud_images_shapes_and_views():
    rgb, pcd = _scene()
    imgs = get_point_cloud_images(
        rgb, pcd,
        view_names=["left_shoulder", "right_shoulder", "wrist"],
        image_size=(60, 80),
    )
    assert len(imgs) == 4  # ncam + aggregate (video_utils.py:113)
    for im in imgs:
        assert im.shape == (60, 80, 3) and im.dtype == np.uint8


def test_overlays_only_on_shoulder_and_aggregate_views():
    rgb, pcd = _scene()
    grasp = np.eye(4)
    grasp[:3, 3] = [0.0, 0.0, 0.8]  # inside the cloud
    imgs = get_point_cloud_images(
        rgb, pcd,
        view_names=["left_shoulder", "wrist", "front"],
        gt_keyframe_gripper_matrices=grasp[None],
        pred_coarse_position=np.array([0.05, 0.0, 0.8]),
        image_size=(96, 96),
    )

    def has_color(img, color, tol=30):
        target = np.asarray(color) * 255
        return (np.abs(img.astype(int) - target).sum(-1) < tol).any()

    # GT green gripper + yellow coarse marker on the shoulder view and
    # the aggregate; absent from wrist/front views
    for idx in (0, 3):
        assert has_color(imgs[idx], GT_COLOR)
        assert has_color(imgs[idx], COARSE_PRED_COLOR)
    for idx in (1, 2):
        assert not has_color(imgs[idx], GT_COLOR)
        assert not has_color(imgs[idx], COARSE_PRED_COLOR)


def test_position_prediction_only_renders_spheres():
    rgb, pcd = _scene(1)
    grasp = np.eye(4)
    grasp[:3, 3] = [0.0, 0.0, 0.8]
    imgs = get_point_cloud_images(
        rgb, pcd,
        view_names=["left_shoulder"],
        pred_keyframe_gripper_matrices=grasp[None],
        position_prediction_only=True,
        image_size=(96, 96),
    )
    target = np.asarray(FINE_PRED_COLOR) * 255
    hits = (np.abs(imgs[0].astype(int) - target).sum(-1) < 30).sum()
    assert hits > 10  # a filled sphere, not a stray pixel


def test_fine_sampling_ball_rendered():
    rgb, pcd = _scene(1)
    imgs_no = get_point_cloud_images(
        rgb, pcd, view_names=["left_shoulder"],
        pred_coarse_position=np.array([0.0, 0.0, 0.8]),
        image_size=(96, 96),
    )
    imgs_ball = get_point_cloud_images(
        rgb, pcd, view_names=["left_shoulder"],
        pred_coarse_position=np.array([0.0, 0.0, 0.8]),
        fine_sampling_ball_diameter=0.16,
        image_size=(96, 96),
    )
    target = np.asarray(COARSE_PRED_COLOR) * 255

    def yellow(img):
        return (np.abs(img.astype(int) - target).sum(-1) < 30).sum()

    assert yellow(imgs_ball[0]) > 3 * yellow(imgs_no[0])


def test_taskrecorder_pcd_frames_are_mosaics():
    from act3d_tpu.eval.video import TaskRecorder

    class Obs:
        pass

    rgb, pcd = _scene(2)
    obs = Obs()
    obs.left_shoulder_point_cloud = pcd[0]
    obs.left_shoulder_rgb = (rgb[0] * 255).astype(np.uint8)
    obs.right_shoulder_point_cloud = pcd[1]
    obs.right_shoulder_rgb = (rgb[1] * 255).astype(np.uint8)

    rec = TaskRecorder(
        cameras=("left_shoulder", "right_shoulder"), pcd_overlay=True
    )
    rec.take_snap(
        obs,
        pred_position=np.array([0.0, 0.0, 0.8]),
        gt_position=np.array([0.1, 0.0, 0.8]),
    )
    assert len(rec._pcd_snaps) == 1
    frame = rec._pcd_snaps[0]
    # 3 views (2 cams + aggregate) tiled on a 2-col grid of 240px tiles
    assert frame.shape == (480, 480, 3)
    # magenta fine marker appears somewhere
    target = np.asarray(FINE_PRED_COLOR) * 255
    assert (np.abs(frame.astype(int) - target).sum(-1) < 30).any()
