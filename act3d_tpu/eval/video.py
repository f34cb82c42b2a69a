"""Evaluation video recording.

Equivalent of reference utils/video_utils.py: a ``TaskRecorder`` that
snapshots a cinematic camera every simulator step and writes rollout mp4s
with cv2, plus ``CircleCameraMotion`` for orbiting views.  The reference's
open3d point-cloud overlay renders (video_utils.py:300-404) are gated —
open3d is optional; camera-frame recording works without it.

Simulator objects (VisionSensor / Dummy) are duck-typed so the module
imports without PyRep.
"""

from __future__ import annotations

from pathlib import Path
from typing import List, Optional

import numpy as np

__all__ = [
    "CameraMotion",
    "CircleCameraMotion",
    "StaticCameraMotion",
    "TaskRecorder",
    "make_cinematic_recorder",
]


class CameraMotion:
    def __init__(self, cam):
        self.cam = cam
        self._prev_pose = None

    def step(self):
        raise NotImplementedError

    def save_pose(self):
        self._prev_pose = self.cam.get_pose()

    def restore_pose(self):
        if self._prev_pose is not None:
            self.cam.set_pose(self._prev_pose)


class StaticCameraMotion(CameraMotion):
    def step(self):
        pass


class CircleCameraMotion(CameraMotion):
    """Orbit the camera around an origin dummy by `speed` rad per step
    (reference video_utils.py:230-240)."""

    def __init__(self, cam, origin, speed: float):
        super().__init__(cam)
        self.origin = origin
        self.speed = speed

    def step(self):
        self.origin.rotate([0.0, 0.0, self.speed])


class TaskRecorder:
    """Collects per-step frames from a cinematic camera (and optional named
    views) and writes them as mp4 via cv2 (reference video_utils.py:243-475,
    minus open3d overlays)."""

    def __init__(
        self,
        cameras=("left_shoulder", "right_shoulder", "wrist"),
        env=None,
        cam_motion: Optional[CameraMotion] = None,
        fps: int = 30,
        task_str: str = "",
        pcd_overlay: bool = False,
    ):
        self._cameras = cameras
        self._env = env
        self._cam_motion = cam_motion
        self._fps = fps
        self._task_str = task_str
        self._snaps: List[np.ndarray] = []
        self._pcd_overlay = pcd_overlay
        self._pcd_snaps: List[np.ndarray] = []

    def cam_motion_save_pose(self):
        if self._cam_motion is not None:
            self._cam_motion.save_pose()

    def cam_motion_restore_pose(self):
        if self._cam_motion is not None:
            self._cam_motion.restore_pose()

    def take_snap(self, obs=None, pred_position=None, gt_position=None, **_):
        if self._cam_motion is not None:
            self._cam_motion.step()
            frame = self._cam_motion.cam.capture_rgb()
            self._snaps.append(
                (np.clip(frame, 0, 1) * 255.0).astype(np.uint8)
            )
        if self._pcd_overlay and obs is not None:
            frame = self._render_pcd_overlay(obs, pred_position, gt_position)
            if frame is not None:
                self._pcd_snaps.append(frame)

    def _render_pcd_overlay(self, obs, pred_position, gt_position):
        """Point-cloud render with predicted/GT keypose markers.

        Dependency-light equivalent of the reference's open3d offscreen
        renders (video_utils.py:300-404): the scene point cloud colored by
        camera RGB, drawn as a matplotlib 3D scatter, with the predicted
        (red) and ground-truth (green) keypose positions overlaid.
        """
        clouds, colors = [], []
        for cam in self._cameras:
            pc = getattr(obs, f"{cam}_point_cloud", None)
            rgb = getattr(obs, f"{cam}_rgb", None)
            if pc is None:
                continue
            pc = np.asarray(pc).reshape(-1, 3)
            clouds.append(pc)
            if rgb is not None:
                colors.append(
                    np.asarray(rgb).reshape(-1, 3).astype(np.float32) / 255.0
                )
        if not clouds:
            return None
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        pts = np.concatenate(clouds)
        cols = np.concatenate(colors) if len(colors) == len(clouds) else None
        stride = max(1, len(pts) // 8192)
        fig = plt.figure(figsize=(6.4, 4.8), dpi=100)
        ax = fig.add_subplot(projection="3d")
        ax.scatter(
            pts[::stride, 0], pts[::stride, 1], pts[::stride, 2],
            c=cols[::stride] if cols is not None else "gray", s=1,
        )
        if pred_position is not None:
            p = np.asarray(pred_position).reshape(3)
            ax.scatter([p[0]], [p[1]], [p[2]], c="red", s=80, marker="*")
        if gt_position is not None:
            g = np.asarray(gt_position).reshape(3)
            ax.scatter([g[0]], [g[1]], [g[2]], c="green", s=80, marker="^")
        ax.set_axis_off()
        fig.tight_layout(pad=0)
        fig.canvas.draw()
        frame = np.asarray(fig.canvas.buffer_rgba())[..., :3].copy()
        plt.close(fig)
        return frame

    def save(self, path, lang_goal: str = ""):
        path = Path(path)
        out = self._write_mp4(path, self._snaps, lang_goal)
        self._snaps = []
        if self._pcd_snaps:
            self._write_mp4(
                path.with_name(path.name + "_pcd"), self._pcd_snaps, lang_goal
            )
            self._pcd_snaps = []
        return out

    def _write_mp4(self, path, snaps, lang_goal: str):
        import cv2

        if not snaps:
            return None
        path = Path(path)
        path.parent.mkdir(parents=True, exist_ok=True)
        # names may contain dots (e.g. "..._rew1.0") — append, don't replace
        out_path = str(path) if str(path).endswith(".mp4") else str(path) + ".mp4"
        h, w = snaps[0].shape[:2]
        writer = cv2.VideoWriter(
            out_path,
            cv2.VideoWriter_fourcc(*"mp4v"),
            self._fps,
            (w, h),
        )
        for frame in snaps:
            bgr = cv2.cvtColor(frame, cv2.COLOR_RGB2BGR)
            if lang_goal:
                cv2.putText(
                    bgr, lang_goal, (10, h - 20),
                    cv2.FONT_HERSHEY_SIMPLEX, 0.6, (255, 255, 255), 1,
                    cv2.LINE_AA,
                )
            writer.write(bgr)
        writer.release()
        return out_path


def make_cinematic_recorder(
    task_str: str = "",
    resolution=(1280, 720),
    rotation_speed: float = 0.005,
    fps: int = 30,
    pcd_overlay: bool = True,
) -> TaskRecorder:
    """Build a TaskRecorder around RLBench's cinematic camera placeholder
    (reference utils_with_rlbench.py:513-527).  Requires PyRep."""
    from pyrep.objects.dummy import Dummy
    from pyrep.objects.vision_sensor import VisionSensor

    cam_placeholder = Dummy("cam_cinematic_placeholder")
    cam = VisionSensor.create(list(resolution))
    cam.set_pose(cam_placeholder.get_pose())
    cam.set_parent(cam_placeholder)
    cam_motion = CircleCameraMotion(
        cam, Dummy("cam_cinematic_base"), rotation_speed
    )
    return TaskRecorder(
        cam_motion=cam_motion,
        fps=fps,
        task_str=task_str,
        pcd_overlay=pcd_overlay,
    )
