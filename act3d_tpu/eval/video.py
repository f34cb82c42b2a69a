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

__all__ = ["CameraMotion", "CircleCameraMotion", "StaticCameraMotion", "TaskRecorder"]


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
    ):
        self._cameras = cameras
        self._env = env
        self._cam_motion = cam_motion
        self._fps = fps
        self._task_str = task_str
        self._snaps: List[np.ndarray] = []

    def take_snap(self, obs=None, **_):
        if self._cam_motion is None:
            return
        self._cam_motion.step()
        frame = self._cam_motion.cam.capture_rgb()
        self._snaps.append(
            (np.clip(frame, 0, 1) * 255.0).astype(np.uint8)
        )

    def save(self, path, lang_goal: str = ""):
        import cv2

        if not self._snaps:
            return None
        path = Path(path)
        path.parent.mkdir(parents=True, exist_ok=True)
        h, w = self._snaps[0].shape[:2]
        writer = cv2.VideoWriter(
            str(path.with_suffix(".mp4")),
            cv2.VideoWriter_fourcc(*"mp4v"),
            self._fps,
            (w, h),
        )
        for frame in self._snaps:
            bgr = cv2.cvtColor(frame, cv2.COLOR_RGB2BGR)
            if lang_goal:
                cv2.putText(
                    bgr, lang_goal, (10, h - 20),
                    cv2.FONT_HERSHEY_SIMPLEX, 0.6, (255, 255, 255), 1,
                    cv2.LINE_AA,
                )
            writer.write(bgr)
        writer.release()
        self._snaps = []
        return str(path.with_suffix(".mp4"))
