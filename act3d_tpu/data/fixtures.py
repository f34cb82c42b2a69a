"""Synthetic episode fixtures matching the packaged 6-slot schema.

The reference has no model-layer tests; SURVEY.md §4 calls for fake
in-memory episode fixtures mimicking the `.dat` schema
(reference datasets/dataset_engine.py:139-149).  These builders write
valid blosc `.dat` containers through the native packer so the whole
loader path (C++ decode → pickle → numpy) is exercised.
"""

from __future__ import annotations

from pathlib import Path
from typing import Sequence

import numpy as np

from .episode import save_episode

CAMERAS = ("wrist", "left_shoulder", "right_shoulder")


def make_episode(
    n_frames: int = 3,
    n_cam: int = 3,
    image_size: int = 32,
    traj_len_range=(8, 24),
    seed: int = 0,
):
    rng = np.random.default_rng(seed)
    frame_ids = list(range(n_frames))
    obs = [
        np.clip(
            rng.normal(0, 0.5, (n_cam, 2, 3, image_size, image_size)), -1, 1
        ).astype(np.float32)
        for _ in frame_ids
    ]

    def pose8():
        q = rng.normal(size=4)
        q /= np.linalg.norm(q)
        return np.concatenate(
            [rng.uniform(-0.3, 0.7, 3), q, [float(rng.integers(0, 2))]]
        ).astype(np.float32)[None]

    actions = [pose8() for _ in frame_ids]
    camera_dicts = [{c: {} for c in CAMERAS[:n_cam]} for _ in frame_ids]
    grippers = [pose8() for _ in frame_ids]
    trajectories = []
    for i in frame_ids:
        n = int(rng.integers(*traj_len_range))
        start, end = grippers[i][0], actions[i][0]
        ts = np.linspace(0, 1, n)[:, None]
        traj = start[None] * (1 - ts) + end[None] * ts
        traj[:, 3:7] /= np.linalg.norm(traj[:, 3:7], axis=-1, keepdims=True)
        trajectories.append(traj.astype(np.float32))
    return [frame_ids, obs, actions, camera_dicts, grippers, trajectories]


def make_dataset_tree(
    root: Path,
    tasks: Sequence[str] = ("pick_and_lift",),
    variations: Sequence[int] = (0,),
    episodes_per_variation: int = 2,
    **episode_kwargs,
) -> Path:
    """Write a {task}+{var}/ep{N}.dat tree (reference data_gen.py:135-136)."""
    root = Path(root)
    seed = episode_kwargs.pop("seed", 0)
    for task in tasks:
        for var in variations:
            for n in range(episodes_per_variation):
                ep = make_episode(seed=seed, **episode_kwargs)
                seed += 1
                save_episode(root / f"{task}+{var}" / f"ep{n}.dat", ep)
    return root


def make_instructions(
    tasks: Sequence[str] = ("pick_and_lift",),
    variations: Sequence[int] = (0,),
    n_instr: int = 2,
    seed: int = 0,
):
    """task -> variation -> (n_instr, 53, 512) float32, mirroring
    instructions.pkl (reference preprocess_instructions.py:101-170)."""
    rng = np.random.default_rng(seed)
    return {
        task: {
            var: rng.normal(size=(n_instr, 53, 512)).astype(np.float32)
            for var in variations
        }
        for task in tasks
    }
