"""RLBench packaged-episode dataset (host-side, fixed-shape batches).

TPU-native equivalent of the reference ``RLBenchDataset``
(reference: datasets/dataset_engine.py:14-258).  Loading, caching,
camera re-indexing, instruction sampling, gripper history, trajectory
interpolation/padding and augmentations are preserved.

Fixed-shape redesign (TPU-first): the reference returns variable-length
frame *chunks* that a collate_fn concatenates into a variable batch dim
(reference main_keypose.py:284-292) — poison for XLA.  Here the unit of
sampling is a single (episode, frame) pair and a batch is exactly
``batch_size`` frames; trajectories are always padded to a fixed
``interpolation_length``.  ``get_chunk`` exposes the reference's chunked
access for evaluation parity.
"""

from __future__ import annotations

import itertools
import logging
import math
from collections import Counter, defaultdict
from pathlib import Path
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

log = logging.getLogger(__name__)

from .augment import Resize, Rotate, TrajectoryInterpolator
from .episode import load_episode

__all__ = ["RLBenchDataset"]


class _Cache:
    """Bounded episode cache with the reference's time-keyed eviction
    flavour replaced by simple FIFO (dataset_engine.py:116-132)."""

    def __init__(self, size: int):
        self.size = size
        self._store: Dict = {}
        self._order: List = []

    def get(self, key, loader_fn):
        if self.size == 0:
            return loader_fn(key)
        if key in self._store:
            return self._store[key]
        value = loader_fn(key)
        if len(self._store) >= self.size:
            evict = self._order.pop(0)
            del self._store[evict]
        self._store[key] = value
        self._order.append(key)
        return value


class RLBenchDataset:
    def __init__(
        self,
        root,
        instructions: Optional[Dict] = None,
        taskvar: Sequence[Tuple[str, int]] = (("close_door", 0),),
        max_episode_length: int = 5,
        cache_size: int = 0,
        max_episodes_per_task: int = 100,
        num_iters: Optional[int] = None,
        cameras: Sequence[str] = ("wrist", "left_shoulder", "right_shoulder"),
        training: bool = True,
        gripper_loc_bounds=None,
        image_rescale: Tuple[float, float] = (1.0, 1.0),
        point_cloud_rotate_yaw_range: float = 0.0,
        return_low_lvl_trajectory: bool = False,
        dense_interpolation: bool = False,
        interpolation_length: int = 100,
        action_dim: int = 8,
        seed: int = 0,
        augment_host: bool = True,
    ):
        """augment_host=False skips the host-side Resize/Rotate so the
        jitted training step can apply them on-device instead
        (data.device_augment.make_device_augment) — the host then only
        decodes and stacks."""
        self._cameras = list(cameras)
        self._max_episode_length = max_episode_length
        self._num_iters = num_iters
        self._training = training
        self._return_low_lvl_trajectory = return_low_lvl_trajectory
        self._action_dim = action_dim
        self._interpolation_length = interpolation_length
        self._rng = np.random.default_rng(seed)
        if isinstance(root, (Path, str)):
            root = [Path(root)]
        self._root = [Path(r).expanduser() for r in root]

        if return_low_lvl_trajectory:
            self._interpolate_traj = TrajectoryInterpolator(
                use=dense_interpolation,
                interpolation_length=interpolation_length,
            )

        # keep only instructions for present task variations
        self._instructions = defaultdict(dict)
        self._num_vars = Counter()
        for r, (task, var) in itertools.product(self._root, taskvar):
            if (r / f"{task}+{var}").is_dir():
                if instructions is not None:
                    self._instructions[task][var] = instructions[task][var]
                self._num_vars[task] += 1

        self._augment_host = augment_host
        if training and augment_host:
            self._resize = Resize(scales=image_rescale, rng=self._rng)
            self._rotate = Rotate(
                gripper_loc_bounds=np.asarray(
                    gripper_loc_bounds
                    if gripper_loc_bounds is not None
                    else [[-2, -2, -2], [2, 2, 2]],
                    np.float64,
                ),
                yaw_range=point_cloud_rotate_yaw_range,
                rng=self._rng,
            )

        # episode file list, split equally over variations, then capped
        # per task (semantics follow dataset_engine.py; structure here is
        # a two-pass scan + cap helper)
        per_var_cap = None
        if max_episodes_per_task > -1:
            per_var_cap = {
                task: max_episodes_per_task // n + 1
                for task, n in self._num_vars.items()
            }
        episodes_by_task = defaultdict(list)
        for r, (task, var) in itertools.product(self._root, taskvar):
            found = self._scan_variation_dir(
                r / f"{task}+{var}", task, var,
                None if per_var_cap is None else per_var_cap[task],
            )
            episodes_by_task[task] += found

        self._episodes = []
        for task, eps in episodes_by_task.items():
            if -1 < max_episodes_per_task < len(eps):
                idx = self._rng.choice(
                    len(eps), size=max_episodes_per_task, replace=False
                )
                eps = [eps[i] for i in idx]
            self._episodes += eps
        self._num_episodes = len(self._episodes)
        self._cache = _Cache(cache_size)
        log.info(
            "RLBenchDataset ready: %d episode files under %s (%d taskvars)",
            self._num_episodes, [str(r) for r in self._root], len(taskvar),
        )

    @staticmethod
    def _scan_variation_dir(data_dir, task, var, cap):
        """List episode files for one task+variation directory (capped)."""
        if not data_dir.is_dir():
            log.warning("missing taskvar directory: %s", data_dir)
            return []
        found = [
            (task, var, ep)
            for pattern in ("*.npy", "*.dat", "*.pkl")
            for ep in sorted(data_dir.glob(pattern))
        ]
        if cap is not None:
            found = found[:cap]
        if not found:
            log.warning("no episode files in %s", data_dir)
        return found

    # ------------------------------------------------------------------
    def __len__(self):
        return self._num_iters if self._num_iters is not None else self._num_episodes

    def _load(self, episode_id: int):
        episode_id %= self._num_episodes
        task, variation, file = self._episodes[episode_id]
        episode = self._cache.get(file, load_episode)
        return task, variation, episode

    def _frames_to_sample(self, task, variation, episode, frame_ids):
        """Assemble a sample dict for the given frame ids (numpy)."""
        # np.stack already yields a fresh buffer; copy=False astypes and
        # in-place rgb unnormalisation avoid three further full-image
        # copies per sample (the host path is memory-bandwidth-bound)
        states = np.stack([episode[1][i] for i in frame_ids]).astype(
            np.float32, copy=False
        )

        if episode[3]:
            cameras = list(episode[3][0].keys())
            assert all(c in cameras for c in self._cameras)
            index = [cameras.index(c) for c in self._cameras]
            if index != list(range(len(cameras))):
                states = states[:, index]

        rgbs = states[:, :, 0]
        rgbs *= 0.5  # stored [-1, 1] -> [0, 1] in place
        rgbs += 0.5  # (dataset_engine.py:135-137)
        pcds = states[:, :, 1]
        action = np.concatenate(
            [episode[2][i] for i in frame_ids]
        ).astype(np.float32)

        if self._instructions:
            options = self._instructions[task][variation]
            instr = options[self._rng.integers(len(options))]
            instr = np.repeat(
                np.asarray(instr, np.float32)[None], len(rgbs), axis=0
            )
        else:
            instr = np.zeros((len(rgbs), 53, 512), np.float32)

        gripper = np.concatenate(
            [episode[4][i] for i in frame_ids]
        ).astype(np.float32)
        gripper_history = np.stack(
            [
                np.concatenate(
                    [episode[4][max(0, i - 2)] for i in frame_ids]
                ),
                np.concatenate(
                    [episode[4][max(0, i - 1)] for i in frame_ids]
                ),
                gripper,
            ],
            axis=1,
        ).astype(np.float32)

        traj = traj_mask = None
        if self._return_low_lvl_trajectory:
            items = [
                self._interpolate_traj(np.asarray(episode[5][i], np.float64))
                for i in frame_ids
            ]
            max_l = max(
                self._interpolation_length, max(len(t) for t in items)
            )
            traj = np.zeros((len(items), max_l, 8), np.float32)
            traj_mask = np.ones((len(items), max_l), bool)
            for i, item in enumerate(items):
                traj[i, : len(item)] = item
                traj_mask[i, : len(item)] = False

        if self._training and self._augment_host:
            pcds, gripper, action, traj = self._rotate(
                pcds, gripper, action, traj
            )
            modals = self._resize(rgbs=rgbs, pcds=pcds)
            rgbs, pcds = modals["rgbs"], modals["pcds"]

        sample = {
            "task": [task for _ in frame_ids],
            "rgbs": rgbs.astype(np.float32, copy=False),
            "pcds": pcds.astype(np.float32, copy=False),
            "action": action[..., : self._action_dim],
            "instr": instr,
            "curr_gripper": gripper[..., : self._action_dim],
            "curr_gripper_history": gripper_history[..., : self._action_dim],
        }
        if traj is not None:
            sample["trajectory"] = traj[..., : self._action_dim]
            sample["trajectory_mask"] = traj_mask
        return sample

    def get_frame(self, episode_id: int, frame_index: Optional[int] = None):
        """One (episode, frame) sample — the fixed-shape training unit."""
        task, variation, episode = self._load(episode_id)
        if episode is None:
            return None
        n_frames = len(episode[0])
        if frame_index is None:
            frame_index = int(self._rng.integers(n_frames))
        frame_ids = [episode[0][frame_index % n_frames]]
        return self._frames_to_sample(task, variation, episode, frame_ids)

    def get_chunk(self, episode_id: int, chunk: Optional[int] = None):
        """Reference-style chunk of up to max_episode_length frames
        (dataset_engine.py:159-168)."""
        task, variation, episode = self._load(episode_id)
        if episode is None:
            return None
        n_chunks = math.ceil(len(episode[0]) / self._max_episode_length)
        if chunk is None:
            chunk = int(self._rng.integers(n_chunks))
        frame_ids = episode[0][
            chunk * self._max_episode_length : (chunk + 1)
            * self._max_episode_length
        ]
        return self._frames_to_sample(task, variation, episode, frame_ids)

    __getitem__ = get_chunk

    # ------------------------------------------------------------------
    def sample_batch(self, batch_size: int) -> Dict[str, np.ndarray]:
        """Fixed-shape batch of `batch_size` random frames."""
        samples = []
        while len(samples) < batch_size:
            s = self.get_frame(int(self._rng.integers(self._num_episodes)))
            if s is not None:
                samples.append(s)
        out: Dict[str, np.ndarray] = {}
        for key in samples[0]:
            if key == "task":
                out["task"] = [t for s in samples for t in s["task"]]
            else:
                out[key] = np.concatenate([s[key] for s in samples], axis=0)
        return out
