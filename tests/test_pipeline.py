"""Multi-process shared-memory sampler: schema, liveness, recycling.

The sampler starts workers via forkserver/spawn (never fork — the parent
runs multithreaded JAX), so every factory here is a module-level function
or a functools.partial over one (picklable by reference).
"""

import functools
import time

import numpy as np
import pytest

from act3d_tpu.data.dataset import RLBenchDataset
from act3d_tpu.data.fixtures import make_dataset_tree, make_instructions
from act3d_tpu.data.pipeline import MultiProcessSampler


@pytest.fixture(scope="module")
def data_root(tmp_path_factory):
    return make_dataset_tree(
        tmp_path_factory.mktemp("episodes"),
        tasks=("pick_and_lift",),
        variations=(0,),
        episodes_per_variation=2,
        n_frames=3,
        n_cam=2,
        image_size=16,
    )


def _make_dataset(root, seed):
    instructions = make_instructions(("pick_and_lift",), (0,))
    return RLBenchDataset(
        root,
        instructions=instructions,
        taskvar=[("pick_and_lift", 0)],
        cameras=("wrist", "left_shoulder"),
        cache_size=10,
        training=True,
        return_low_lvl_trajectory=True,
        dense_interpolation=True,
        interpolation_length=8,
        seed=seed,
    )


def _factory(root):
    return functools.partial(_make_dataset, root)


def test_multiprocess_sampler_batches(data_root):
    factory = _factory(data_root)
    ref = factory(0).sample_batch(4)
    with MultiProcessSampler(
        factory, batch_size=4, num_workers=2, slots_per_worker=2
    ) as sampler:
        batches = [next(sampler) for _ in range(6)]
    for b in batches:
        for key, val in ref.items():
            if isinstance(val, np.ndarray):
                assert b[key].shape == val.shape, key
                assert b[key].dtype == val.dtype, key
                assert np.isfinite(b[key]).all(), key
    # different draws across batches (instruction/frame sampling is random)
    assert any(
        not np.array_equal(batches[0]["rgbs"], b["rgbs"]) for b in batches[1:]
    )


def test_multiprocess_sampler_zero_copy(data_root):
    factory = _factory(data_root)
    with MultiProcessSampler(
        factory, batch_size=2, num_workers=1, slots_per_worker=2, copy=False
    ) as sampler:
        a = next(sampler)
        shape = a["rgbs"].shape
        assert np.isfinite(a["rgbs"]).all()
        b = next(sampler)  # a's slot is recycled at this point, not before
        assert b["rgbs"].shape == shape
        assert np.isfinite(b["rgbs"]).all()


def test_zero_copy_views_survive_close(data_root):
    """close() must never unmap memory under a live handed-out batch
    (ADVICE r2: the segments are unlinked but the mapping stays alive
    while views reference it)."""
    factory = _factory(data_root)
    sampler = MultiProcessSampler(
        factory, batch_size=2, num_workers=1, slots_per_worker=2, copy=False
    )
    batch = next(sampler)
    rgbs = batch["rgbs"]
    checksum = float(np.sum(rgbs))
    sampler.close()
    # the view is still readable and unchanged after close()
    assert float(np.sum(rgbs)) == checksum


class _SeedEchoDataset:
    """Batch carries the worker seed + a draw from the worker's RNG."""

    def __init__(self, seed):
        self.seed = seed
        self.rng = np.random.default_rng(seed)

    def sample_batch(self, n):
        return {
            "seed": np.full((n,), self.seed, np.int64),
            "draw": self.rng.random((n, 3)),
        }


def test_workers_have_disjoint_rng_streams():
    """VERDICT r2 #4: each worker owns a distinct seed (1..N) and its own
    RNG stream — no two workers replay the same augmentation sequence."""
    with MultiProcessSampler(
        _SeedEchoDataset, batch_size=3, num_workers=2, slots_per_worker=2
    ) as sampler:
        batches = [next(sampler) for _ in range(8)]
        # keep drawing (bounded) until both workers have delivered at
        # least once — worker startup order is scheduler-dependent
        deadline = time.monotonic() + 60
        while (
            len({int(b["seed"][0]) for b in batches}) < 2
            and time.monotonic() < deadline
        ):
            batches.append(next(sampler))
    seeds = {int(b["seed"][0]) for b in batches}
    assert seeds == {1, 2}  # both workers delivered, with distinct seeds
    by_seed = {}
    for b in batches:
        by_seed.setdefault(int(b["seed"][0]), []).append(b["draw"])
    draws1, draws2 = by_seed[1], by_seed[2]
    # disjoint streams: no draw from worker 1 matches any from worker 2
    for d1 in draws1:
        for d2 in draws2:
            assert not np.array_equal(d1, d2)


class _StallDataset:
    """Worker seed 1 stalls forever; any other worker serves instantly."""

    def __init__(self, seed):
        self.stall = seed == 1

    def sample_batch(self, n):
        if self.stall:
            time.sleep(3600)
        return {"x": np.full((n, 4), 7, np.int64)}


def test_parent_bounded_under_worker_stall():
    """VERDICT r2 #4: a wedged worker must not wedge the parent — the
    other worker's slots keep circulating and batches keep arriving."""
    sampler = MultiProcessSampler(
        _StallDataset, batch_size=2, num_workers=2, slots_per_worker=2
    )
    try:
        t0 = time.monotonic()
        for _ in range(5):
            batch = next(sampler)
            assert int(batch["x"][0, 0]) == 7
        assert time.monotonic() - t0 < 30.0
    finally:
        sampler.close()  # terminates the stalled worker after the join timeout
