"""Multi-process shared-memory sampler: schema, liveness, recycling."""

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


def _factory(root):
    instructions = make_instructions(("pick_and_lift",), (0,))

    def make(seed):
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

    return make


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
