"""Data engine tests: native blosc codec (validated against the system
libblosc oracle), episode I/O, dataset assembly, augmentations."""

import ctypes
import pickle

import numpy as np
import pytest

from act3d_tpu.data import native
from act3d_tpu.data.augment import Resize, TrajectoryInterpolator
from act3d_tpu.data.dataset import RLBenchDataset
from act3d_tpu.data.episode import load_episode, save_episode
from act3d_tpu.data.fixtures import make_dataset_tree, make_episode, make_instructions


# ------------------------------------------------------------ native codec


def _oracle():
    try:
        lib = ctypes.CDLL("libblosc.so.1")
    except OSError:
        pytest.skip("system libblosc not available")
    lib.blosc_compress_ctx.restype = ctypes.c_int
    return lib


def _oracle_compress(lib, data, typesize=8, clevel=9, shuffle=1):
    dest = ctypes.create_string_buffer(len(data) + 1024)
    n = lib.blosc_compress_ctx(
        clevel, shuffle, ctypes.c_size_t(typesize), ctypes.c_size_t(len(data)),
        data, dest, ctypes.c_size_t(len(dest)), b"blosclz",
        ctypes.c_size_t(0), 1,
    )
    assert n > 0
    return dest.raw[:n]


@pytest.mark.parametrize(
    "payload",
    [
        b"",
        b"hello world",
        bytes(100_000),
        np.arange(50_000, dtype=np.int64).tobytes(),
        (b"abcdefgh" * 5000),
    ],
    ids=["empty", "small", "zeros", "seq", "repeat"],
)
def test_native_decoder_matches_libblosc(payload):
    lib = _oracle()
    comp = _oracle_compress(lib, payload)
    assert native.decompress(comp) == payload


def test_native_decoder_random_and_pickle(rng):
    lib = _oracle()
    rand = rng.integers(0, 256, 200_000).astype(np.uint8).tobytes()
    assert native.decompress(_oracle_compress(lib, rand)) == rand
    blob = pickle.dumps(
        {"a": np.arange(1000.0), "b": [np.ones((7, 13), np.float32)] * 3}
    )
    assert native.decompress(_oracle_compress(lib, blob)) == blob


def test_native_decoder_typesize_variants(rng):
    lib = _oracle()
    data = rng.normal(size=4096).astype(np.float64).tobytes()
    for typesize in (1, 2, 4, 8, 16):
        comp = _oracle_compress(lib, data, typesize=typesize)
        assert native.decompress(comp) == data, f"typesize {typesize}"


def test_native_decoder_noshuffle(rng):
    lib = _oracle()
    data = np.arange(8192, dtype=np.float32).tobytes()
    comp = _oracle_compress(lib, data, shuffle=0)
    assert native.decompress(comp) == data


def test_pack_memcpy_round_trip_and_oracle():
    lib = _oracle()
    blob = b"payload" * 999
    packed = native.pack_memcpy(blob)
    assert native.decompress(packed) == blob
    dest = ctypes.create_string_buffer(len(blob))
    n = lib.blosc_decompress_ctx(
        packed, dest, ctypes.c_size_t(len(blob)), 1
    )
    assert n == len(blob) and dest.raw == blob


def test_invalid_container_raises():
    with pytest.raises(ValueError):
        native.decompress(b"short")


def test_native_decoder_multiblock_shuffled_leftover(rng):
    """Regression: incompressible payloads larger than one blosc block
    (~1 MiB at clevel 9) end with a shuffled leftover block stored as a
    single raw stream — the decoder must unshuffle it too (real 256²
    episodes are multi-MB, so this is the production shape)."""
    lib = _oracle()
    for n in (2_000_000, 5_000_000):
        rand = rng.integers(0, 256, n).astype(np.uint8).tobytes()
        assert native.decompress(_oracle_compress(lib, rand)) == rand


def test_native_decoder_multiblock_mixed_compressibility(rng):
    """Multi-block container whose blocks mix compressed / raw / zero
    splits."""
    lib = _oracle()
    parts = [
        bytes(1_500_000),  # zeros: RLE splits
        rng.integers(0, 256, 1_500_000).astype(np.uint8).tobytes(),  # raw
        np.arange(200_000, dtype=np.int64).tobytes(),  # compressible
    ]
    data = b"".join(parts)
    assert native.decompress(_oracle_compress(lib, data)) == data


def test_native_decoder_multiblock_noshuffle(rng):
    """Unshuffled multi-block data still splits into per-lane streams in
    c-blosc (split policy is shuffle-independent)."""
    lib = _oracle()
    data = rng.integers(0, 256, 3_000_000).astype(np.uint8).tobytes()
    comp = _oracle_compress(lib, data, shuffle=0)
    assert native.decompress(comp) == data


def test_full_scale_episode_round_trip(tmp_path):
    """save_episode -> load_episode at the production episode scale
    (3 cams, 256², multi-frame) — exercises the multi-block codec path."""
    ep = make_episode(image_size=256, n_cam=3, n_frames=3, seed=7)
    save_episode(tmp_path / "big.dat", ep)
    assert (tmp_path / "big.dat").stat().st_size > 2_000_000
    out = load_episode(tmp_path / "big.dat")
    assert out is not None
    np.testing.assert_array_equal(out[1], ep[1])


# ------------------------------------------------------------- episode I/O


def test_episode_save_load_round_trip(tmp_path):
    ep = make_episode(n_frames=2, n_cam=2, image_size=16)
    path = tmp_path / "ep0.dat"
    save_episode(path, ep)
    loaded = load_episode(path)
    assert loaded[0] == ep[0]
    np.testing.assert_allclose(loaded[1][0], ep[1][0])
    np.testing.assert_allclose(loaded[5][1], ep[5][1])


# ---------------------------------------------------------------- dataset


@pytest.fixture(scope="module")
def fixture_tree(tmp_path_factory):
    root = tmp_path_factory.mktemp("episodes")
    make_dataset_tree(
        root,
        tasks=("pick_and_lift", "close_door"),
        variations=(0,),
        episodes_per_variation=2,
        n_frames=3,
        n_cam=3,
        image_size=32,
    )
    return root


def _make_dataset(root, **kw):
    defaults = dict(
        root=root,
        instructions=make_instructions(("pick_and_lift", "close_door"), (0,)),
        taskvar=[("pick_and_lift", 0), ("close_door", 0)],
        cameras=("wrist", "left_shoulder", "right_shoulder"),
        training=True,
        gripper_loc_bounds=np.array([[-2.0, -2.0, -2.0], [2.0, 2.0, 2.0]]),
        image_rescale=(0.75, 1.25),
    )
    defaults.update(kw)
    return RLBenchDataset(**defaults)


def test_dataset_keypose_batch(fixture_tree):
    ds = _make_dataset(fixture_tree)
    assert len(ds._episodes) == 4
    batch = ds.sample_batch(4)
    assert batch["rgbs"].shape == (4, 3, 3, 32, 32)
    assert batch["pcds"].shape == (4, 3, 3, 32, 32)
    assert batch["action"].shape == (4, 8)
    assert batch["curr_gripper"].shape == (4, 8)
    assert batch["curr_gripper_history"].shape == (4, 3, 8)
    assert batch["instr"].shape == (4, 53, 512)
    assert len(batch["task"]) == 4
    # rgb unnormalised to [0, 1]
    assert batch["rgbs"].min() >= 0.0 and batch["rgbs"].max() <= 1.0


def test_dataset_trajectory_batch(fixture_tree):
    ds = _make_dataset(
        fixture_tree,
        return_low_lvl_trajectory=True,
        dense_interpolation=True,
        interpolation_length=20,
        action_dim=7,
    )
    batch = ds.sample_batch(3)
    assert batch["trajectory"].shape == (3, 20, 7)
    assert batch["trajectory_mask"].shape == (3, 20)
    assert not batch["trajectory_mask"].any()  # dense interp: no padding
    q = batch["trajectory"][..., 3:7]
    np.testing.assert_allclose(
        np.linalg.norm(q, axis=-1), 1.0, atol=1e-5
    )


def test_dataset_chunk_matches_reference_layout(fixture_tree):
    ds = _make_dataset(fixture_tree, training=False)
    chunk = ds.get_chunk(0, chunk=0)
    assert chunk["rgbs"].shape[0] == 3  # all 3 frames in one chunk
    assert chunk["action"].shape == (3, 8)


# ------------------------------------------------------------ augmentations


def test_resize_preserves_shape(rng):
    r = Resize((0.75, 1.25), rng=np.random.default_rng(0))
    x = rng.normal(size=(2, 3, 3, 32, 32)).astype(np.float32)
    out = r(rgbs=x, pcds=x.copy())
    assert out["rgbs"].shape == x.shape
    np.testing.assert_allclose(out["rgbs"], out["pcds"])  # aligned transform


def test_trajectory_interpolator_endpoints(rng):
    interp = TrajectoryInterpolator(use=True, interpolation_length=30)
    traj = rng.normal(size=(11, 8)).astype(np.float64)
    traj[:, 3:7] /= np.linalg.norm(traj[:, 3:7], axis=-1, keepdims=True)
    out = interp(traj)
    assert out.shape == (30, 8)
    np.testing.assert_allclose(out[0, :3], traj[0, :3], atol=1e-6)
    np.testing.assert_allclose(out[-1, :3], traj[-1, :3], atol=1e-6)
    np.testing.assert_allclose(
        np.linalg.norm(out[:, 3:7], axis=-1), 1.0, atol=1e-6
    )
