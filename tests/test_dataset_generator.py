"""Demo-generation fidelity tests (VERDICT round-1 missing #7).

Sim-free: fake demos/envs exercise the save -> verify -> cleanup retry
loop, the variation-number file, the deterministic numpy seed-state
capture/replay protocol (reference dataset_generator.py:58-120), and the
PNG-count validation (reference :270-327).
"""

import numpy as np
import pytest

from act3d_tpu.preprocessing.dataset_generator import (
    collect_and_save_episode,
    collect_seeded_demo,
    save_demo,
    verify_demo_and_rgbs,
)

CAMS = ("left_shoulder", "wrist")


class FakeObs:
    def __init__(self, rng):
        for cam in CAMS:
            setattr(self, f"{cam}_rgb",
                    rng.integers(0, 255, (16, 16, 3), dtype=np.uint8))
            setattr(self, f"{cam}_depth",
                    rng.uniform(0, 1, (16, 16)).astype(np.float32))
            setattr(self, f"{cam}_mask",
                    rng.integers(0, 10, (16, 16)).astype(np.uint8))


class FakeDemo(list):
    random_seed = None


def make_demo(n=4, seed=0):
    rng = np.random.default_rng(seed)
    return FakeDemo(FakeObs(rng) for _ in range(n))


def test_save_and_verify_roundtrip(tmp_path):
    demo = make_demo(4)
    path = tmp_path / "episode0"
    save_demo(demo, path, CAMS, variation=3)
    verify_demo_and_rgbs(demo, path, CAMS)
    assert (path / "variation_number.pkl").exists()
    import pickle

    assert pickle.load(open(path / "variation_number.pkl", "rb")) == 3
    # obs arrays were nulled after saving (RLBench stored-demo convention)
    assert demo[0].left_shoulder_rgb is None


def test_verify_detects_missing_png(tmp_path):
    demo = make_demo(4)
    path = tmp_path / "episode0"
    save_demo(demo, path, CAMS)
    victim = next((path / "wrist_depth").glob("*.png"))
    victim.unlink()
    with pytest.raises(AssertionError, match="wrist_depth"):
        verify_demo_and_rgbs(demo, path, CAMS)


class SeededFakeEnv:
    """get_demos content depends on the global numpy RNG, like RLBench's
    scene randomisation does."""

    def __init__(self):
        self.resets = 0

    def reset(self):
        self.resets += 1

    def get_demos(self, amount, live_demos):
        rng_draw = np.random.uniform(size=3)  # consumes global np RNG
        demo = make_demo(3, seed=int(rng_draw[0] * 1e6))
        demo.content_signature = rng_draw
        return [demo]


def test_seed_state_capture_and_replay():
    np.random.seed(7)
    env = SeededFakeEnv()
    demo1 = collect_seeded_demo(env)
    assert demo1.random_seed is not None
    sig1 = demo1.content_signature

    # perturb the global RNG, then replay with the captured state
    np.random.uniform(size=100)
    demo2 = collect_seeded_demo(env, random_seed_state=demo1.random_seed)
    np.testing.assert_array_equal(sig1, demo2.content_signature)

    # without the seed state, a different demo comes out
    demo3 = collect_seeded_demo(env)
    assert not np.array_equal(sig1, demo3.content_signature)


class FlakyEnv(SeededFakeEnv):
    def __init__(self, fail_first=1):
        super().__init__()
        self._fail = fail_first

    def get_demos(self, amount, live_demos):
        if self._fail > 0:
            self._fail -= 1
            raise ValueError("sim glitch")
        return super().get_demos(amount, live_demos)


def test_collect_and_save_retries_and_cleans_up(tmp_path):
    path = tmp_path / "episode0"
    demo = collect_and_save_episode(
        FlakyEnv(fail_first=2), path, CAMS, variation=0, max_attempts=5
    )
    verify_demo_and_rgbs(demo, path, CAMS)


def test_collect_and_save_gives_up_and_removes_partial(tmp_path):
    path = tmp_path / "episode0"
    with pytest.raises(RuntimeError, match="failed after 3 attempts"):
        collect_and_save_episode(
            FlakyEnv(fail_first=99), path, CAMS, variation=0, max_attempts=3
        )
    assert not path.exists()
