"""Input-pipeline benchmark: host batch assembly + end-to-end training.

Answers VERDICT.md round-1 weak #5: can the host feed the chip at training
speed?  Three measurements at the reference's training scale (3 cameras,
256x256 RGB-D, batch 22 diffusion / 16 act3d):

  1. `sample_batch` throughput, cache-cold (blosc decode in the loop) and
     cache-warm (decode amortised, assembly + augmentation only);
  2. per-stage breakdown (decode / frame assembly / augment);
  3. end-to-end jitted training steps with FRESH batches through the
     DeviceFeeder, against the fixed-batch compute-only number.

Usage:
  python bench_data.py               # host-only numbers (runs on CPU)
  BENCH_E2E=1 python bench_data.py   # adds the on-device e2e run

Writes one JSON line per measurement.
"""

from __future__ import annotations

import functools
import json
import os
import tempfile
import time
from pathlib import Path

import numpy as np


def _time(fn, iters, warmup=2):
    for _ in range(warmup):
        fn()
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        fn()
        times.append(time.perf_counter() - t0)
    return float(np.median(times))


def build_dataset(
    root, *, training=True, cache_size=100, traj=True, seed=0,
    augment_host=True,
):
    from act3d_tpu.data.dataset import RLBenchDataset
    from act3d_tpu.data.fixtures import make_instructions

    tasks = ["pick_and_lift", "push_button"]
    instructions = make_instructions(tasks, (0,))
    return RLBenchDataset(
        root,
        instructions=instructions,
        taskvar=[(t, 0) for t in tasks],
        cache_size=cache_size,
        training=training,
        image_rescale=(0.75, 1.25),  # reference train_trajectory.sh:28
        return_low_lvl_trajectory=traj,
        dense_interpolation=True,
        interpolation_length=50,
        action_dim=7,
        seed=seed,
        augment_host=augment_host,
    )


def make_fixture_tree(tmp, n_episodes=4, n_frames=4, image_size=256):
    from act3d_tpu.data.fixtures import make_dataset_tree

    return make_dataset_tree(
        Path(tmp),
        tasks=("pick_and_lift", "push_button"),
        variations=(0,),
        episodes_per_variation=n_episodes,
        n_frames=n_frames,
        n_cam=3,
        image_size=image_size,
    )


def _mp_worker_dataset(root, seed):
    """Module-level (picklable) factory for the forkserver/spawn workers."""
    return build_dataset(root, cache_size=100, seed=seed)


def emit(metric, value, unit):
    print(json.dumps({"metric": metric, "value": round(value, 3), "unit": unit}))


def main():
    batch = int(os.environ.get("BENCH_BATCH", "22"))
    iters = int(os.environ.get("BENCH_ITERS", "10"))

    with tempfile.TemporaryDirectory() as tmp:
        t0 = time.perf_counter()
        root = make_fixture_tree(tmp)
        print(f"# fixtures written in {time.perf_counter() - t0:.1f}s")

        # -- cache-cold: decode dominates
        cold = build_dataset(root, cache_size=0)
        dt = _time(lambda: cold.sample_batch(batch), max(iters // 3, 3), warmup=1)
        emit("data_cold_samples_per_sec", batch / dt, "samples/sec")

        # -- cache-warm: assembly + augmentation only
        warm = build_dataset(root, cache_size=100)
        warm.sample_batch(batch)  # fill cache
        dt_warm = _time(lambda: warm.sample_batch(batch), iters)
        emit("data_warm_samples_per_sec", batch / dt_warm, "samples/sec")

        # -- breakdown: frames-only (no augment) vs full
        plain = build_dataset(root, cache_size=100, training=False)
        plain.sample_batch(batch)
        dt_plain = _time(lambda: plain.sample_batch(batch), iters)
        emit("data_noaugment_samples_per_sec", batch / dt_plain, "samples/sec")
        emit("data_augment_ms_per_batch", (dt_warm - dt_plain) * 1e3, "ms")

        # -- device-augment mode: host decodes + stacks only, the resize /
        # yaw-rotate run inside the jitted step (data/device_augment.py)
        dev = build_dataset(root, cache_size=100, augment_host=False)
        dev.sample_batch(batch)
        dt_dev = _time(lambda: dev.sample_batch(batch), iters)
        emit(
            "data_deviceaugment_host_samples_per_sec",
            batch / dt_dev,
            "samples/sec",
        )

        # -- multi-process sampler (if present)
        try:
            from act3d_tpu.data.pipeline import MultiProcessSampler
        except ImportError:
            MultiProcessSampler = None
        if MultiProcessSampler is not None:
            n_workers = int(os.environ.get("BENCH_WORKERS", "2"))
            sampler = MultiProcessSampler(
                functools.partial(_mp_worker_dataset, root),
                batch_size=batch,
                num_workers=n_workers,
                slots_per_worker=2,
            )
            try:
                next(sampler)  # warm start
                dt_mp = _time(lambda: next(sampler), iters)
                emit(
                    f"data_mp{n_workers}_samples_per_sec",
                    batch / dt_mp,
                    "samples/sec",
                )
            finally:
                sampler.close()

        if os.environ.get("BENCH_E2E", "0") != "1":
            return

        # -- end-to-end: jitted train steps with fresh batches
        import jax

        from act3d_tpu.core.cache import enable_compilation_cache, enable_fast_prng
        from act3d_tpu.data.feeder import DeviceFeeder
        from act3d_tpu.parallel.mesh import batch_sharding, make_mesh
        from act3d_tpu.train.engine import Trainer

        enable_compilation_cache()
        enable_fast_prng()
        import jax.numpy as jnp

        from bench import build_diffusion

        loss_fn, variables, _ = build_diffusion(batch, 3, 256, 50, jnp.bfloat16)
        mesh = make_mesh(num_devices=1)
        trainer = Trainer(loss_fn, variables["params"], mesh=mesh)

        compact = os.environ.get("BENCH_COMPACT", "0") == "1"
        if compact:
            from act3d_tpu.data.compact import compact_batch

        def host_batch():
            b = warm.sample_batch(batch)
            b.pop("task", None)
            b.pop("curr_gripper_history", None)
            return compact_batch(b) if compact else b

        feeder = DeviceFeeder(host_batch, sharding=batch_sharding(mesh), prefetch=2)
        try:
            rng = jax.random.PRNGKey(0)

            def run_chain(k):
                """k async-dispatched steps, ONE final block: real training
                never syncs per step, and a per-step block here would time
                the tunnel's 30-100 ms RPC RTT, not the pipeline
                (BENCH_NOTES.md methodology)."""
                nonlocal rng
                out = None
                for _ in range(k):
                    rng, sub = jax.random.split(rng)
                    out = trainer.step(next(feeder), sub)
                jax.block_until_ready(out["loss"])

            run_chain(2)  # compile + warm
            chain = max(iters, 10)
            dt_e2e = _time(lambda: run_chain(chain), 3, warmup=1) / chain
            name = "e2e_compact" if compact else "e2e"
            emit(f"{name}_train_samples_per_sec", batch / dt_e2e, "samples/sec")
        finally:
            feeder.close()


if __name__ == "__main__":
    main()
