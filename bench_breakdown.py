"""Per-stage timing breakdown of the diffusion training step.

Times (jitted, on-device, 100-rep means):
  backbone+FPN forward | full context encode | denoiser forward |
  full loss forward | full train step (fwd+bwd+opt)

Guides kernel/precision work: if the frozen backbone dominates, attention
fusion can't move the headline number.
"""

from __future__ import annotations

import os
import time

import jax
import jax.numpy as jnp


def _scalarize(fn):
    """Wrap a jittable fn so it returns the f32 sum of all outputs — a
    4-byte host readback that still forces full execution."""

    def wrapped(*args):
        out = fn(*args)
        leaves = jax.tree_util.tree_leaves(out)
        return sum(jnp.sum(l.astype(jnp.float32)) for l in leaves)

    return jax.jit(wrapped)


def timeit(fn, *args, reps=20):
    """Median of per-rep times with a scalar host readback each rep —
    through the device tunnel, block_until_ready alone under-reports
    (BENCH_NOTES)."""
    import numpy as np

    float(fn(*args))
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(fn(*args))
        times.append(time.perf_counter() - t0)
    return float(np.median(times))


def main():
    batch = int(os.environ.get("BENCH_BATCH", "22"))
    ncam = int(os.environ.get("BENCH_NCAM", "3"))
    size = int(os.environ.get("BENCH_IMAGE_SIZE", "256"))
    traj_len = int(os.environ.get("BENCH_TRAJ_LEN", "50"))
    bf16 = os.environ.get("BENCH_BF16", "1") == "1"
    dtype = jnp.bfloat16 if bf16 else None

    from act3d_tpu.core.cache import enable_compilation_cache

    enable_compilation_cache()

    from act3d_tpu.models.diffusion_planner import DiffusionPlanner
    from act3d_tpu.parallel.mesh import make_mesh, shard_batch
    from act3d_tpu.train.engine import Trainer
    from act3d_tpu.train.flagship import (
        _cast_tree,
        diffusion_loss_fn,
        make_diffusion_model,
    )
    from act3d_tpu.utils.testing import synthetic_trajectory_batch

    model = make_diffusion_model(image_size=(size, size))
    data = synthetic_trajectory_batch(
        batch=batch, ncam=ncam, image_size=(size, size), traj_len=traj_len
    )
    variables = model.init(
        jax.random.PRNGKey(0),
        data["trajectory"], data["trajectory_mask"], data["rgbs"],
        data["pcds"], data["instr"], data["curr_gripper"], data["action"],
        noise_rng=jax.random.PRNGKey(1),
    )
    params = _cast_tree(variables["params"], dtype)
    data_c = {
        k: (_cast_tree(v, dtype) if k != "trajectory_mask" else v)
        for k, v in data.items()
    }

    # 1. backbone + FPN (visual encoder alone)
    visual_fn = _scalarize(
        lambda p, rgb, pcd: model.apply(
            {"params": p}, rgb, pcd,
            method=lambda m, rgb_, pcd_: m.head.visual_encoder(rgb_, pcd_),
        )
    )
    t_visual = timeit(visual_fn, params, data_c["rgbs"], data_c["pcds"])

    # 2. full context encode (visual + token encoders + normalisation)
    raw_encode = lambda p, rgb, pcd, instr, grip, goal: model.apply(
        {"params": p}, rgb, pcd, instr, grip, goal,
        method=DiffusionPlanner.encode,
    )
    encode_fn = _scalarize(raw_encode)
    t_encode = timeit(
        encode_fn, params, data_c["rgbs"], data_c["pcds"], data_c["instr"],
        data_c["curr_gripper"], data_c["action"],
    )

    # 3. denoiser trunk alone (context precomputed)
    context, curr, goal = jax.jit(raw_encode)(
        params, data_c["rgbs"], data_c["pcds"], data_c["instr"],
        data_c["curr_gripper"], data_c["action"],
    )
    traj9 = jnp.concatenate(
        [data_c["trajectory"], data_c["trajectory"][..., :2]], axis=-1
    )
    denoise_fn = _scalarize(
        lambda p, t, m, ts, ctx: model.apply(
            {"params": p}, t, m, ts, ctx,
            method=DiffusionPlanner.denoise_step,
        )
    )
    ts = jnp.zeros((batch,), jnp.int32)
    t_denoise = timeit(
        denoise_fn, params, traj9, data["trajectory_mask"], ts, context
    )

    # 4. full loss forward
    loss_fn = diffusion_loss_fn(model, dtype)
    fwd = jax.jit(lambda p, b, k: loss_fn(p, b, k)[0])
    t_fwd = timeit(fwd, variables["params"], data, jax.random.PRNGKey(2))

    # 5. full train step
    mesh = make_mesh(num_devices=1)
    trainer = Trainer(loss_fn, variables["params"], mesh=mesh)
    dev_batch = shard_batch(data, mesh)

    def step(key):
        return trainer.step(dev_batch, key)["loss"]

    t_step = timeit(step, jax.random.PRNGKey(3))

    per = lambda t: f"{t * 1e3:8.2f} ms  ({batch / t:8.1f} samples/s)"
    print(f"batch={batch} ncam={ncam} size={size} bf16={bf16}")
    print(f"backbone+FPN fwd : {per(t_visual)}")
    print(f"context encode   : {per(t_encode)}")
    print(f"denoiser fwd     : {per(t_denoise)}")
    print(f"loss fwd         : {per(t_fwd)}")
    print(f"train step       : {per(t_step)}")


if __name__ == "__main__":
    main()
