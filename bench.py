"""Headline benchmark: ChainedDiffuser training throughput on one TPU chip.

Measures the jitted SPMD training step (forward + backward + AdamW) of the
flagship trajectory-diffusion model at the reference's training scale
(reference scripts/train_trajectory.sh:6-41: batch 22, emb 120, 3 cameras,
256x256 RGB-D, trajectory length 50, instruction + goal conditioning).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "samples/sec/chip", "vs_baseline": N}

vs_baseline is measured throughput divided by an assumed A100 reference of
ASSUMED_A100_SAMPLES_PER_SEC (the reference repo publishes no numbers —
BASELINE.md; this constant documents the assumption).  The north-star target
of >= 3x A100 per chip (BASELINE.json) therefore corresponds to
vs_baseline >= 3.0.
"""

from __future__ import annotations

import json
import os
import sys
import time

import jax
import numpy as np

ASSUMED_A100_SAMPLES_PER_SEC = 80.0


def flops_for(which: str, batch: int, ncam: int = 3, size: int = 256,
              traj_len: int = 50) -> float:
    """XLA's analytic FLOPs for ONE optimizer step (fwd+bwd+AdamW).

    Runs on the CPU backend (invoke in a JAX_PLATFORM_NAME=cpu
    subprocess): the axon TPU client returns None from
    Lowered.cost_analysis, the XLA:CPU one fills it.  FLOPs are a
    property of the HLO, not the backend.
    """
    import jax.numpy as jnp

    from act3d_tpu.parallel.mesh import make_mesh
    from act3d_tpu.train.engine import Trainer

    if which == "act3d":
        loss_fn, variables, data = build_act3d(
            batch, ncam, size, jnp.bfloat16
        )
    else:
        loss_fn, variables, data = build_diffusion(
            batch, ncam, size, traj_len, jnp.bfloat16
        )
    trainer = Trainer(loss_fn, variables["params"], mesh=make_mesh(1))
    ca = trainer._train_step.lower(
        trainer.state, data, jax.random.PRNGKey(9)
    ).cost_analysis()
    return float(ca.get("flops", 0.0)) if ca else 0.0


def build_diffusion(batch, ncam, size, traj_len, compute_dtype=None,
                    augment=None, instr_bank=None):
    from act3d_tpu.train.flagship import diffusion_loss_fn, make_diffusion_model
    from act3d_tpu.utils.testing import synthetic_trajectory_batch

    # BENCH_EMB_DIFFUSION=128 benches the lane-aligned width (the
    # reference's 120 pads to 128 lanes anyway); not reference-parity.
    emb = int(os.environ.get("BENCH_EMB_DIFFUSION", "120"))
    model = make_diffusion_model(image_size=(size, size), embedding_dim=emb)
    data = synthetic_trajectory_batch(
        batch=batch, ncam=ncam, image_size=(size, size), traj_len=traj_len
    )
    variables = model.init(
        jax.random.PRNGKey(0),
        data["trajectory"], data["trajectory_mask"], data["rgbs"],
        data["pcds"], data["instr"], data["curr_gripper"], data["action"],
        noise_rng=jax.random.PRNGKey(1),
    )
    return (
        diffusion_loss_fn(
            model, compute_dtype, augment=augment, instr_bank=instr_bank
        ),
        variables,
        data,
    )


def build_act3d(batch, ncam, size, compute_dtype=None, instr_bank=None):
    from act3d_tpu.train.flagship import keypose_loss_fn, make_keypose_model
    from act3d_tpu.train.losses import KeyposeLossAndMetrics
    from act3d_tpu.utils.testing import synthetic_keypose_batch

    # BENCH_EMB_ACT3D=64 benches the lane-aligned variant: emb 64 / head
    # dim 16 instead of the reference's emb 60 / head dim 15 (which pads
    # to 128 lanes and wastes >50% of the MXU at these dims).  A
    # different model config, not reference-parity — offered as the
    # TPU-recommended configuration.
    emb = int(os.environ.get("BENCH_EMB_ACT3D", "60"))
    # BENCH_APPROX_TOPK=1 swaps the fine-context lax.top_k for TPU
    # approx_max_k (recall ~0.95 over a soft attention context) — a
    # measured-optional config, not reference parity (see BENCH_NOTES).
    model = make_keypose_model(
        image_size=(size, size), embedding_dim=emb,
        approx_topk=os.environ.get("BENCH_APPROX_TOPK", "0") == "1",
    )
    data = synthetic_keypose_batch(batch=batch, ncam=ncam, image_size=(size, size))
    variables = model.init(
        jax.random.PRNGKey(0),
        data["rgbs"], data["pcds"], data["instr"], data["curr_gripper"],
        sample_rng=jax.random.PRNGKey(1), gt_action=data["action"],
    )
    return (
        keypose_loss_fn(
            model, KeyposeLossAndMetrics(), compute_dtype,
            instr_bank=instr_bank,
        ),
        variables,
        data,
    )


def bench_sampler(batch, ncam, size, traj_len, steps):
    """Latency of the full 100-step reverse-diffusion sampler (the
    closed-loop eval hot path; the reference re-encodes the frozen visual
    features every step — ours hoists them out of the lax.scan)."""
    import time

    from act3d_tpu.models import compute_trajectory
    from act3d_tpu.train.flagship import make_diffusion_model
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

    fn = jax.jit(
        lambda params, mask, rgbs, pcds, instr, grip, goal, key:
        compute_trajectory(
            model, {"params": params}, mask, rgbs, pcds, instr, grip, goal,
            key,
        )
    )
    args = (
        variables["params"], data["trajectory_mask"], data["rgbs"],
        data["pcds"], data["instr"], data["curr_gripper"], data["action"],
    )
    np.asarray(fn(*args, jax.random.PRNGKey(2)))  # warmup + host read
    times = []
    for i in range(steps):
        t0 = time.perf_counter()
        np.asarray(fn(*args, jax.random.PRNGKey(3 + i)))
        times.append(time.perf_counter() - t0)
    dt = float(np.median(times))
    print(
        json.dumps(
            {
                "metric": "sampler_100step_latency_ms",
                "value": round(dt * 1000, 2),
                "unit": "ms",
                "vs_baseline": round(dt * 1000, 2),
            }
        )
    )


def bench_act3d_eval(ncam, size, steps):
    """Act3D eval-mode inference latency (batch 1, 10k ghost points — the
    closed-loop keypose component, reference eval1.py:94-133)."""
    import time

    from act3d_tpu.train.flagship import make_keypose_model
    from act3d_tpu.utils.testing import synthetic_keypose_batch

    model = make_keypose_model(image_size=(size, size))
    data = synthetic_keypose_batch(batch=1, ncam=ncam, image_size=(size, size))
    variables = model.init(
        jax.random.PRNGKey(0),
        data["rgbs"], data["pcds"], data["instr"], data["curr_gripper"],
        sample_rng=jax.random.PRNGKey(1), train_mode=False,
    )
    fn = jax.jit(
        lambda p, rgbs, pcds, instr, grip, key: model.apply(
            {"params": p}, rgbs, pcds, instr, grip,
            sample_rng=key, gt_action=None, train_mode=False,
        )["position"]
    )
    args = (
        variables["params"], data["rgbs"], data["pcds"], data["instr"],
        data["curr_gripper"],
    )
    np.asarray(fn(*args, jax.random.PRNGKey(2)))  # warmup + host read
    times = []
    for i in range(steps):
        t0 = time.perf_counter()
        np.asarray(fn(*args, jax.random.PRNGKey(3 + i)))
        times.append(time.perf_counter() - t0)
    dt = float(np.median(times))
    print(
        json.dumps(
            {
                "metric": "act3d_eval_latency_ms",
                "value": round(dt * 1000, 2),
                "unit": "ms",
                "vs_baseline": round(dt * 1000, 2),
            }
        )
    )


def bench_chained_eval(ncam, size, traj_len, steps):
    """Full closed-loop policy latency for ONE keystep: Act3D keypose
    inference (10k ghost points) + goal-conditioned 100-step reverse
    diffusion — the serving hot path of the chained policy
    (reference utils_with_rlbench.py:629-647 does the same two calls
    per keystep)."""
    import time

    import jax.numpy as jnp

    from act3d_tpu.models import compute_trajectory
    from act3d_tpu.train.flagship import (
        make_diffusion_model,
        make_keypose_model,
    )
    from act3d_tpu.utils.testing import (
        synthetic_keypose_batch,
        synthetic_trajectory_batch,
    )

    kmodel = make_keypose_model(image_size=(size, size))
    kdata = synthetic_keypose_batch(batch=1, ncam=ncam, image_size=(size, size))
    kvars = kmodel.init(
        jax.random.PRNGKey(0),
        kdata["rgbs"], kdata["pcds"], kdata["instr"], kdata["curr_gripper"],
        sample_rng=jax.random.PRNGKey(1), train_mode=False,
    )
    tmodel = make_diffusion_model(image_size=(size, size))
    tdata = synthetic_trajectory_batch(
        batch=1, ncam=ncam, image_size=(size, size), traj_len=traj_len
    )
    tvars = tmodel.init(
        jax.random.PRNGKey(0),
        tdata["trajectory"], tdata["trajectory_mask"], tdata["rgbs"],
        tdata["pcds"], tdata["instr"], tdata["curr_gripper"], tdata["action"],
        noise_rng=jax.random.PRNGKey(1),
    )

    # Default: the Actioner's fused serving path — keypose -> goal -> the
    # 100-step sampler as ONE jitted program (one dispatch + one readback
    # per keystep; the reference pays a host round-trip between the models,
    # utils_with_rlbench.py:236-247).  BENCH_CHAINED_FUSED=0 measures the
    # two-dispatch variant for the A/B.
    fused = os.environ.get("BENCH_CHAINED_FUSED", "1") == "1"
    if fused:
        def chained(kp, tp, rgbs, pcds, instr, grip, mask, kkey, tkey):
            pred = kmodel.apply(
                {"params": kp}, rgbs, pcds, instr, grip,
                sample_rng=kkey, gt_action=None, train_mode=False,
            )
            goal = jnp.concatenate(
                [pred["position"], pred["rotation"]], axis=1
            )
            return compute_trajectory(
                tmodel, {"params": tp}, mask, rgbs, pcds, instr,
                grip[:, :7], goal, tkey,
            )

        cfn = jax.jit(chained)

        def keystep(i):
            traj = cfn(
                kvars["params"], tvars["params"], kdata["rgbs"],
                kdata["pcds"], kdata["instr"], kdata["curr_gripper"],
                tdata["trajectory_mask"], jax.random.PRNGKey(10 + i),
                jax.random.PRNGKey(20 + i),
            )
            return np.asarray(traj)  # host readback, as the Mover consumes it
    else:
        kfn = jax.jit(
            lambda p, rgbs, pcds, instr, grip, key: kmodel.apply(
                {"params": p}, rgbs, pcds, instr, grip,
                sample_rng=key, gt_action=None, train_mode=False,
            )
        )
        tfn = jax.jit(
            lambda p, mask, rgbs, pcds, instr, grip, goal, key:
            compute_trajectory(
                tmodel, {"params": p}, mask, rgbs, pcds, instr, grip, goal,
                key,
            )
        )

        def keystep(i):
            pred = kfn(
                kvars["params"], kdata["rgbs"], kdata["pcds"],
                kdata["instr"], kdata["curr_gripper"],
                jax.random.PRNGKey(10 + i),
            )
            goal = jnp.concatenate(
                [pred["position"], pred["rotation"]], axis=1
            )
            traj = tfn(
                tvars["params"], tdata["trajectory_mask"], tdata["rgbs"],
                tdata["pcds"], tdata["instr"], tdata["curr_gripper"], goal,
                jax.random.PRNGKey(20 + i),
            )
            return np.asarray(traj)  # host readback, as the Mover consumes it

    keystep(0)  # compile + warm
    times = []
    for i in range(steps):
        t0 = time.perf_counter()
        keystep(1 + i)
        times.append(time.perf_counter() - t0)
    return float(np.median(times)) * 1000


def bench_e2e(batch, ncam, size, traj_len, compute_dtype, steps=20, chains=3,
              host_aug=None, model="diffusion", wire=None):
    """End-to-end training throughput with FRESH batches through the real
    host pipeline: RLBenchDataset (warm cache) -> compact uint8/u16
    encoding -> async DeviceFeeder -> jitted train step (VERDICT r2 #5:
    the e2e number belongs in the driver-captured bench next to the
    compute-only headline).  Methodology: k async-dispatched steps with
    ONE final block per chain (per-step blocking times the tunnel RTT,
    not the pipeline — BENCH_NOTES.md); median over chains.

    model: "diffusion" (trajectory training, scripts/train_trajectory.sh)
    or "act3d" (keypose training, scripts/train_act3d.sh).
    wire: "pcd" ships the XYZ image (u16 world coords); "depth" ships
    1-channel u16 depth + pinhole params + resize index maps and rebuilds
    the cloud in-jit (data/depthwire.py — exact), plus int32 instruction
    ids against a device-resident bank; ~2x less wire on link-bound
    hosts.  Default from BENCH_E2E_WIRE.

    On this 1-core tunneled VM the number is wire/host-bound — see
    BENCH_NOTES 'Input pipeline' for the per-stage breakdown showing
    neither bound is a property of the framework.  Returns a result dict.
    """
    import tempfile
    from pathlib import Path

    from act3d_tpu.data.compact import compact_batch
    from act3d_tpu.data.dataset import RLBenchDataset
    from act3d_tpu.data.feeder import DeviceFeeder
    from act3d_tpu.data.fixtures import make_dataset_tree, make_instructions
    from act3d_tpu.parallel.mesh import batch_sharding, make_mesh
    from act3d_tpu.train.engine import Trainer

    if wire is None:
        wire = os.environ.get("BENCH_E2E_WIRE", "depth")
    drop = {"task", "curr_gripper_history"}
    if model == "act3d":
        drop |= {"trajectory", "trajectory_mask"}
    with tempfile.TemporaryDirectory() as tmp:
        tasks = ("pick_and_lift", "push_button")
        root = make_dataset_tree(
            Path(tmp), tasks=tasks, variations=(0,),
            episodes_per_variation=2, n_frames=3, n_cam=ncam,
            image_size=size,
        )
        from act3d_tpu.data.fixtures import CAMERAS

        # Default = host-side Resize (reference-style): the same-process
        # r3 A/B measured it faster e2e on this 1-core VM (23.2 vs 17.4
        # samples/s) — the async DeviceFeeder already overlaps the host
        # Resize with device compute, while --device_augment's in-jit
        # gathers cost ~10 ms/step of chip time (BENCH_NOTES round 3).
        # BENCH_E2E_HOST_AUG=0 measures the device-augment path.
        if host_aug is None:
            host_aug = os.environ.get("BENCH_E2E_HOST_AUG", "1") == "1"
        if wire == "depth":
            # the depth wire IS the host-augment path: the Resize rides
            # as index maps and gathers on device (exact), so the
            # device_augment variant does not apply
            host_aug = True

        def make_ds(aug):
            return RLBenchDataset(
                root,
                instructions=make_instructions(tasks, (0,)),
                taskvar=[(t, 0) for t in tasks],
                cameras=CAMERAS[:ncam],  # fixture tree has ncam cameras
                cache_size=100,
                training=True,
                image_rescale=(0.75, 1.25),
                augment_host=aug,
                return_low_lvl_trajectory=model == "diffusion",
                dense_interpolation=True,
                interpolation_length=traj_len,
                action_dim=7,
                seed=0,
                wire=wire,
                instr_mode="ids" if wire == "depth" else "features",
            )

        ds = make_ds(host_aug)
        assert ds.wire == wire, "fixture episodes must ship camera params"
        keys = [k for k in ds.sample_batch(2) if k not in drop]
        ds.sample_batch(batch)  # warm the episode cache

        augment = None
        if not host_aug:
            from act3d_tpu.data.device_augment import make_device_augment

            augment = make_device_augment(image_rescale=(0.75, 1.25))
        if model == "act3d":
            loss_fn, variables, _ = build_act3d(
                batch, ncam, size, compute_dtype,
                instr_bank=ds.instruction_bank,
            )
        else:
            loss_fn, variables, _ = build_diffusion(
                batch, ncam, size, traj_len, compute_dtype, augment=augment,
                instr_bank=ds.instruction_bank,
            )
        mesh = make_mesh(num_devices=1)
        trainer = Trainer(loss_fn, variables["params"], mesh=mesh)

        def host_batch():
            b = ds.sample_batch(batch)
            return compact_batch({k: b[k] for k in keys})

        feeder = DeviceFeeder(
            host_batch, sharding=batch_sharding(mesh), prefetch=2
        )
        try:
            rng = jax.random.PRNGKey(0)

            def run_chain(k):
                nonlocal rng
                out = None
                for _ in range(k):
                    rng, sub = jax.random.split(rng)
                    out = trainer.step(next(feeder), sub)
                jax.block_until_ready(out["loss"])

            run_chain(2)  # compile + warm
            times = []
            for _ in range(chains):
                t0 = time.perf_counter()
                run_chain(steps)
                times.append((time.perf_counter() - t0) / steps)
            chain_sps = sorted(batch / t for t in times)
            sps = float(np.median(chain_sps))

            # ---- per-stage attribution (VERDICT r3 weak #1: the driver
            # artifact must distinguish environment-bound from
            # framework-bound).  Each stage is timed in isolation in this
            # same process/session; the async feeder overlaps host stages
            # with device compute, so sum(stages) >= the e2e step time
            # and `overlap_efficiency` reports how much the pipeline
            # hides.
            def _median_ms(fn, n=5):
                ts = []
                for _ in range(n):
                    t0 = time.perf_counter()
                    fn()
                    ts.append((time.perf_counter() - t0) * 1e3)
                return float(np.median(ts))

            # blosc decode: cold per-episode load (steady-state training
            # on datasets larger than the cache pays this per miss; the
            # fixture tree fits in cache so the chained number above
            # excludes it)
            from act3d_tpu.data.episode import load_episode

            ep_file = ds._episodes[0][2]
            decode_ep_ms = _median_ms(lambda: load_episode(ep_file))

            sample_ms = _median_ms(lambda: ds.sample_batch(batch), n=3)
            aug_ms = 0.0
            if host_aug:
                ds_noaug = make_ds(False)
                ds_noaug.sample_batch(batch)  # warm
                noaug_ms = _median_ms(
                    lambda: ds_noaug.sample_batch(batch), n=3
                )
                aug_ms = max(sample_ms - noaug_ms, 0.0)

            raw = ds.sample_batch(batch)
            raw = {k: raw[k] for k in keys}
            compact_ms = _median_ms(lambda: compact_batch(raw))
            comp = compact_batch(raw)
            wire_bytes = sum(
                v.nbytes for v in comp.values() if hasattr(v, "nbytes")
            )
            sharding = batch_sharding(mesh)
            h2d_ms = _median_ms(
                lambda: jax.block_until_ready(
                    jax.device_put(comp, sharding)
                )
            )
            dev_batch = jax.device_put(comp, sharding)
            rng, sub = jax.random.split(rng)
            step_ms = _median_ms(
                lambda: jax.block_until_ready(
                    trainer.step(dev_batch, sub)["loss"]
                )
            )
            stages = {
                "decode_ms_per_episode_cold": round(decode_ep_ms, 1),
                "host_sample_ms_per_batch": round(sample_ms, 1),
                "host_augment_ms_per_batch": round(aug_ms, 1),
                "compact_encode_ms_per_batch": round(compact_ms, 1),
                "h2d_ms_per_batch": round(h2d_ms, 1),
                "h2d_bytes_per_batch": int(wire_bytes),
                "device_step_ms_blocked": round(step_ms, 1),
            }
            serial_ms = sample_ms + compact_ms + h2d_ms + step_ms
            e2e_ms = batch / sps * 1e3
            return {
                "samples_per_sec": sps,
                "wire": wire,
                "chain_samples_per_sec": [round(s, 2) for s in chain_sps],
                "stages_ms": stages,
                # >1: the async feeder hides host/wire work behind device
                # compute; <1: session noise (shared tunneled chip)
                "overlap_efficiency": round(serial_ms / e2e_ms, 2),
            }
        finally:
            feeder.close()


def main():
    kind = os.environ.get("BENCH_MODEL", "both")
    default_batch = "16" if kind == "act3d" else "22"
    batch = int(os.environ.get("BENCH_BATCH", default_batch))
    ncam = int(os.environ.get("BENCH_NCAM", "3"))
    size = int(os.environ.get("BENCH_IMAGE_SIZE", "256"))
    traj_len = int(os.environ.get("BENCH_TRAJ_LEN", "50"))
    steps = int(os.environ.get("BENCH_STEPS", "100"))
    # Fused attention is auto-on for TPU (ops.attention._fused_enabled);
    # BENCH_FUSED_ATTENTION=0/1 forces it off/on.
    if os.environ.get("BENCH_FUSED_ATTENTION") is not None:
        from act3d_tpu.ops.attention import use_fused_attention

        use_fused_attention(os.environ["BENCH_FUSED_ATTENTION"] == "1")

    from act3d_tpu.core.cache import enable_compilation_cache, enable_fast_prng

    enable_compilation_cache()
    if os.environ.get("BENCH_FAST_PRNG", "1") == "1":
        enable_fast_prng()

    from act3d_tpu.parallel.mesh import make_mesh
    from act3d_tpu.train.engine import Trainer

    import jax.numpy as jnp

    if kind == "sampler":
        return bench_sampler(1, ncam, size, traj_len, max(steps // 10, 3))
    if kind == "act3d_eval":
        return bench_act3d_eval(ncam, size, max(steps // 2, 5))
    if kind == "chained_eval":
        dt = bench_chained_eval(ncam, size, traj_len, max(steps // 10, 3))
        print(json.dumps({
            "metric": "chained_keystep_latency_ms",
            "value": round(dt, 2), "unit": "ms",
            "vs_baseline": round(dt, 2),
        }))
        return

    compute_dtype = (
        jnp.bfloat16 if os.environ.get("BENCH_BF16", "1") == "1" else None
    )

    if kind in ("e2e", "e2e_act3d"):
        which = "act3d" if kind == "e2e_act3d" else "diffusion"
        b = int(os.environ.get("BENCH_BATCH_ACT3D", "16")) \
            if which == "act3d" else batch
        res = bench_e2e(b, ncam, size, traj_len, compute_dtype, model=which)
        sps = res["samples_per_sec"]
        print(json.dumps({
            "metric": f"e2e_{which}_train_samples_per_sec",
            "value": round(sps, 3), "unit": "samples/sec",
            "vs_baseline": round(sps / ASSUMED_A100_SAMPLES_PER_SEC, 3),
            "e2e_wire": res["wire"],
            "e2e_chain_samples_per_sec": res["chain_samples_per_sec"],
            "e2e_stages_ms": res["stages_ms"],
            "e2e_overlap_efficiency": res["overlap_efficiency"],
        }))
        return

    if kind == "e2e_wire_ab":
        # same-process A/B of the H2D wire encodings (cross-process chip
        # drift swamps separate runs — BENCH_NOTES round 3)
        pcd = bench_e2e(batch, ncam, size, traj_len, compute_dtype,
                        wire="pcd")
        dep = bench_e2e(batch, ncam, size, traj_len, compute_dtype,
                        wire="depth")
        print(json.dumps({
            "metric": "e2e_diffusion_train_samples_per_sec_ab_wire",
            "value": round(max(pcd["samples_per_sec"],
                               dep["samples_per_sec"]), 3),
            "unit": "samples/sec",
            "vs_baseline": round(
                max(pcd["samples_per_sec"], dep["samples_per_sec"])
                / ASSUMED_A100_SAMPLES_PER_SEC, 3
            ),
            "wire_pcd": round(pcd["samples_per_sec"], 3),
            "wire_depth": round(dep["samples_per_sec"], 3),
            "wire_pcd_bytes": pcd["stages_ms"]["h2d_bytes_per_batch"],
            "wire_depth_bytes": dep["stages_ms"]["h2d_bytes_per_batch"],
            "wire_pcd_stages_ms": pcd["stages_ms"],
            "wire_depth_stages_ms": dep["stages_ms"],
        }))
        return

    if kind == "e2e_ab":
        # same-process A/B of the two e2e pipelines — the tunneled chip's
        # session-to-session drift swamps cross-process comparisons
        # (BENCH_NOTES round 3: 18.4 vs 38.2 vs 14.0 across three hours)
        # pinned to the XYZ wire: the depth wire has no separate
        # device-augment variant (its index maps ARE the augmentation)
        host = bench_e2e(batch, ncam, size, traj_len, compute_dtype,
                         host_aug=True, wire="pcd")["samples_per_sec"]
        dev = bench_e2e(batch, ncam, size, traj_len, compute_dtype,
                        host_aug=False, wire="pcd")["samples_per_sec"]
        print(json.dumps({
            "metric": "e2e_diffusion_train_samples_per_sec_ab",
            "value": round(max(host, dev), 3), "unit": "samples/sec",
            "vs_baseline": round(
                max(host, dev) / ASSUMED_A100_SAMPLES_PER_SEC, 3
            ),
            "host_augment": round(host, 3),
            "device_augment": round(dev, 3),
        }))
        return

    def _bf16_peak_tflops():
        """Chip bf16 peak from the device kind; None if unknown."""
        kind = jax.devices()[0].device_kind
        key = kind.lower().replace(" ", "").replace("-", "")
        for tag, peak in (
            ("v6", 918.0), ("trillium", 918.0), ("v5p", 459.0),
            ("v5lite", 197.0), ("v5e", 197.0), ("v5", 459.0),
            ("v4", 275.0), ("v3", 123.0), ("v2", 45.0),
        ):
            if tag in key:
                return peak, kind
        return None, kind

    def bench_train(which, b, want_flops=False):
        """Median per-step time of the jitted train step (samples/sec).
        want_flops also returns XLA's analytic FLOPs for ONE optimizer
        step (fwd+bwd+AdamW, Lowered.cost_analysis — no execution), for
        the MFU fields (VERDICT r4 weak #5)."""
        # BENCH_DEVICE_AUGMENT=1 folds the in-jit augmentation into the
        # scanned diffusion step — isolates the device cost of
        # data/device_augment.py from the host/wire-bound e2e number.
        augment = None
        if which != "act3d" and os.environ.get("BENCH_DEVICE_AUGMENT") == "1":
            from act3d_tpu.data.device_augment import make_device_augment

            augment = make_device_augment(image_rescale=(0.75, 1.25))
        if which == "act3d":
            loss_fn, variables, data = build_act3d(b, ncam, size, compute_dtype)
        else:
            loss_fn, variables, data = build_diffusion(
                b, ncam, size, traj_len, compute_dtype, augment=augment
            )
        mesh = make_mesh(num_devices=1)
        trainer = Trainer(loss_fn, variables["params"], mesh=mesh)

        # pre-transfer the batch once: device_put of an already-sharded
        # array is a no-op, so steps measure pure device compute (the real
        # input pipeline overlaps H2D via data.feeder.DeviceFeeder)
        from act3d_tpu.parallel.mesh import shard_batch

        data = shard_batch(data, mesh)
        rng = jax.random.PRNGKey(2)

        flops = None
        if want_flops:
            try:
                ca = trainer._train_step.lower(
                    trainer.state, data, jax.random.PRNGKey(9)
                ).cost_analysis()
                flops = float(ca.get("flops", 0.0)) or None
            except Exception:
                flops = None
            if flops is None:
                # axon's Lowered.cost_analysis returns None — read the
                # same HLO's flops from a CPU-backend subprocess
                import subprocess
                import sys

                env = dict(os.environ, JAX_PLATFORM_NAME="cpu")
                try:
                    out = subprocess.run(
                        [sys.executable, "-c",
                         "import jax; "
                         "jax.config.update('jax_platforms', 'cpu'); "
                         "import bench; "
                         f"print(bench.flops_for({which!r}, {b}, "
                         f"{ncam}, {size}, {traj_len}))"],
                        env=env, capture_output=True, text=True,
                        timeout=900,
                        cwd=os.path.dirname(os.path.abspath(__file__)),
                    )
                    flops = float(out.stdout.strip().splitlines()[-1])
                except Exception:
                    flops = None

        # The chip sits behind a tunnel whose per-dispatch RPC latency
        # (~30-100 ms, jittery) dwarfs the ~5-10 ms device step, so
        # per-call timing measures the link, not the chip.  Methodology:
        # run CHAIN optimizer steps as ONE jitted lax.scan (single
        # dispatch + single scalar readback), amortise, take the median
        # over chains.  Real training hides the dispatch behind the async
        # feeder the same way.
        CHAIN = 20
        n_chains = max(steps // CHAIN, 3)
        scanned = trainer.make_scanned_steps(CHAIN)
        state = trainer.state
        # warmup/compile
        rng, sub = jax.random.split(rng)
        state, losses = scanned(state, data, jax.random.split(sub, CHAIN))
        float(losses[-1])
        times = []
        for _ in range(n_chains):
            rng, sub = jax.random.split(rng)
            t0 = time.perf_counter()
            state, losses = scanned(state, data, jax.random.split(sub, CHAIN))
            float(losses[-1])  # completion marker
            times.append((time.perf_counter() - t0) / CHAIN)
        sps = b / float(np.median(times))
        return (sps, flops) if want_flops else sps

    if kind == "diffusion_ab_fused_dropout":
        # Same-process A/B of in-kernel attention dropout INCLUDING the
        # 50x3074 cross-attention onto the visual pyramid — the one site
        # with a real HBM win, excluded from the r3 negative because it
        # crashed the remote compile helper (fixed toolchain verified via
        # scripts/repro_fused_dropout_crash.py: all 4 rungs OK).  The env
        # var is read at trace time, so toggling between two bench_train
        # calls compiles two distinct programs in one session.
        b = int(os.environ.get("BENCH_BATCH_DIFFUSION", str(batch)))
        os.environ["ACT3D_FUSED_DROPOUT"] = "0"
        xla_path = bench_train("diffusion", b)
        os.environ["ACT3D_FUSED_DROPOUT"] = "1"
        fused = bench_train("diffusion", b)
        print(json.dumps({
            "metric": "diffusion_train_samples_per_sec_ab_fused_dropout",
            "value": round(max(fused, xla_path), 3), "unit": "samples/sec",
            "vs_baseline": round(
                max(fused, xla_path) / ASSUMED_A100_SAMPLES_PER_SEC, 3
            ),
            "fused_dropout_on": round(fused, 3),
            "fused_dropout_off": round(xla_path, 3),
        }))
        return

    if kind in ("act3d_ab_projfold", "diffusion_ab_projfold"):
        # ISOLATED A/B of the head-pad projection fold (r4's bundle also
        # flipped ACT3D_ROTARY_MATMUL — that lever now has its own
        # *_ab_rotary mode).  The ON arm runs with the shrunken backward
        # L-tile (ACT3D_BWD_L_TILE=64, overridable) — the r4 ON arm
        # failed to compile at the 50x3074 site because the pre-padded
        # 128-lane operands overflowed scoped VMEM at Lt=128
        # (BENCH_NOTES "Projection-fold A/B").
        which = kind.split("_")[0]
        b = int(os.environ.get(
            "BENCH_BATCH_" + which.upper(), "32" if which == "act3d" else str(batch)
        ))
        os.environ["ACT3D_FOLD_HEADPAD"] = "0"
        os.environ["ACT3D_ROTARY_MATMUL"] = "0"
        off = bench_train(which, b)
        os.environ["ACT3D_FOLD_HEADPAD"] = "1"
        # the kernel auto-shrinks its backward L-tile for fold-padded
        # full-tile widths (kernels/attention.py::_bwd_l_tile);
        # ACT3D_BWD_L_TILE still forces both arms
        on = bench_train(which, b)
        print(json.dumps({
            "metric": f"{which}_train_samples_per_sec_ab_projfold",
            "value": round(max(on, off), 3), "unit": "samples/sec",
            "vs_baseline": round(
                max(on, off) / ASSUMED_A100_SAMPLES_PER_SEC, 3
            ),
            "projfold_on": round(on, 3),
            "projfold_off": round(off, 3),
            "projfold_on_bwd_l_tile": os.environ.get(
                "ACT3D_BWD_L_TILE", "auto"
            ),
        }))
        return

    if kind in ("act3d_ab_bwdtile", "diffusion_ab_bwdtile"):
        # ISOLATED A/B of the backward L-tile shrink (ACT3D_BWD_L_TILE)
        # with the fold OFF — deconfounds the projfold A/B's +18% (its
        # ON arm changes both the fold and the tile).
        which = kind.split("_")[0]
        b = int(os.environ.get(
            "BENCH_BATCH_" + which.upper(),
            "32" if which == "act3d" else str(batch),
        ))
        os.environ["ACT3D_FOLD_HEADPAD"] = "0"
        os.environ["ACT3D_BWD_L_TILE"] = "128"
        t128 = bench_train(which, b)
        os.environ["ACT3D_BWD_L_TILE"] = "64"
        t64 = bench_train(which, b)
        print(json.dumps({
            "metric": f"{which}_train_samples_per_sec_ab_bwdtile",
            "value": round(max(t64, t128), 3), "unit": "samples/sec",
            "vs_baseline": round(
                max(t64, t128) / ASSUMED_A100_SAMPLES_PER_SEC, 3
            ),
            "bwd_l_tile_64": round(t64, 3),
            "bwd_l_tile_128": round(t128, 3),
        }))
        return

    if kind in ("act3d_ab_batch", "diffusion_ab_batch"):
        # same-process batch-size probe at current defaults (HBM
        # headroom: the reference batch is the parity point, not the
        # chip's sweet spot — ROADMAP r1 #5)
        which = kind.split("_")[0]
        b1 = int(os.environ.get(
            "BENCH_BATCH_" + which.upper(),
            "32" if which == "act3d" else str(batch),
        ))
        b2 = int(os.environ.get("BENCH_BATCH_ALT", str(2 * b1)))
        s1 = bench_train(which, b1)
        s2 = bench_train(which, b2)
        print(json.dumps({
            "metric": f"{which}_train_samples_per_sec_ab_batch",
            "value": round(max(s1, s2), 3), "unit": "samples/sec",
            "vs_baseline": round(
                max(s1, s2) / ASSUMED_A100_SAMPLES_PER_SEC, 3
            ),
            f"batch_{b1}": round(s1, 3),
            f"batch_{b2}": round(s2, 3),
        }))
        return

    if kind in ("act3d_ab_foldtile", "diffusion_ab_foldtile"):
        # With the fold ON (r5 default), compare backward L-tiles for
        # the fold-padded sites: 64 (the known-safe default) vs
        # BENCH_BWDTILE (e.g. 96 — the r4 OOM was only 652 KB over at
        # 128, so 96 may fit and recover most of the ~4% tile penalty).
        # The alt arm is allowed to fail compile; the failure is
        # recorded, not fatal.
        which = kind.split("_")[0]
        b = int(os.environ.get(
            "BENCH_BATCH_" + which.upper(),
            "32" if which == "act3d" else str(batch),
        ))
        alt = os.environ.get("BENCH_BWDTILE", "96")
        os.environ["ACT3D_FOLD_HEADPAD"] = "1"
        os.environ["ACT3D_BWD_L_TILE"] = "64"
        t64 = bench_train(which, b)
        os.environ["ACT3D_BWD_L_TILE"] = alt
        try:
            t_alt = bench_train(which, b)
        except Exception as e:
            t_alt = None
            print(json.dumps({
                "metric": f"{which}_train_samples_per_sec_ab_foldtile",
                "value": round(t64, 3), "unit": "samples/sec",
                "vs_baseline": round(t64 / ASSUMED_A100_SAMPLES_PER_SEC, 3),
                "fold_tile_64": round(t64, 3),
                f"fold_tile_{alt}_error": f"{type(e).__name__}: {e}"[:300],
            }))
            return
        print(json.dumps({
            "metric": f"{which}_train_samples_per_sec_ab_foldtile",
            "value": round(max(t64, t_alt), 3), "unit": "samples/sec",
            "vs_baseline": round(
                max(t64, t_alt) / ASSUMED_A100_SAMPLES_PER_SEC, 3
            ),
            "fold_tile_64": round(t64, 3),
            f"fold_tile_{alt}": round(t_alt, 3),
        }))
        return

    if kind in ("act3d_ab_rotary", "diffusion_ab_rotary"):
        # ISOLATED A/B of ACT3D_ROTARY_MATMUL (VERDICT r4 next #5: the
        # r4 projfold bundle never measured it alone): rotate_pairs as a
        # dense +-1 pair-rotation matmul vs the strided stack/reshape
        # lane shuffle (ops/rotary.py).
        which = kind.split("_")[0]
        b = int(os.environ.get(
            "BENCH_BATCH_" + which.upper(),
            "32" if which == "act3d" else str(batch),
        ))
        os.environ["ACT3D_ROTARY_MATMUL"] = "0"
        off = bench_train(which, b)
        os.environ["ACT3D_ROTARY_MATMUL"] = "1"
        on = bench_train(which, b)
        print(json.dumps({
            "metric": f"{which}_train_samples_per_sec_ab_rotary_matmul",
            "value": round(max(on, off), 3), "unit": "samples/sec",
            "vs_baseline": round(
                max(on, off) / ASSUMED_A100_SAMPLES_PER_SEC, 3
            ),
            "rotary_matmul_on": round(on, 3),
            "rotary_matmul_off": round(off, 3),
        }))
        return

    if kind == "act3d_ab_headpad":
        # Same-process A/B of the fused-MHA head-dim lane padding (d 15->16,
        # kernels/attention.py::_head_pad_enabled).  The env var is read at
        # trace time, so toggling it between two bench_train calls compiles
        # two distinct programs in one session — immune to the tunneled
        # chip's cross-process drift.
        b = int(os.environ.get("BENCH_BATCH_ACT3D", "32"))
        os.environ["ACT3D_MHA_PAD_HEADS"] = "0"
        unpadded = bench_train("act3d", b)
        os.environ["ACT3D_MHA_PAD_HEADS"] = "1"
        padded = bench_train("act3d", b)
        print(json.dumps({
            "metric": "act3d_train_samples_per_sec_ab_headpad",
            "value": round(max(padded, unpadded), 3), "unit": "samples/sec",
            "vs_baseline": round(
                max(padded, unpadded) / ASSUMED_A100_SAMPLES_PER_SEC, 3
            ),
            "head_pad_on": round(padded, 3),
            "head_pad_off": round(unpadded, 3),
        }))
        return

    if kind in ("act3d", "diffusion"):
        samples_per_sec = bench_train(kind, batch)
        print(
            json.dumps(
                {
                    "metric": f"{kind}_train_samples_per_sec_per_chip",
                    "value": round(samples_per_sec, 3),
                    "unit": "samples/sec",
                    "vs_baseline": round(
                        samples_per_sec / ASSUMED_A100_SAMPLES_PER_SEC, 3
                    ),
                }
            )
        )
        return

    # default: the full PerAct-18 training pipeline = Act3D keypose +
    # trajectory diffusion (both models train; the chained policy needs
    # both — BASELINE.md north star).  Reported value is the pipeline
    # throughput 1 / (1/act3d + 1/diffusion): samples/sec pushing each
    # sample through BOTH trainings.  The A100 baseline for the same
    # pipeline is 1 / (2 / ASSUMED_A100_SAMPLES_PER_SEC) = 40 samples/s.
    b_act3d = int(os.environ.get("BENCH_BATCH_ACT3D", "32"))
    act3d_sps, act3d_flops = bench_train("act3d", b_act3d, want_flops=True)
    diffusion_sps, diff_flops = bench_train(
        "diffusion", batch, want_flops=True
    )
    pipeline_sps = 1.0 / (1.0 / act3d_sps + 1.0 / diffusion_sps)
    baseline_pipeline = ASSUMED_A100_SAMPLES_PER_SEC / 2.0
    record = {
        "metric": "peract18_pipeline_train_samples_per_sec_per_chip",
        "value": round(pipeline_sps, 3),
        "unit": "samples/sec",
        "vs_baseline": round(pipeline_sps / baseline_pipeline, 3),
        "act3d_train_samples_per_sec_per_chip": round(act3d_sps, 3),
        "act3d_vs_baseline": round(
            act3d_sps / ASSUMED_A100_SAMPLES_PER_SEC, 3
        ),
        "diffusion_train_samples_per_sec_per_chip": round(
            diffusion_sps, 3
        ),
        "diffusion_vs_baseline": round(
            diffusion_sps / ASSUMED_A100_SAMPLES_PER_SEC, 3
        ),
    }
    # MFU: XLA's analytic FLOPs for one optimizer step x measured
    # steps/sec vs the chip's bf16 peak (VERDICT r4 weak #5: "actually
    # fast" needs an absolute utilisation number, not just
    # vs-assumed-A100).
    peak, device_kind = _bf16_peak_tflops()
    mfu = {"device_kind": device_kind,
           "bf16_peak_tflops": peak,
           "flops_source": "jax Lowered.cost_analysis (fwd+bwd+AdamW)"}
    for name, flops_step, sps, b in (
        ("act3d", act3d_flops, act3d_sps, b_act3d),
        ("diffusion", diff_flops, diffusion_sps, batch),
    ):
        if flops_step:
            achieved = flops_step * (sps / b) / 1e12
            entry = {
                "flops_per_step": flops_step,
                "achieved_tflops": round(achieved, 2),
            }
            if peak:
                entry["mfu"] = round(achieved / peak, 4)
            mfu[name] = entry
    record["mfu"] = mfu
    # Serving latency of the chained policy keystep (Act3D keypose +
    # goal-conditioned 100-step sampler as one jitted program; VERDICT
    # r4 next #7 asks for it in the driver artifact each round).
    if os.environ.get("BENCH_CHAINED", "1") == "1":
        try:
            record["chained_eval_keystep_ms"] = round(
                bench_chained_eval(ncam, size, traj_len, 3), 2
            )
        except Exception as e:
            record["chained_eval_error"] = f"{type(e).__name__}: {e}"[:200]
    # e2e-with-data alongside the compute-only headline (VERDICT r2 #5):
    # fresh batches through dataset -> compact H2D -> async feeder.
    if os.environ.get("BENCH_E2E", "1") == "1":
        try:
            res = bench_e2e(batch, ncam, size, traj_len, compute_dtype)
            e2e_sps = res["samples_per_sec"]
            record["e2e_diffusion_train_samples_per_sec"] = round(e2e_sps, 3)
            record["e2e_vs_baseline"] = round(
                e2e_sps / ASSUMED_A100_SAMPLES_PER_SEC, 3
            )
            # per-stage attribution + run-to-run spread so the artifact
            # itself shows what bounds the e2e number (VERDICT r3 weak #1)
            record["e2e_wire"] = res["wire"]
            record["e2e_chain_samples_per_sec"] = res["chain_samples_per_sec"]
            record["e2e_stages_ms"] = res["stages_ms"]
            record["e2e_overlap_efficiency"] = res["overlap_efficiency"]
        except Exception as e:  # never lose the headline to an e2e failure
            record["e2e_error"] = f"{type(e).__name__}: {e}"[:200]
        # the other trained model's with-data leg (VERDICT r4 next #6:
        # keypose batches are the worst-case wire)
        try:
            res = bench_e2e(
                int(os.environ.get("BENCH_E2E_BATCH_ACT3D", "16")),
                ncam, size, traj_len, compute_dtype, model="act3d",
            )
            record["e2e_act3d_train_samples_per_sec"] = round(
                res["samples_per_sec"], 3
            )
            record["e2e_act3d_stages_ms"] = res["stages_ms"]
            record["e2e_act3d_overlap_efficiency"] = res[
                "overlap_efficiency"
            ]
        except Exception as e:
            record["e2e_act3d_error"] = f"{type(e).__name__}: {e}"[:200]
    print(json.dumps(record))


if __name__ == "__main__":
    main()
