"""Act3D keypose training entry point.

TPU-native equivalent of the reference ``main_keypose.py``:
dataset → Act3D → jitted SPMD train loop with periodic keypose-metric
evaluation and best/last checkpointing.

Run:
  python -m act3d_tpu.train.main_keypose \
      --dataset /path/train --valset /path/val --tasks pick_and_lift \
      --instructions instructions.pkl --use_instruction 1
"""

from __future__ import annotations

import numpy as np

import jax

from ..core.config import KeyposeConfig, parse_config
from ..data.dataset import RLBenchDataset
from ..data.feeder import DeviceFeeder
from ..models import Act3D
from ..parallel.mesh import batch_sharding, make_mesh
from ..train.engine import Trainer
from ..train.flagship import keypose_loss_fn
from ..train.losses import KeyposeLossAndMetrics
from ..utils.registry import (
    count_parameters,
    get_gripper_loc_bounds,
    load_instructions,
)


def main(argv=None):
    cfg = parse_config(KeyposeConfig, argv)
    from ..core.cache import enable_compilation_cache, enable_fast_prng

    enable_compilation_cache()
    if cfg.fast_prng:
        enable_fast_prng()
    if cfg.gripper_loc_bounds is None:
        bounds = np.array([[-2.0, -2.0, -2.0], [2.0, 2.0, 2.0]])
    else:
        bounds = get_gripper_loc_bounds(
            cfg.gripper_loc_bounds,
            task=cfg.tasks[0] if len(cfg.tasks) == 1 else None,
            buffer=0.04,
        )
    cfg.save(cfg.log_dir / "hparams.json")

    instruction = load_instructions(
        cfg.instructions, tasks=cfg.tasks, variations=cfg.variations
    )
    if instruction is None:
        raise NotImplementedError("instructions.pkl is required")
    taskvar = [
        (task, var)
        for task, var_instr in instruction.items()
        for var in var_instr.keys()
    ]

    common = dict(
        instructions=instruction,
        taskvar=taskvar,
        max_episode_length=cfg.max_episode_length,
        max_episodes_per_task=cfg.max_episodes_per_task,
        cameras=cfg.cameras,
        gripper_loc_bounds=bounds,
        image_rescale=cfg.image_rescale_tuple,
        point_cloud_rotate_yaw_range=cfg.point_cloud_rotate_yaw_range,
        return_low_lvl_trajectory=False,
        action_dim=8,
        seed=cfg.seed,
        wire=cfg.wire,
        instr_mode=cfg.instr_mode,
    )
    train_kwargs = dict(
        root=cfg.dataset, cache_size=cfg.cache_size, training=True,
        num_iters=cfg.train_iters,
        # with --device_augment the host only decodes and stacks; the
        # Resize/Rotate run on-device inside the jitted step
        augment_host=not cfg.device_augment, **common,
    )
    train_ds = RLBenchDataset(**train_kwargs)
    val_ds = RLBenchDataset(
        root=cfg.valset, cache_size=cfg.cache_size_val, training=False,
        **common,
    )

    # Multi-worker batch assembly (reference --num_workers DataLoader
    # semantics, engine.py:51-62).  Workers start via forkserver/spawn
    # with a picklable factory — safe regardless of JAX's device threads.
    train_sampler = None
    if cfg.num_workers > 1:
        from ..data.pipeline import MultiProcessSampler, rlbench_dataset_factory

        train_sampler = MultiProcessSampler(
            rlbench_dataset_factory(train_kwargs, cfg.seed),
            batch_size=cfg.batch_size,
            num_workers=cfg.num_workers,
        )

    model = Act3D(
        backbone=cfg.backbone,
        image_size=cfg.image_size_tuple,
        embedding_dim=cfg.embedding_dim,
        num_ghost_point_cross_attn_layers=cfg.num_ghost_point_cross_attn_layers,
        num_query_cross_attn_layers=cfg.num_query_cross_attn_layers,
        num_vis_ins_attn_layers=cfg.num_vis_ins_attn_layers,
        rotation_parametrization=cfg.rotation_parametrization,
        gripper_loc_bounds=tuple(map(tuple, bounds)),
        num_ghost_points=cfg.num_ghost_points,
        num_ghost_points_val=cfg.num_ghost_points_val,
        weight_tying=bool(cfg.weight_tying),
        gp_emb_tying=bool(cfg.gp_emb_tying),
        num_sampling_level=cfg.num_sampling_level,
        fine_sampling_ball_diameter=cfg.fine_sampling_ball_diameter,
        regress_position_offset=bool(cfg.regress_position_offset),
        use_instruction=bool(cfg.use_instruction),
        approx_topk=bool(cfg.approx_topk),
    )
    criterion = KeyposeLossAndMetrics(
        position_loss=cfg.position_loss,
        rotation_parametrization=cfg.rotation_parametrization,
        compute_loss_at_all_layers=bool(cfg.compute_loss_at_all_layers),
        ground_truth_gaussian_spread=cfg.ground_truth_gaussian_spread,
        label_smoothing=cfg.label_smoothing,
        position_loss_coeff=cfg.position_loss_coeff,
        position_offset_loss_coeff=cfg.position_offset_loss_coeff,
        rotation_loss_coeff=cfg.rotation_loss_coeff,
        gripper_loss_coeff=cfg.gripper_loss_coeff,
        symmetric_rotation_loss=bool(cfg.symmetric_rotation_loss),
    )

    def to_model_batch(b):
        # canonical keys plus whichever wire encodings the dataset emits
        # (depth wire / instruction ids — data/depthwire.py); the loss
        # fns expand them inside the jitted step
        keys = (
            "rgbs", "pcds", "instr", "curr_gripper", "action", "depth",
            "cam_intr", "cam_c2w", "aug_rows", "aug_cols", "instr_id",
        )
        return {k: b[k] for k in keys if k in b}

    from ..data.compact import expand_batch
    from ..train.flagship import _resolve_instr

    example = _resolve_instr(
        expand_batch(to_model_batch(train_ds.sample_batch(cfg.batch_size))),
        train_ds.instruction_bank,
    )
    variables = model.init(
        jax.random.PRNGKey(cfg.seed),
        example["rgbs"], example["pcds"], example["instr"],
        example["curr_gripper"],
        sample_rng=jax.random.PRNGKey(0), gt_action=example["action"],
    )
    print("Model parameters:", count_parameters(variables["params"]))

    def metrics_fn(params, batch, rng):
        batch = expand_batch(batch)
        batch = _resolve_instr(batch, train_ds.instruction_bank)
        out = model.apply(
            {"params": params},
            batch["rgbs"], batch["pcds"], batch["instr"],
            batch["curr_gripper"],
            sample_rng=rng,
            gt_action=batch["action"]
            if cfg.use_ground_truth_position_for_sampling_val
            else None,
            train_mode=False,
        )
        return criterion.compute_metrics(out, batch["action"])

    import jax.numpy as jnp

    compute_dtype = jnp.bfloat16 if cfg.mixed_precision else None
    augment = None
    if cfg.device_augment:
        if train_ds.wire == "depth":
            raise ValueError(
                "--device_augment does not compose with --wire depth: the "
                "depth wire's resize index maps ARE the (host-drawn, "
                "device-executed) augmentation"
            )
        from ..data.device_augment import make_device_augment

        augment = make_device_augment(
            image_rescale=cfg.image_rescale_tuple,
            yaw_range_deg=cfg.point_cloud_rotate_yaw_range,
            gripper_loc_bounds=bounds,
            pose_keys=("curr_gripper", "action"),
        )
    mesh = make_mesh(
        None if cfg.num_devices < 0 else cfg.num_devices, fsdp=cfg.fsdp
    )
    trainer = Trainer(
        keypose_loss_fn(
            model, criterion,
            compute_dtype=compute_dtype,
            use_gt_sampling=bool(
                cfg.use_ground_truth_position_for_sampling_train
            ),
            augment=augment,
            instr_bank=train_ds.instruction_bank,
        ),
        variables["params"],
        metrics_fn=metrics_fn,
        lr=cfg.lr,
        accumulate_grad_batches=cfg.accumulate_grad_batches,
        mesh=mesh,
        log_dir=cfg.log_dir,
        use_tensorboard=bool(cfg.use_tensorboard),
        flat_optimizer=bool(cfg.flat_optimizer),
    )
    if cfg.checkpoint:
        trainer.load_checkpoint(cfg.checkpoint)
    elif cfg.auto_resume and (cfg.log_dir / "last.msgpack").exists():
        print(f"Auto-resuming from {cfg.log_dir / 'last.msgpack'}")
        trainer.load_checkpoint(cfg.log_dir / "last.msgpack")

    def run_eval(rng, step_id, train_loss=None, dataset=None):
        """Aggregated n-batch eval (reference engine.py:155-174 protocol:
        val_iters = max(5, 4*len(tasks)/batch_size_val), metrics averaged
        over batches; run on both the train and the val loader)."""
        from ..parallel.mesh import shard_batch
        from ..train.losses import split_metrics_by_task

        dataset = val_ds if dataset is None else dataset
        n_val = max(5, 4 * max(len(cfg.tasks), 1) // cfg.batch_size_val)
        sums, counts = {}, {}
        for _ in range(n_val):
            vb = dataset.sample_batch(cfg.batch_size_val)
            tasks = vb.pop("task")
            rng, sub = jax.random.split(rng)
            m = jax.device_get(
                trainer._eval_step(
                    trainer.state.params,
                    shard_batch(to_model_batch(vb), trainer.mesh),
                    sub,
                )
            )
            for k, v in split_metrics_by_task(m, tasks).items():
                sums[k] = sums.get(k, 0.0) + v
                counts[k] = counts.get(k, 0) + 1
        return {k: sums[k] / counts[k] for k in sums}

    if cfg.eval_only:
        metrics = run_eval(jax.random.PRNGKey(cfg.seed + 2), -1)
        for k, v in sorted(metrics.items()):
            print(f"{k}: {v:.4f}")
        return metrics

    def _train_batch():
        b = to_model_batch(
            next(train_sampler)
            if train_sampler is not None
            else train_ds.sample_batch(cfg.batch_size)
        )
        if cfg.compact_transfer or train_ds.wire == "depth":
            # the depth wire implies the compact encodings (u16 depth /
            # u8 rgb) — shipping f32 depth would waste its wire win
            from ..data.compact import compact_batch

            b = compact_batch(b)  # decoded inside the jitted step
        return b

    feeder = DeviceFeeder(_train_batch, sharding=batch_sharding(mesh))
    from ..train.engine import GracefulShutdown

    rng = jax.random.PRNGKey(cfg.seed + 1)
    start = int(trainer.state.step)
    stop = GracefulShutdown()
    stop.__enter__()
    for step_id in range(start, cfg.train_iters):
        if stop.requested:
            # SIGTERM/SIGINT (e.g. TPU-VM preemption notice): save a
            # resumable last.msgpack and exit cleanly; auto_resume picks
            # it up on relaunch.
            print(f"Shutdown requested: checkpointing at step {step_id}")
            trainer.save_checkpoint(cfg.log_dir, last_only=True)
            break
        batch = next(feeder)
        rng, sub = jax.random.split(rng)
        out = trainer.step(batch, sub)
        if (step_id + 1) % cfg.val_freq == 0:
            loss = float(out["loss"])
            rng, sub = jax.random.split(rng)
            train_metrics = run_eval(sub, step_id, dataset=train_ds)
            rng, sub = jax.random.split(rng)
            val_metrics = run_eval(sub, step_id)
            if trainer.logger:
                trainer.logger.log(
                    step_id,
                    {"train-loss/total": loss}
                    | {
                        f"train-losses/{k}": v
                        for k, v in train_metrics.items()
                    }
                    | {f"val-losses/{k}": v for k, v in val_metrics.items()},
                )
            # Best-checkpoint key: see CommonConfig.best_checkpoint_metric —
            # the reference keys on the (never-emitted) action_mse
            # (main_keypose.py:281), degenerating to always-overwrite; we
            # default to mean/pos_l2_final.  A missing key maps to None,
            # which save_checkpoint treats as best (engine.py:214-217).
            metric_key = (
                "mean/pos_l2_final"
                if cfg.best_checkpoint_metric == "default"
                else cfg.best_checkpoint_metric
            )
            trainer.save_checkpoint(
                cfg.log_dir,
                new_loss=val_metrics.get(metric_key) if metric_key else None,
            )
            print(f"Step {step_id}: loss {loss:.4f} val {val_metrics}")
    stop.__exit__()
    feeder.close()
    if train_sampler is not None:
        train_sampler.close()


if __name__ == "__main__":
    main()
