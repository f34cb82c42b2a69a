"""Trajectory-diffusion training entry point.

TPU-native equivalent of the reference ``main_trajectory.py``:
dataset → DiffusionPlanner → jitted SPMD train loop with periodic
evaluation and best/last checkpointing.

Run:
  python -m act3d_tpu.train.main_trajectory \
      --dataset /path/train --valset /path/val --tasks pick_and_lift \
      --instructions instructions.pkl --dense_interpolation 1 \
      --interpolation_length 50 --use_goal 1 --use_instruction 1
"""

from __future__ import annotations

import numpy as np

import jax

from ..core.config import TrajectoryConfig, parse_config
from ..data.dataset import RLBenchDataset
from ..data.feeder import DeviceFeeder
from ..models import DiffusionPlanner
from ..parallel.mesh import batch_sharding, make_mesh
from ..train.engine import Trainer
from ..train.flagship import diffusion_loss_fn
from ..utils.registry import get_gripper_loc_bounds, load_instructions


def build_datasets(cfg: TrajectoryConfig, instruction):
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
        gripper_loc_bounds=cfg.bounds,
        image_rescale=cfg.image_rescale_tuple,
        point_cloud_rotate_yaw_range=cfg.point_cloud_rotate_yaw_range,
        return_low_lvl_trajectory=True,
        dense_interpolation=bool(cfg.dense_interpolation),
        interpolation_length=cfg.interpolation_length,
        action_dim=cfg.action_dim,
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
    train = RLBenchDataset(**train_kwargs)
    val = RLBenchDataset(
        root=cfg.valset, cache_size=cfg.cache_size_val, training=False,
        **common,
    )
    return train, val, train_kwargs


def main(argv=None):
    cfg = parse_config(TrajectoryConfig, argv)
    from ..core.cache import enable_compilation_cache, enable_fast_prng

    enable_compilation_cache()
    if cfg.fast_prng:
        enable_fast_prng()
    if cfg.gripper_loc_bounds is None:
        cfg.bounds = np.array([[-2.0, -2.0, -2.0], [2.0, 2.0, 2.0]])
    else:
        cfg.bounds = get_gripper_loc_bounds(
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

    train_ds, val_ds, train_kwargs = build_datasets(cfg, instruction)

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

    model = DiffusionPlanner(
        backbone=cfg.backbone,
        image_size=cfg.image_size_tuple,
        embedding_dim=cfg.embedding_dim,
        output_dim=cfg.action_dim,
        num_vis_ins_attn_layers=cfg.num_vis_ins_attn_layers,
        num_query_cross_attn_layers=cfg.num_query_cross_attn_layers,
        use_instruction=bool(cfg.use_instruction),
        use_goal=bool(cfg.use_goal),
        use_goal_at_test=bool(cfg.use_goal_at_test),
        feat_scales_to_use=cfg.feat_scales_to_use,
        attn_rounds=cfg.attn_rounds,
        rotation_parametrization=cfg.rotation_parametrization,
        diffusion_timesteps=cfg.diffusion_timesteps,
        gripper_loc_bounds=tuple(map(tuple, cfg.bounds)),
    )

    def to_model_batch(b):
        # canonical keys plus whichever wire encodings the dataset emits
        # (depth wire / instruction ids — data/depthwire.py); the loss
        # fns expand them inside the jitted step
        keys = (
            "trajectory", "trajectory_mask", "rgbs", "pcds", "instr",
            "curr_gripper", "action", "depth", "cam_intr", "cam_c2w",
            "aug_rows", "aug_cols", "instr_id",
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
        example["trajectory"], example["trajectory_mask"], example["rgbs"],
        example["pcds"], example["instr"], example["curr_gripper"],
        example["action"], noise_rng=jax.random.PRNGKey(0),
    )
    from ..utils.registry import count_parameters

    print("Model parameters:", count_parameters(variables["params"]))

    from ..train.flagship import diffusion_metrics_fn

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
            gripper_loc_bounds=cfg.bounds,
            pose_keys=("curr_gripper", "action", "trajectory"),
        )
    mesh = make_mesh(
        None if cfg.num_devices < 0 else cfg.num_devices, fsdp=cfg.fsdp
    )
    instr_bank = train_ds.instruction_bank
    trainer = Trainer(
        diffusion_loss_fn(
            model, compute_dtype, augment=augment, instr_bank=instr_bank
        ),
        variables["params"],
        metrics_fn=diffusion_metrics_fn(model, instr_bank=instr_bank),
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

    if cfg.eval_only:
        n_val = max(5, 4 * max(len(cfg.tasks), 1) // cfg.batch_size_val)
        val_batches = [
            to_model_batch(val_ds.sample_batch(cfg.batch_size_val))
            for _ in range(n_val)
        ]
        metrics = trainer.evaluate(val_batches, jax.random.PRNGKey(cfg.seed + 2))
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

    # full-sampler eval (reference run_inference=True path,
    # main_trajectory.py:218-259): 100-step reverse diffusion + trajectory
    # metrics + 3D scatter visualisation
    from ..models import compute_trajectory
    from ..train.losses import TrajectoryCriterion

    sampler_fn = jax.jit(
        lambda params, mask, rgbs, pcds, instr, grip, goal, key:
        compute_trajectory(
            model, {"params": params}, mask, rgbs, pcds, instr, grip, goal,
            key,
        )
    )

    def run_sampler_eval(step_id, rng):
        # expand any wire encodings host-side: the sampler jit takes the
        # canonical tensors
        vb = _resolve_instr(
            expand_batch(
                to_model_batch(val_ds.sample_batch(cfg.batch_size_val))
            ),
            instr_bank,
        )
        pred = sampler_fn(
            trainer.state.params, vb["trajectory_mask"], vb["rgbs"],
            vb["pcds"], vb["instr"], vb["curr_gripper"], vb["action"], rng,
        )
        metrics = jax.device_get(
            TrajectoryCriterion.compute_metrics(pred, vb["trajectory"])
        )
        scalars = {
            k: float(np.mean(v))
            for k, v in metrics.items()
            if not k.startswith("per_sample/")
        }
        if trainer.logger and trainer.logger._tb is not None:
            from ..train.viz import trajectory_scatter_image

            img = trajectory_scatter_image(
                np.asarray(pred)[0], np.asarray(vb["trajectory"])[0],
                np.asarray(vb["trajectory_mask"])[0],
            )
            trainer.logger._tb.add_image("val-viz/viz", img, step_id)
        return scalars

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
            # Reference protocol (engine.py:155-174): aggregated
            # max(5, 4*len(tasks)/batch_size_val)-batch eval on BOTH the
            # train and the val loader each val_freq.
            n_val = max(5, 4 * max(len(cfg.tasks), 1) // cfg.batch_size_val)
            train_batches = [
                to_model_batch(train_ds.sample_batch(cfg.batch_size))
                for _ in range(n_val)
            ]
            val_batches = [
                to_model_batch(val_ds.sample_batch(cfg.batch_size_val))
                for _ in range(n_val)
            ]
            rng, sub = jax.random.split(rng)
            train_metrics = trainer.evaluate(train_batches, sub)
            rng, sub = jax.random.split(rng)
            val_metrics = trainer.evaluate(val_batches, sub)
            rng, sub = jax.random.split(rng)
            val_metrics.update(run_sampler_eval(step_id, sub))
            if trainer.logger:
                trainer.logger.log(
                    step_id,
                    {"train-loss/noise_mse": loss}
                    | {
                        f"train-losses/{k}": v
                        for k, v in train_metrics.items()
                    }
                    | {f"val-losses/{k}": v for k, v in val_metrics.items()},
                )
            # Reference best-checkpoint key: val-losses/traj_action_mse
            # (main_trajectory.py:274) — the sampled-trajectory MSE from the
            # sampler eval, not the denoiser noise MSE.
            metric_key = (
                "traj_action_mse"
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
