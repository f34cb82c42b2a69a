"""Checkpoint-parity harness.

BASELINE.json requires converted reference checkpoints to reproduce
keypose / trajectory outputs within 1e-3.  This harness has two halves:

  1. ``dump`` — load a reference ``.pth``, convert it, run this framework's
     model on a deterministic probe input, and save outputs to ``.npz``.
  2. ``compare`` — diff two ``.npz`` dumps (ours vs a golden dump produced
     by running the same probe through the reference PyTorch model on a
     machine that has it) and report per-output max abs error.

The probe inputs are seeded and identical across frameworks (numpy
RandomState, independent of torch/jax RNGs).

Run:
  python -m act3d_tpu.convert.parity dump --model diffusion \
      --checkpoint traj_best.pth --out ours.npz
  python -m act3d_tpu.convert.parity compare ours.npz golden.npz --tol 1e-3
"""

from __future__ import annotations

import argparse
import numpy as np


def probe_inputs(model_kind: str, ncam: int = 3, image_size=(256, 256)):
    """Deterministic probe batch, identical across frameworks."""
    rs = np.random.RandomState(1234)
    h, w = image_size
    rgb = rs.uniform(0, 1, (1, ncam, 3, h, w)).astype(np.float32)
    pcd = rs.uniform(-0.4, 1.2, (1, ncam, 3, h, w)).astype(np.float32)
    instr = rs.randn(1, 53, 512).astype(np.float32)
    quat = rs.randn(1, 4).astype(np.float32)
    quat /= np.linalg.norm(quat, axis=-1, keepdims=True)
    gripper8 = np.concatenate(
        [rs.uniform(-0.2, 0.8, (1, 3)).astype(np.float32), quat,
         np.ones((1, 1), np.float32)], axis=-1,
    )
    out = dict(rgb=rgb, pcd=pcd, instr=instr, gripper=gripper8)
    if model_kind == "diffusion":
        tq = rs.randn(1, 50, 4).astype(np.float32)
        tq /= np.linalg.norm(tq, axis=-1, keepdims=True)
        traj = np.concatenate(
            [rs.uniform(-0.2, 0.8, (1, 50, 3)).astype(np.float32), tq], -1
        )
        out["trajectory"] = traj
        out["trajectory_mask"] = np.zeros((1, 50), bool)
        out["timestep"] = np.asarray([37], np.int64)
        quat2 = rs.randn(1, 4).astype(np.float32)
        quat2 /= np.linalg.norm(quat2, axis=-1, keepdims=True)
        out["goal"] = np.concatenate(
            [rs.uniform(-0.2, 0.8, (1, 3)).astype(np.float32), quat2], -1
        )
    return out


def dump_diffusion(checkpoint: str, out: str, bounds):
    """Denoiser single-step outputs on the probe (deterministic — no
    sampling loop, mirrors policy_forward_pass)."""
    import jax
    import jax.numpy as jnp

    from ..convert.torch_to_jax import convert_diffusion_planner
    from ..models import DiffusionPlanner

    probe = probe_inputs("diffusion")
    model = DiffusionPlanner(
        embedding_dim=120, output_dim=7, num_query_cross_attn_layers=6,
        use_instruction=True, use_goal=True, use_goal_at_test=False,
        rotation_parametrization="6D",
        gripper_loc_bounds=tuple(map(tuple, bounds)),
    )
    variables = model.init(
        jax.random.PRNGKey(0),
        jnp.asarray(probe["trajectory"]),
        jnp.asarray(probe["trajectory_mask"]),
        probe["rgb"], probe["pcd"], probe["instr"],
        probe["gripper"][:, :7], probe["goal"],
        noise_rng=jax.random.PRNGKey(0),
    )
    import torch

    sd = torch.load(checkpoint, map_location="cpu")
    sd = sd.get("weight", sd)
    params = convert_diffusion_planner(sd, variables["params"])

    # Single deterministic denoiser pass through the module's public
    # encode/denoise_step methods (mirrors policy_forward_pass at a fixed
    # timestep — the full sampler differs only by scheduler arithmetic,
    # which tests cover separately).
    context, curr, goal = model.apply(
        {"params": params},
        probe["rgb"], probe["pcd"], probe["instr"],
        probe["gripper"][:, :7], probe["goal"],
        method=DiffusionPlanner.encode,
    )
    gt = np.concatenate(
        [
            np.asarray(
                model.normalize_pos(jnp.asarray(probe["trajectory"][..., :3]))
            ),
            probe["trajectory"][..., 3:],
        ],
        axis=-1,
    )
    gt9 = np.asarray(model.convert_rot(jnp.asarray(gt)))
    denoised = model.apply(
        {"params": params},
        jnp.asarray(gt9),
        jnp.asarray(probe["trajectory_mask"]),
        jnp.asarray(probe["timestep"]),
        context,
        method=DiffusionPlanner.denoise_step,
    )
    np.savez(out, denoised=np.asarray(denoised), noisy_input=gt9)
    print(f"wrote {out}: denoised {np.asarray(denoised).shape}")


def dump_act3d(checkpoint: str, out: str, bounds, num_sampling_level=3):
    """Act3D outputs on the probe with FIXED ghost points per level
    (``ghost_points_override``) so the stochastic sampler drops out of the
    comparison.  The golden torch-side dump must feed the same seeded
    points (np.random.RandomState(4321) uniform in bounds) to the reference
    model's `_compute_ghost_point_features` path."""
    import jax
    import jax.numpy as jnp

    from ..convert.torch_to_jax import convert_act3d
    from ..models import Act3D

    probe = probe_inputs("act3d")
    n_ghost = 1000 // num_sampling_level
    rs = np.random.RandomState(4321)
    lo, hi = np.asarray(bounds[0]), np.asarray(bounds[1])
    ghost_levels = [
        (lo + rs.uniform(0, 1, (1, n_ghost, 3)) * (hi - lo)).astype(np.float32)
        for _ in range(num_sampling_level)
    ]

    model = Act3D(
        embedding_dim=60,
        num_sampling_level=num_sampling_level,
        num_ghost_points=1000,
        num_ghost_points_val=1000,
        gripper_loc_bounds=tuple(map(tuple, bounds)),
        use_instruction=True,
    )
    variables = model.init(
        jax.random.PRNGKey(0), probe["rgb"], probe["pcd"], probe["instr"],
        probe["gripper"], sample_rng=jax.random.PRNGKey(0),
        ghost_points_override=[jnp.asarray(g) for g in ghost_levels],
    )
    import torch

    sd = torch.load(checkpoint, map_location="cpu")
    sd = sd.get("weight", sd)
    params = convert_act3d(
        sd, variables["params"], num_sampling_level=num_sampling_level
    )
    pred = model.apply(
        {"params": params}, probe["rgb"], probe["pcd"], probe["instr"],
        probe["gripper"], sample_rng=jax.random.PRNGKey(0),
        ghost_points_override=[jnp.asarray(g) for g in ghost_levels],
    )
    np.savez(
        out,
        position=np.asarray(pred["position"]),
        rotation=np.asarray(pred["rotation"]),
        gripper=np.asarray(pred["gripper"]),
        **{
            f"mask_level{i}": np.asarray(m[-1])
            for i, m in enumerate(pred["ghost_pcd_masks_pyramid"])
        },
    )
    print(f"wrote {out}")


def compare(a_path: str, b_path: str, tol: float):
    a, b = np.load(a_path), np.load(b_path)
    keys = sorted(set(a.files) & set(b.files))
    ok = True
    for k in keys:
        err = float(np.abs(a[k] - b[k]).max())
        status = "OK" if err <= tol else "FAIL"
        ok &= err <= tol
        print(f"{k}: max abs err {err:.2e} [{status}]")
    if not ok:
        raise SystemExit(1)


def main(argv=None):
    p = argparse.ArgumentParser()
    sub = p.add_subparsers(dest="cmd", required=True)
    d = sub.add_parser("dump")
    d.add_argument("--model", choices=["diffusion", "act3d"], required=True)
    d.add_argument("--checkpoint", required=True)
    d.add_argument("--out", required=True)
    d.add_argument("--gripper_loc_bounds", default=None)
    c = sub.add_parser("compare")
    c.add_argument("a")
    c.add_argument("b")
    c.add_argument("--tol", type=float, default=1e-3)
    args = p.parse_args(argv)

    if args.cmd == "compare":
        compare(args.a, args.b, args.tol)
        return

    if args.gripper_loc_bounds:
        from ..utils.registry import get_gripper_loc_bounds

        bounds = get_gripper_loc_bounds(args.gripper_loc_bounds, buffer=0.04)
    else:
        bounds = np.array([[-2.0, -2.0, -2.0], [2.0, 2.0, 2.0]])
    if args.model == "diffusion":
        dump_diffusion(args.checkpoint, args.out, bounds)
    else:
        dump_act3d(args.checkpoint, args.out, bounds)


if __name__ == "__main__":
    main()
