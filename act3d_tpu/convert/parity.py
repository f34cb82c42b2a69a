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

The third half closes the loop without this machine ever needing the
reference installed (``request``): it writes a SELF-CONTAINED golden-request
directory — probe.npz (every input, incl. the fixed ghost points) plus a
standalone ``golden_runner.py`` that any machine with the reference repo +
torch/torchvision/diffusers/CLIP can run to produce golden.npz:

  python -m act3d_tpu.convert.parity request --model act3d --out req_act3d/
  # ... on the reference machine:
  python req_act3d/golden_runner.py --reference /path/to/act3d-chained-diffuser \
      --checkpoint best.pth --probe req_act3d/probe.npz --out golden.npz
  # ... back here:
  python -m act3d_tpu.convert.parity dump --model act3d --checkpoint best.pth --out ours.npz
  python -m act3d_tpu.convert.parity compare ours.npz golden.npz --tol 1e-3
"""

from __future__ import annotations

import argparse
import json
from pathlib import Path

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


def ghost_probe_points(bounds, num_sampling_level: int, n_total: int = 1000):
    """Fixed per-level ghost points shared by dump_act3d and the golden
    request (np.random.RandomState(4321), uniform in bounds)."""
    n_ghost = n_total // num_sampling_level
    rs = np.random.RandomState(4321)
    lo, hi = np.asarray(bounds[0]), np.asarray(bounds[1])
    return [
        (lo + rs.uniform(0, 1, (1, n_ghost, 3)) * (hi - lo)).astype(np.float32)
        for _ in range(num_sampling_level)
    ]


_GOLDEN_RUNNER = '''\
"""Standalone golden dump for act3d_tpu checkpoint parity.

Run on a machine with the REFERENCE repo (zhouxian/act3d-chained-diffuser)
and its deps (torch, torchvision, diffusers, openai-CLIP) installed:

    python golden_runner.py --reference /path/to/act3d-chained-diffuser \\
        --checkpoint best.pth --probe probe.npz --out golden.npz

Then compare on the act3d_tpu side:
    python -m act3d_tpu.convert.parity compare ours.npz golden.npz --tol 1e-3
"""

import argparse
import json
import sys
import types

import numpy as np
import torch


def strip_module(sd):
    return { (k[7:] if k.startswith("module.") else k): v for k, v in sd.items() }


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--reference", required=True)
    p.add_argument("--checkpoint", required=True)
    p.add_argument("--probe", required=True)
    p.add_argument("--out", required=True)
    args = p.parse_args()

    sys.path.insert(0, args.reference)
    probe = np.load(args.probe)
    config = json.loads(str(probe["config"]))
    bounds = probe["gripper_loc_bounds"]

    sd = torch.load(args.checkpoint, map_location="cpu")
    sd = sd.get("weight", sd)
    sd = strip_module(sd)

    rgb = torch.tensor(probe["rgb"])
    pcd = torch.tensor(probe["pcd"])
    instr = torch.tensor(probe["instr"])
    gripper = torch.tensor(probe["gripper"])

    if config["model"] == "act3d":
        from model.keypose_optimization.act3d import Act3D

        model = Act3D(
            backbone="clip",
            image_size=(256, 256),
            embedding_dim=config["embedding_dim"],
            num_ghost_point_cross_attn_layers=2,
            num_query_cross_attn_layers=2,
            num_vis_ins_attn_layers=2,
            rotation_parametrization="quat_from_query",
            gripper_loc_bounds=bounds,
            num_ghost_points=config["num_ghost_points"],
            num_ghost_points_val=config["num_ghost_points"],
            weight_tying=True,
            gp_emb_tying=True,
            num_sampling_level=config["num_sampling_level"],
            use_instruction=True,
        )
        model.load_state_dict(sd)
        model.eval()

        ghost_levels = [
            torch.tensor(probe[f"ghost_level{i}"])
            for i in range(config["num_sampling_level"])
        ]

        def fixed_ghost_points(self, total_timesteps, device, level, anchor=None):
            g = ghost_levels[level].to(device)
            return g.expand(total_timesteps, -1, -1).contiguous()

        model._sample_ghost_points = types.MethodType(fixed_ghost_points, model)

        with torch.no_grad():
            pred = model(rgb, pcd, instr, gripper)
        out = {
            "position": pred["position"].numpy(),
            "rotation": pred["rotation"].numpy(),
            "gripper": pred["gripper"].numpy(),
        }
        for i, masks in enumerate(pred["ghost_pcd_masks_pyramid"]):
            out[f"mask_level{i}"] = masks[-1].numpy()
        np.savez(args.out, **out)

    elif config["model"] == "diffusion":
        from model.trajectory_optimization.diffusion_model import DiffusionPlanner

        model = DiffusionPlanner(
            backbone="clip",
            image_size=(256, 256),
            embedding_dim=config["embedding_dim"],
            output_dim=7,
            num_query_cross_attn_layers=config["num_query_cross_attn_layers"],
            use_instruction=True,
            use_goal=True,
            use_goal_at_test=False,
            rotation_parametrization="6D",
            diffusion_timesteps=config["diffusion_timesteps"],
            gripper_loc_bounds=bounds,
        )
        model.load_state_dict(sd)
        model.eval()

        traj = torch.tensor(probe["trajectory"]).clone()
        mask = torch.tensor(probe["trajectory_mask"])
        curr = gripper[:, :7].clone()
        goal = torch.tensor(probe["goal"]).clone()
        pcd_n = torch.permute(
            model.normalize_pos(torch.permute(pcd, [0, 1, 3, 4, 2])),
            [0, 1, 4, 2, 3],
        )
        traj[..., :3] = model.normalize_pos(traj[..., :3])
        curr[:, :3] = model.normalize_pos(curr[:, :3])
        goal[:, :3] = model.normalize_pos(goal[:, :3])
        traj9 = model.convert_rot(traj)
        curr9 = model.convert_rot(curr)
        goal9 = model.convert_rot(goal)

        fixed_inputs = (mask, rgb, pcd_n, instr, curr9, goal9)
        timestep = torch.tensor(probe["timestep"]).long()
        with torch.no_grad():
            pred = model.policy_forward_pass(traj9, timestep, fixed_inputs)
        np.savez(
            args.out,
            denoised=pred[-1].numpy(),
            noisy_input=traj9.numpy(),
        )
    else:
        raise SystemExit(f"unknown model {config['model']!r}")
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
'''


def write_request(model_kind: str, out_dir: str, bounds):
    """Write a self-contained golden-request packet (probe + torch runner)."""
    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    probe = probe_inputs(model_kind)
    config = {"model": model_kind}
    if model_kind == "act3d":
        config.update(
            embedding_dim=60, num_sampling_level=3, num_ghost_points=1000
        )
        for i, g in enumerate(ghost_probe_points(bounds, 3)):
            probe[f"ghost_level{i}"] = g
    else:
        config.update(
            embedding_dim=120, num_query_cross_attn_layers=6,
            diffusion_timesteps=100,
        )
    np.savez(
        out / "probe.npz",
        config=json.dumps(config),
        gripper_loc_bounds=np.asarray(bounds, np.float64),
        **probe,
    )
    (out / "golden_runner.py").write_text(_GOLDEN_RUNNER)
    # ship the diffusers scheduler golden dump with every packet, so one
    # reference-machine session also produces the scheduler table that
    # unskips tests/test_schedulers_golden.py (diffusers is absent here)
    import shutil

    from . import golden_scheduler

    shutil.copyfile(
        golden_scheduler.__file__, out / "scheduler_golden_runner.py"
    )
    (out / "README.md").write_text(
        "Golden-request packet for act3d_tpu checkpoint parity.\n\n"
        "On a machine with the reference repo + torch/torchvision/diffusers/"
        "CLIP:\n\n"
        f"    python golden_runner.py --reference <ref_repo> "
        f"--checkpoint <{model_kind}.pth> --probe probe.npz --out golden.npz\n"
        "    python scheduler_golden_runner.py --out "
        "ddpm_scheduler_golden.npz\n\n"
        "Back on the act3d_tpu side:\n\n"
        f"    python -m act3d_tpu.convert.parity dump --model {model_kind} "
        "--checkpoint <same.pth> --out ours.npz\n"
        "    python -m act3d_tpu.convert.parity compare ours.npz golden.npz "
        "--tol 1e-3\n"
        "    cp ddpm_scheduler_golden.npz <act3d_tpu>/tests/golden/\n"
    )
    print(
        f"wrote {out}/probe.npz, golden_runner.py, "
        "scheduler_golden_runner.py, README.md"
    )


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
    ghost_levels = ghost_probe_points(bounds, num_sampling_level)

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
    r = sub.add_parser("request")
    r.add_argument("--model", choices=["diffusion", "act3d"], required=True)
    r.add_argument("--out", required=True)
    r.add_argument("--gripper_loc_bounds", default=None)
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
    if args.cmd == "request":
        write_request(args.model, args.out, bounds)
    elif args.model == "diffusion":
        dump_diffusion(args.checkpoint, args.out, bounds)
    else:
        dump_act3d(args.checkpoint, args.out, bounds)


if __name__ == "__main__":
    main()
