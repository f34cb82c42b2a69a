"""End-to-end rehearsal of the checkpoint-parity packet (VERDICT r2 #2).

Executes every link of the BASELINE acceptance loop that this machine can
run:  ``parity request`` emits the packet → the packet's
``golden_runner.py`` runs AS A SUBPROCESS against the torch-only fake
reference repo (tests/fake_reference — reference import paths, state-dict
layout and forward semantics) with a synthetic checkpoint → ``parity
dump`` converts the same checkpoint through the production converter and
runs the flax model on the packet probe → ``parity compare`` must agree
within the BASELINE 1e-3 tolerance.

The only link left untested is the reference repo's own deps
(torchvision / diffusers / CLIP), which this image cannot install.
"""

import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest
import torch

from act3d_tpu.convert import parity

FAKE_REF = Path(__file__).parent / "fake_reference"


def _import_fake(modname):
    sys.path.insert(0, str(FAKE_REF))
    try:
        import importlib

        return importlib.import_module(modname)
    finally:
        sys.path.pop(0)


def _randomize_bn(model, rng):
    for m in model.modules():
        if isinstance(m, torch.nn.BatchNorm2d):
            with torch.no_grad():
                m.running_mean.copy_(
                    torch.tensor(
                        rng.normal(0, 0.3, m.num_features), dtype=torch.float32
                    )
                )
                m.running_var.copy_(
                    torch.tensor(
                        rng.uniform(0.5, 1.5, m.num_features),
                        dtype=torch.float32,
                    )
                )


def _save_reference_checkpoint(model, path):
    """DDP-prefixed {'weight': sd} layout (reference engine.py:214-230)."""
    sd = {f"module.{k}": v for k, v in model.state_dict().items()}
    torch.save({"weight": sd, "iter": 0}, path)


def _run_golden_runner(req_dir, ckpt, out):
    proc = subprocess.run(
        [
            sys.executable, str(req_dir / "golden_runner.py"),
            "--reference", str(FAKE_REF),
            "--checkpoint", str(ckpt),
            "--probe", str(req_dir / "probe.npz"),
            "--out", str(out),
        ],
        capture_output=True, text=True, timeout=1200,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    assert out.exists()


@pytest.mark.slow
def test_diffusion_packet_rehearsal(tmp_path, rng):
    req = tmp_path / "req_diffusion"
    parity.main(["request", "--model", "diffusion", "--out", str(req)])
    assert (req / "probe.npz").exists() and (req / "golden_runner.py").exists()

    dm = _import_fake("model.trajectory_optimization.diffusion_model")
    torch.manual_seed(0)
    bounds = np.array([[-2.0, -2.0, -2.0], [2.0, 2.0, 2.0]])
    model = dm.DiffusionPlanner(
        embedding_dim=120, num_query_cross_attn_layers=6,
        diffusion_timesteps=100, gripper_loc_bounds=bounds,
    )
    _randomize_bn(model, rng)
    model.eval()
    ckpt = tmp_path / "diffusion.pth"
    _save_reference_checkpoint(model, ckpt)

    golden = tmp_path / "golden.npz"
    _run_golden_runner(req, ckpt, golden)

    ours = tmp_path / "ours.npz"
    parity.main(
        ["dump", "--model", "diffusion", "--checkpoint", str(ckpt),
         "--out", str(ours)]
    )
    parity.main(["compare", str(ours), str(golden), "--tol", "1e-3"])


@pytest.mark.slow
def test_act3d_packet_rehearsal(tmp_path, rng):
    req = tmp_path / "req_act3d"
    parity.main(["request", "--model", "act3d", "--out", str(req)])
    probe = np.load(req / "probe.npz")
    assert "ghost_level0" in probe.files  # fixed points ship in the packet

    act3d_mod = _import_fake("model.keypose_optimization.act3d")
    torch.manual_seed(1)
    bounds = np.array([[-2.0, -2.0, -2.0], [2.0, 2.0, 2.0]])
    model = act3d_mod.Act3D(
        embedding_dim=60, num_sampling_level=3,
        num_ghost_points=1000, num_ghost_points_val=1000,
        gripper_loc_bounds=bounds, use_instruction=True,
    )
    _randomize_bn(model, rng)
    model.eval()
    ckpt = tmp_path / "act3d.pth"
    _save_reference_checkpoint(model, ckpt)

    golden = tmp_path / "golden.npz"
    _run_golden_runner(req, ckpt, golden)

    ours = tmp_path / "ours.npz"
    parity.main(
        ["dump", "--model", "act3d", "--checkpoint", str(ckpt),
         "--out", str(ours)]
    )
    parity.main(["compare", str(ours), str(golden), "--tol", "1e-3"])
