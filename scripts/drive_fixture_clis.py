"""End-to-end fixture drive of the training AND eval CLIs on a virtual
CPU mesh.

Runs the REAL entry points (`act3d_tpu.train.main_keypose` /
`main_trajectory`) against synthetic blosc fixtures with the full
TPU-deployment configuration by default: 8 virtual devices as a dp4 x
fsdp2 mesh, bf16 mixed precision, 2 sampler worker processes and compact
uint8/f16 host->device transfer.  Checks that both runs complete with
finite losses and write best/last checkpoints — then feeds those
checkpoints to the REAL eval CLI (`act3d_tpu.eval.main`) on the sim-free
backend (eval/fake_sim.py) and checks the per-task success-rate JSON it
writes (the reference eval1.py:209-241 surface).

Usage (from the repo root; ~6-10 min on one CPU core):
  python scripts/drive_fixture_clis.py           # full deployment config
  DRIVE_BASIC=1 python scripts/drive_fixture_clis.py   # 1 device, no extras
"""

import os
import pickle
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ["JAX_PLATFORM_NAME"] = "cpu"
os.environ["JAX_PLATFORMS"] = "cpu"

BASIC = os.environ.get("DRIVE_BASIC", "0") == "1"
N_DEV = 1 if BASIC else 8
if N_DEV > 1:
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + f" --xla_force_host_platform_device_count={N_DEV}"
    )

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

from pathlib import Path  # noqa: E402

from act3d_tpu.data.fixtures import make_dataset_tree, make_instructions  # noqa: E402


def main():
    tmp = Path(tempfile.mkdtemp(prefix="act3d_drive_"))
    tree = make_dataset_tree(tmp / "data", image_size=128, n_cam=1)
    ipath = tmp / "instructions.pkl"
    ipath.write_bytes(pickle.dumps(make_instructions()))

    batch = str(max(2, N_DEV))
    common = [
        "--dataset", str(tree), "--valset", str(tree),
        "--tasks", "pick_and_lift", "--instructions", str(ipath),
        "--use_instruction", "1", "--image_size", "128,128",
        "--cameras", "wrist", "--train_iters", "2", "--val_freq", "2",
        "--batch_size", batch, "--batch_size_val", batch,
        "--base_log_dir", str(tmp / "logs"),
        "--cache_size", "4", "--cache_size_val", "4",
        "--num_devices", str(N_DEV),
    ]
    if not BASIC:
        common += [
            "--fsdp", "2", "--num_workers", "2",
            "--compact_transfer", "1", "--mixed_precision", "1",
        ]
        if os.environ.get("DRIVE_WIRE", "pcd") == "depth":
            # depth H2D wire + device-resident instruction bank
            # (data/depthwire.py; excludes --device_augment by design)
            common += ["--wire", "depth", "--instr_mode", "ids"]
        else:
            common += ["--device_augment", "1"]

    from act3d_tpu.train import main_keypose, main_trajectory

    print("=== keypose ===", flush=True)
    main_keypose.main(common + [
        "--embedding_dim", "12", "--num_ghost_points", "32",
        "--num_ghost_points_val", "32",
        "--num_ghost_point_cross_attn_layers", "1",
        "--num_query_cross_attn_layers", "1",
        "--num_vis_ins_attn_layers", "1",
        "--run_log_dir", "kp",
    ])
    assert (tmp / "logs" / "exp" / "kp" / "best.msgpack").exists()

    print("=== trajectory ===", flush=True)
    main_trajectory.main(common + [
        "--embedding_dim", "24", "--num_query_cross_attn_layers", "1",
        "--num_vis_ins_attn_layers", "1", "--diffusion_timesteps", "5",
        "--use_goal", "1",  # chained eval feeds Act3D's goal (eval1.py)
        "--run_log_dir", "tj",
    ])
    assert (tmp / "logs" / "exp" / "tj" / "best.msgpack").exists()

    # --- eval CLI on the sim-free backend, consuming both checkpoints
    # (reference online_evaluation/eval1.py:209-241's surface: checkpoint
    # load -> task loop -> per-task success-rate JSON)
    print("=== eval ===", flush=True)
    import json

    from act3d_tpu.eval import main as eval_main

    out = tmp / "eval_results.json"
    results = eval_main.main([
        "--data_dir", str(tree), "--tasks", "pick_and_lift",
        "--instructions", str(ipath),
        "--keypose_ckpt", str(tmp / "logs" / "exp" / "kp" / "best.msgpack"),
        "--traj_ckpt", str(tmp / "logs" / "exp" / "tj" / "best.msgpack"),
        "--image_size", "128,128", "--cameras", "wrist",
        "--keypose_embedding_dim", "12", "--traj_embedding_dim", "24",
        "--num_ghost_points", "32", "--num_ghost_points_val", "32",
        "--num_ghost_point_cross_attn_layers", "1",
        "--keypose_query_cross_attn_layers", "1",
        "--num_vis_ins_attn_layers", "1",
        "--num_query_cross_attn_layers", "1",
        "--diffusion_timesteps", "5", "--interpolation_length", "6",
        "--num_demos", "1", "--max_tries", "1", "--max_steps", "2",
        "--log_dir", str(tmp / "eval_logs"), "--output", str(out),
        "--fake_sim", "1",
    ])
    on_disk = json.loads(out.read_text())
    assert set(on_disk) == {"pick_and_lift"}, on_disk
    assert "mean" in on_disk["pick_and_lift"], on_disk
    assert 0.0 <= on_disk["pick_and_lift"]["mean"] <= 1.0
    # JSON round-trip stringifies the int variation keys
    assert on_disk["pick_and_lift"]["mean"] == results["pick_and_lift"]["mean"]
    print("CLI DRIVE OK (keypose + trajectory + eval)")


if __name__ == "__main__":
    main()
