"""Sustained flagship training run with a mid-run preemption (VERDICT r2 #1b).

Drives the REAL trajectory-diffusion CLI (act3d_tpu.train.main_trajectory)
at the reference production config — emb 120, 6 query layers, batch 22,
3 cameras, 256x256, interpolation length 50 — for ~2k optimizer steps on
synthetic blosc fixtures with FRESH batches, kills it with SIGTERM
mid-run, relaunches the same command line (auto_resume picks up
last.msgpack), and verifies:

  * the loss curve decreases (first-quarter mean vs last-quarter mean),
  * the resumed run continues from the preemption step (no restart),
  * val metrics were logged throughout.

Run ON THE TPU (one process at a time; ~30-45 min incl. first compile):

    python scripts/sustained_run.py                 # full (2000 steps)
    SUSTAIN_STEPS=60 SUSTAIN_IMAGE=128 python scripts/sustained_run.py  # smoke

Prints a loss-curve summary for BENCH_NOTES.md.
"""

import json
import os
import pickle
import signal
import subprocess
import sys
import tempfile
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

STEPS = int(os.environ.get("SUSTAIN_STEPS", "2000"))
IMAGE = int(os.environ.get("SUSTAIN_IMAGE", "256"))
NCAM = int(os.environ.get("SUSTAIN_NCAM", "3"))
BATCH = int(os.environ.get("SUSTAIN_BATCH", "22"))
VAL_FREQ = max(STEPS // 8, 10)
KILL_AFTER_STEP = STEPS // 2


def make_fixtures(tmp: Path):
    from act3d_tpu.data.fixtures import make_dataset_tree, make_instructions

    tasks = ("pick_and_lift", "push_button")
    tree = make_dataset_tree(
        tmp / "data", tasks=tasks, variations=(0,),
        episodes_per_variation=3, n_frames=4, n_cam=NCAM, image_size=IMAGE,
    )
    ipath = tmp / "instructions.pkl"
    ipath.write_bytes(pickle.dumps(make_instructions(tasks, (0,))))
    return tree, ipath, tasks


def launch(tree, ipath, tasks, log_base):
    cmd = [
        sys.executable, "-m", "act3d_tpu.train.main_trajectory",
        "--dataset", str(tree), "--valset", str(tree),
        "--tasks", *tasks, "--instructions", str(ipath),
        "--use_instruction", "1", "--use_goal", "1",
        "--image_size", f"{IMAGE},{IMAGE}",
        "--cameras", *("wrist", "left_shoulder", "right_shoulder")[:NCAM],
        "--dense_interpolation", "1", "--interpolation_length", "50",
        "--train_iters", str(STEPS), "--val_freq", str(VAL_FREQ),
        "--batch_size", str(BATCH), "--batch_size_val", "4",
        "--base_log_dir", str(log_base), "--run_log_dir", "sustained",
        "--cache_size", "100", "--cache_size_val", "100",
        "--mixed_precision", "1", "--compact_transfer", "1",
        "--num_workers", "1", "--auto_resume", "1",
        # SUSTAIN_WIRE=depth exercises the r5 depth H2D wire end-to-end
        "--wire", os.environ.get("SUSTAIN_WIRE", "pcd"),
        "--instr_mode",
        "ids" if os.environ.get("SUSTAIN_WIRE") == "depth" else "features",
    ]
    return subprocess.Popen(
        cmd, cwd=str(REPO), stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        text=True,
    )


def last_logged_step(metrics_path: Path):
    step = -1
    if metrics_path.exists():
        for line in metrics_path.read_text().splitlines():
            try:
                step = max(step, json.loads(line).get("step", -1))
            except json.JSONDecodeError:
                pass
    return step


def pump(proc, until_step=None, metrics_path=None, timeout=7200):
    """Stream child output; optionally return once metrics pass a step."""
    t0 = time.time()
    while True:
        line = proc.stdout.readline()
        if line:
            print(f"  | {line.rstrip()}", flush=True)
        if proc.poll() is not None and not line:
            return proc.returncode
        if until_step is not None and last_logged_step(metrics_path) >= until_step:
            return None
        if time.time() - t0 > timeout:
            proc.kill()
            raise TimeoutError("run exceeded timeout")


def main():
    tmp = Path(tempfile.mkdtemp(prefix="act3d_sustained_"))
    print(f"fixtures -> {tmp}")
    tree, ipath, tasks = make_fixtures(tmp)
    log_base = tmp / "logs"
    log_dir = log_base / "exp" / "sustained"
    metrics = log_dir / "metrics.jsonl"

    print(f"[1/3] launch, SIGTERM after step {KILL_AFTER_STEP}")
    p1 = launch(tree, ipath, tasks, log_base)
    rc = pump(p1, until_step=KILL_AFTER_STEP, metrics_path=metrics)
    if rc is None:
        print("  -> sending SIGTERM (simulated preemption)")
        p1.send_signal(signal.SIGTERM)
        rc = pump(p1)
    assert rc == 0, f"first run exited rc={rc}"
    step_at_kill = last_logged_step(metrics)
    assert (log_dir / "last.msgpack").exists(), "no preemption checkpoint"

    print("[2/3] relaunch with the same command line (auto_resume)")
    p2 = launch(tree, ipath, tasks, log_base)
    rc = pump(p2)
    assert rc == 0, f"resumed run exited rc={rc}"

    print("[3/3] verify")
    records = [json.loads(x) for x in metrics.read_text().splitlines()]
    steps = [r["step"] for r in records]
    # MetricLogger writes one train-loss/<name> key per loss component;
    # the trajectory criterion's single component is noise_mse
    loss_keys = [k for k in records[0] if k.startswith("train-loss/")]
    assert loss_keys, f"no train-loss/* keys in {sorted(records[0])}"
    losses = [
        sum(r[k] for k in loss_keys) for r in records
        if all(k in r for k in loss_keys)
    ]
    assert max(steps) >= STEPS - VAL_FREQ, (max(steps), STEPS)
    resumed_first = min(s for s in steps if s > step_at_kill)
    assert resumed_first <= step_at_kill + VAL_FREQ + 1, (
        "resume restarted instead of continuing",
        step_at_kill, resumed_first,
    )
    q = max(len(losses) // 4, 1)
    head, tail = sum(losses[:q]) / q, sum(losses[-q:]) / q
    print(f"loss curve ({len(losses)} val points): "
          + " ".join(f"{s}:{l:.1f}" for s, l in zip(steps, losses)))
    print(f"first-quarter mean {head:.2f} -> last-quarter mean {tail:.2f}")
    assert tail < head, "loss did not decrease over the sustained run"
    print("SUSTAINED RUN OK (preemption + resume + decreasing loss)")


if __name__ == "__main__":
    main()
