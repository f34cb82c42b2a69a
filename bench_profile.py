"""Capture an XLA profiler trace of a training step and print top ops.

Usage:
  BENCH_MODEL=act3d python bench_profile.py     # act3d step (default)
  BENCH_MODEL=diffusion python bench_profile.py

Uses the hand-rolled XSpace reader (act3d_tpu.utils.xplane) — the stock
tensorboard profile plugin has a proto version skew in this image.
Self-times are per-step averages over the traced scan chain.
"""

from __future__ import annotations

import glob
import os
import tempfile

import jax

from act3d_tpu.core.cache import enable_compilation_cache, enable_fast_prng

enable_compilation_cache()
enable_fast_prng()

import jax.numpy as jnp  # noqa: E402

from act3d_tpu.parallel.mesh import make_mesh, shard_batch  # noqa: E402
from act3d_tpu.train.engine import Trainer  # noqa: E402
from act3d_tpu.utils.xplane import top_op_categories, top_ops  # noqa: E402
from bench import build_act3d, build_diffusion  # noqa: E402


def main():
    kind = os.environ.get("BENCH_MODEL", "act3d")
    batch = int(os.environ.get("BENCH_BATCH", "16" if kind == "act3d" else "22"))
    chain = int(os.environ.get("BENCH_CHAIN", "20"))
    k = int(os.environ.get("BENCH_TOPK", "40"))
    dtype = jnp.bfloat16 if os.environ.get("BENCH_BF16", "1") == "1" else None

    if kind == "act3d":
        loss_fn, variables, data = build_act3d(batch, 3, 256, dtype)
    else:
        loss_fn, variables, data = build_diffusion(batch, 3, 256, 50, dtype)

    mesh = make_mesh(num_devices=1)
    trainer = Trainer(loss_fn, variables["params"], mesh=mesh)
    data = shard_batch(data, mesh)

    # Plain (unscanned) steps: inside a lax.scan the device trace attributes
    # everything to one `while` op; individual dispatches keep op-level
    # attribution.  Wall time includes tunnel RPC — use bench.py for
    # throughput, this tool for *relative* op cost only.
    out = trainer.step(data, jax.random.PRNGKey(0))
    float(out["loss"])  # compile + warm

    logdir = os.environ.get("BENCH_TRACE_DIR") or tempfile.mkdtemp(
        prefix=f"{kind}_trace_"
    )
    chain = max(chain // 4, 3)
    with jax.profiler.trace(logdir):
        for i in range(chain):
            out = trainer.step(data, jax.random.PRNGKey(i + 1))
            float(out["loss"])

    paths = sorted(glob.glob(f"{logdir}/**/*.xplane.pb", recursive=True))
    print(f"trace: {paths[-1] if paths else 'MISSING'}")
    for p in paths[-1:]:
        from act3d_tpu.utils.xplane import op_sources

        src = op_sources(p)
        print(f"== top {k} ops (self-time ms/step, {chain}-step scan) ==")
        # top_ops/top_op_categories return ms totals (utils/xplane.py)
        for name, t in top_ops(p, k):
            where = src.get(name, "")
            # keep the informative tail of the op_name path
            where = "/".join(where.split("/")[-3:])[:90]
            print(f"{t / chain:9.3f} ms  {name[:60]:60s} {where}")
        print("== categories ==")
        for name, t in top_op_categories(p, 15):
            print(f"{t / chain:9.3f} ms  {name[:80]}")


if __name__ == "__main__":
    main()
