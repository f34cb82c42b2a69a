"""Minimal-repro ladder for the r3 remote-compile crash at the 50x3074
dropout-fused cross-attention site (BENCH_NOTES 'In-kernel attention
dropout').

Round-3 observation: with ACT3D_FUSED_DROPOUT=1 the full diffusion
training step crashes the remote compile helper, while the same kernel at
the same shapes compiles standalone and in a two-site module — i.e. a
toolchain/module-size interaction, not a kernel bug.  This script walks a
ladder of progressively larger programs, each containing the suspect
(B=22, L=50, S=3074, H=8, E=120, dropout 0.1) fused-MHA-with-dropout
call, and reports the first rung that fails:

  1. kernel alone (fwd)
  2. kernel + backward (grad)
  3. kernel + backward inside a 6-layer attention stack
  4. the real DiffusionPlanner training loss, dropout-fused sites enabled

Run on TPU (one process at a time on this VM):
  ACT3D_FUSED_DROPOUT=1 python scripts/repro_fused_dropout_crash.py

Each rung runs in the parent by default; RUNG_SUBPROC=1 isolates rungs in
subprocesses so a helper crash doesn't kill the ladder.
"""

import os
import subprocess
import sys
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

B, L, S, H, E = 22, 50, 3074, 8, 120
RATE = 0.1


def rung1_kernel_fwd():
    import jax
    import jax.numpy as jnp

    from act3d_tpu.kernels.attention import fused_cross_attention

    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(0), 3)
    q = jax.random.normal(k1, (B, L, E), jnp.bfloat16)
    k = jax.random.normal(k2, (B, S, E), jnp.bfloat16)
    v = jax.random.normal(k3, (B, S, E), jnp.bfloat16)
    seed = jnp.zeros((1,), jnp.int32)
    out = jax.jit(
        lambda q, k, v: fused_cross_attention(
            q, k, v, H, dropout_rate=RATE, dropout_seed=seed
        )
    )(q, k, v)
    jax.block_until_ready(out)
    return float(jnp.mean(out.astype(jnp.float32)))


def rung2_kernel_grad():
    import jax
    import jax.numpy as jnp

    from act3d_tpu.kernels.attention import fused_cross_attention

    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(0), 3)
    q = jax.random.normal(k1, (B, L, E), jnp.bfloat16)
    k = jax.random.normal(k2, (B, S, E), jnp.bfloat16)
    v = jax.random.normal(k3, (B, S, E), jnp.bfloat16)
    seed = jnp.zeros((1,), jnp.int32)

    def loss(q, k, v):
        o = fused_cross_attention(
            q, k, v, H, dropout_rate=RATE, dropout_seed=seed
        )
        return jnp.sum(o.astype(jnp.float32) ** 2)

    g = jax.jit(jax.grad(loss, argnums=(0, 1, 2)))(q, k, v)
    jax.block_until_ready(g)
    return float(jnp.mean(g[0].astype(jnp.float32)))


def rung3_stack_grad():
    import jax
    import jax.numpy as jnp

    from act3d_tpu.kernels.attention import fused_cross_attention

    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(0), 3)
    q0 = jax.random.normal(k1, (B, L, E), jnp.bfloat16)
    kk = jax.random.normal(k2, (B, S, E), jnp.bfloat16)
    v = jax.random.normal(k3, (B, S, E), jnp.bfloat16)
    seeds = jnp.arange(6, dtype=jnp.int32)

    def loss(q, k, v):
        x = q
        for i in range(6):
            x = x + fused_cross_attention(
                x, k, v, H, dropout_rate=RATE,
                dropout_seed=seeds[i:i + 1],
            )
        return jnp.sum(x.astype(jnp.float32) ** 2)

    g = jax.jit(jax.grad(loss, argnums=(0, 1, 2)))(q0, kk, v)
    jax.block_until_ready(g)
    return float(jnp.mean(g[0].astype(jnp.float32)))


def rung4_full_model():
    import jax

    from act3d_tpu.train.flagship import (
        diffusion_loss_fn, make_diffusion_model,
    )
    from act3d_tpu.utils.testing import synthetic_trajectory_batch

    import jax.numpy as jnp

    model = make_diffusion_model(image_size=(256, 256))
    data = synthetic_trajectory_batch(
        batch=B, ncam=3, image_size=(256, 256), traj_len=L
    )
    variables = model.init(
        jax.random.PRNGKey(0),
        data["trajectory"], data["trajectory_mask"], data["rgbs"],
        data["pcds"], data["instr"], data["curr_gripper"], data["action"],
        noise_rng=jax.random.PRNGKey(1),
    )
    loss_fn = diffusion_loss_fn(model, jnp.bfloat16)

    def step(p, b, key):
        (l, _), g = jax.value_and_grad(loss_fn, has_aux=True)(p, b, key)
        return l, jax.tree_util.tree_map(jnp.mean, g)

    l, _ = jax.jit(step)(
        variables["params"], data, jax.random.PRNGKey(2)
    )
    jax.block_until_ready(l)
    return float(l)


RUNGS = [rung1_kernel_fwd, rung2_kernel_grad, rung3_stack_grad,
         rung4_full_model]


def main():
    if os.environ.get("ACT3D_FUSED_DROPOUT") != "1":
        print("WARNING: ACT3D_FUSED_DROPOUT != 1 — dropout sites will "
              "route to XLA and nothing is reproduced", flush=True)
    only = os.environ.get("RUNG")
    for i, fn in enumerate(RUNGS, 1):
        if only and str(i) != only:
            continue
        if os.environ.get("RUNG_SUBPROC") == "1" and not only:
            env = dict(os.environ, RUNG=str(i))
            r = subprocess.run(
                [sys.executable, os.path.abspath(__file__)], env=env,
                timeout=3600,
            )
            print(f"rung {i}: {'OK' if r.returncode == 0 else f'FAILED rc={r.returncode}'}",
                  flush=True)
            if r.returncode != 0:
                break
            continue
        print(f"rung {i}: {fn.__name__} ...", flush=True)
        try:
            val = fn()
            print(f"rung {i}: OK ({val:.4f})", flush=True)
        except Exception:
            traceback.print_exc()
            print(f"rung {i}: FAILED", flush=True)
            raise


if __name__ == "__main__":
    main()
