"""A/B micro-benchmark: gather_tokens backward formulations on TPU.

Compares, at Act3D training shapes (BENCH_NOTES round-2 trace: the
fine-context gather adjoint is the largest remaining step cost):

  slot    — int32 slot scatter + dense row gather (round-1 custom VJP)
  onehot  — Pallas one-hot x MXU kernel (kernels/gather.py)

for each fine pyramid level, plus a full-gradient correctness check.

    BENCH_BATCH=32 python bench_gather.py
"""

from __future__ import annotations

import os
import time

import numpy as np

import jax
import jax.numpy as jnp


def timeit(fn, *args, reps=30):
    float(fn(*args))
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(fn(*args))
        times.append(time.perf_counter() - t0)
    return float(np.median(times))


def main():
    from act3d_tpu.core.cache import enable_compilation_cache
    from act3d_tpu.ops import geometry as geo

    enable_compilation_cache()

    b = int(os.environ.get("BENCH_BATCH", "32"))
    c = 60
    k = 32 * 32 * 3
    rng = np.random.default_rng(0)

    for p in (12288, 49152):  # 3-cam pyramid levels 1 and 2 at 256^2
        x = jnp.asarray(rng.normal(size=(b, p, c)), jnp.bfloat16)
        idx = jnp.asarray(
            np.stack([np.sort(rng.permutation(p)[:k]) for _ in range(b)])
        ).astype(jnp.int32)

        # NB: the env var is read at trace time inside the custom VJP;
        # each jax.jit below is a fresh callable so it traces under the
        # setting in effect at its first call.

        # correctness at real shapes on the real backend
        os.environ["ACT3D_ONEHOT_GATHER_BWD"] = "0"
        f = lambda x: jnp.sum(jnp.square(geo.gather_tokens(x, idx)))
        want = jax.jit(jax.grad(f))(x)
        os.environ["ACT3D_ONEHOT_GATHER_BWD"] = "1"
        got = jax.jit(jax.grad(f))(x)
        np.testing.assert_array_equal(
            np.asarray(want, np.float32), np.asarray(got, np.float32)
        )

        # windowed (sorted-index) kernel correctness at real shapes
        fs = lambda x: jnp.sum(
            jnp.square(geo.gather_tokens(x, idx, sorted_indices=True))
        )
        got_w = jax.jit(jax.grad(fs))(x)
        np.testing.assert_array_equal(
            np.asarray(want, np.float32), np.asarray(got_w, np.float32)
        )

        if os.environ.get("BENCH_GATHER_ADJOINT_ONLY", "0") != "1":
            os.environ["ACT3D_ONEHOT_GATHER_BWD"] = "0"
            t_slot = timeit(jax.jit(lambda x: jnp.sum(
                jax.grad(f)(x).astype(jnp.float32))), x)
            os.environ["ACT3D_ONEHOT_GATHER_BWD"] = "1"
            t_onehot = timeit(jax.jit(lambda x: jnp.sum(
                jax.grad(f)(x).astype(jnp.float32))), x)
            t_win = timeit(jax.jit(lambda x: jnp.sum(
                jax.grad(fs)(x).astype(jnp.float32))), x)
            print(
                f"P={p:6d} B={b} K={k} C={c}: "
                f"slot {t_slot * 1e3:7.2f} ms | onehot {t_onehot * 1e3:7.2f} ms "
                f"({t_slot / t_onehot:4.2f}x) | windowed {t_win * 1e3:7.2f} ms "
                f"({t_onehot / t_win:4.2f}x vs onehot)  [grad fwd+bwd incl. readback]"
            )

        # chunked in-kernel-loop variant, standalone adjoint A/B
        from act3d_tpu.kernels import gather as gk

        gct = jnp.asarray(rng.normal(size=(b, k, c)), jnp.bfloat16)
        want_adj = np.asarray(
            jax.jit(lambda g, i: gk.onehot_scatter_rows_sorted(g, i, p))(
                gct, idx
            ), np.float32,
        )
        for p_tile, n_chunks in ((256, 4), (512, 4), (256, 8)):
            got_adj = np.asarray(jax.jit(
                lambda g, i, pt=p_tile, nc=n_chunks:
                gk.onehot_scatter_rows_chunked(g, i, p, p_tile=pt, n_chunks=nc)
            )(gct, idx), np.float32)
            np.testing.assert_array_equal(want_adj, got_adj)
            t_chunk = timeit(
                jax.jit(lambda g, i, pt=p_tile, nc=n_chunks: jnp.sum(
                    gk.onehot_scatter_rows_chunked(
                        g, i, p, p_tile=pt, n_chunks=nc
                    ).astype(jnp.float32))), gct, idx)
            t_wins = timeit(
                jax.jit(lambda g, i: jnp.sum(gk.onehot_scatter_rows_sorted(
                    g, i, p
                ).astype(jnp.float32))), gct, idx)
            print(
                f"    adjoint-only: windowed {t_wins * 1e3:7.2f} ms | "
                f"chunked(pt={p_tile},nc={n_chunks}) {t_chunk * 1e3:7.2f} ms"
            )


if __name__ == "__main__":
    main()
