"""Microbench: is the emb-60 attention stack faster at a padded width 64?

VERDICT r4 next #4: the 24.9 ms/step "attention-stack projections/FFN/LN
at emb 60" cluster was declared bounded by 128-lane padding waste, and a
padded-width variant (lanes 60→64, LayerNorm statistics masked to the 60
real lanes — exact) was proposed but never measured.  Full stack surgery
is expensive (per-head-padded resident layout + permuted rotary), so
this measures the per-op ceiling first: representative ops of that
cluster at width 60 vs the masked 64 variant, fwd+bwd, on-chip, in-jit
scanned chains (the tunnel-safe methodology from bench.py).

Theory says ~0: TPU VPU registers are (8, 128)-lane tiles and the MXU
contracts ≤128-wide in one pass, so minor-dim 60 and 64 occupy identical
hardware tiles; 64 only changes sublane alignment of *slices*, which
these ops don't do.  If the measurement agrees, the surgery is refuted
with data; if 64 wins materially, it justifies the full variant.

Usage:  python bench_lanepad.py          # prints one JSON line
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


def masked_layernorm(x, gamma, beta, n_real):
    """LayerNorm over the first n_real lanes only (exact on zero-padded
    inputs): pad lanes contribute nothing to the statistics, and
    gamma/beta pad entries of 0 re-zero them after the shift."""
    real = x[..., :n_real]
    mean = jnp.mean(real, axis=-1, keepdims=True)
    var = jnp.var(real, axis=-1, keepdims=True)
    y = (x - mean) * jax.lax.rsqrt(var + 1e-6)  # flax LayerNorm epsilon
    return y * gamma + beta


class Block60(nn.Module):
    """Representative slice of the act3d post-norm stack at width E:
    qkv-ish projection, LN, 4x FFN, LN."""

    e: int = 60

    @nn.compact
    def __call__(self, x):
        h = nn.Dense(self.e)(x)
        h = nn.LayerNorm()(x + h)
        f = nn.Dense(4 * self.e)(h)
        f = nn.gelu(f)
        f = nn.Dense(self.e)(f)
        return nn.LayerNorm()(h + f)


class Block64(nn.Module):
    """Same block at padded width 64 with masked-LN (60 real lanes)."""

    e: int = 64
    n_real: int = 60

    @nn.compact
    def __call__(self, x):
        g1 = self.param("g1", nn.initializers.ones, (self.e,))
        b1 = self.param("b1", nn.initializers.zeros, (self.e,))
        g2 = self.param("g2", nn.initializers.ones, (self.e,))
        b2 = self.param("b2", nn.initializers.zeros, (self.e,))
        h = nn.Dense(self.e)(x)
        h = masked_layernorm(x + h, g1, b1, self.n_real)
        f = nn.Dense(4 * self.e)(h)
        f = nn.gelu(f)
        f = nn.Dense(self.e)(f)
        return masked_layernorm(h + f, g2, b2, self.n_real)


def time_train(module, e, tokens=32 * 10040, chain=50, chains=5):
    """Median per-iteration ms of loss+grad over `chain`-step scans."""
    x = jnp.asarray(
        np.random.default_rng(0).normal(size=(tokens, e)), jnp.bfloat16
    )
    params = module.init(jax.random.PRNGKey(0), x)["params"]

    def loss(p, x):
        return jnp.sum(module.apply({"params": p}, x).astype(jnp.float32))

    grad = jax.value_and_grad(loss)

    def body(p, _):
        l, g = grad(p, x)
        p = jax.tree.map(lambda a, b: a - 1e-6 * b.astype(a.dtype), p, g)
        return p, l

    @jax.jit
    def run(p):
        return jax.lax.scan(body, p, None, length=chain)

    p, ls = run(params)
    float(ls[-1])  # compile + warm
    times = []
    for _ in range(chains):
        t0 = time.perf_counter()
        p, ls = run(p)
        float(ls[-1])
        times.append((time.perf_counter() - t0) / chain * 1e3)
    return float(np.median(times))

def main():
    # sanity: masked-LN at 64 == LN at 60 on the real lanes
    rng = np.random.default_rng(1)
    x60 = rng.normal(size=(128, 60)).astype(np.float32)
    x64 = np.zeros((128, 64), np.float32)
    x64[:, :60] = x60
    ref = nn.LayerNorm().apply(
        {"params": {"scale": np.ones(60, np.float32),
                    "bias": np.zeros(60, np.float32)}}, x60
    )
    g = np.zeros(64, np.float32)
    g[:60] = 1.0
    got = masked_layernorm(jnp.asarray(x64), g, np.zeros(64, np.float32), 60)
    np.testing.assert_allclose(np.asarray(got)[:, :60], ref, atol=1e-4)
    np.testing.assert_array_equal(np.asarray(got)[:, 60:], 0.0)

    ms60 = time_train(Block60(), 60)
    ms64 = time_train(Block64(), 64)
    print(json.dumps({
        "metric": "lanepad_block_ms_60_vs_64",
        "value": round(ms60, 3),
        "unit": "ms/iter",
        "vs_baseline": round(ms60 / ms64, 3),
        "width60_ms": round(ms60, 3),
        "width64_masked_ln_ms": round(ms64, 3),
        "tokens": 32 * 10040,
        "note": "fwd+bwd of a Dense+LN+FFN block; >1 means 64 is faster",
    }))


if __name__ == "__main__":
    main()
