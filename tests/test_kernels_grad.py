"""Gradient correctness of the fused attention custom VJP vs the jnp path."""

import numpy as np

import jax
import jax.numpy as jnp

from act3d_tpu.kernels import attention as kmod


def test_attention_core_vjp_matches_reference(rng):
    bh, l, s, d = 2, 24, 40, 16
    q = jnp.asarray(rng.normal(size=(bh, l, d)).astype(np.float32)) * 0.3
    k = jnp.asarray(rng.normal(size=(bh, s, d)).astype(np.float32)) * 0.3
    v = jnp.asarray(rng.normal(size=(bh, s, d)).astype(np.float32))
    mask = np.zeros((bh, s), bool)
    mask[0, -7:] = True
    mask = jnp.asarray(mask)

    def ref(q, k, v):
        scores = jnp.einsum("bld,bsd->bls", q, k)
        scores = jnp.where(mask[:, None, :], -1e30, scores)
        w = jax.nn.softmax(scores, axis=-1)
        return jnp.einsum("bls,bsd->bld", w, v)

    def fused(q, k, v):
        return kmod.attention_core(q, k, v, mask, l_tile=24, interpret=True)

    g = jnp.asarray(rng.normal(size=(bh, l, d)).astype(np.float32))

    loss_ref = lambda q, k, v: jnp.sum(ref(q, k, v) * g)
    loss_fused = lambda q, k, v: jnp.sum(fused(q, k, v) * g)

    grads_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    grads_fused = jax.grad(loss_fused, argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(grads_fused, grads_ref, "qkv"):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-5, rtol=1e-4,
            err_msg=f"d{name}",
        )


def test_attention_core_vjp_no_mask(rng):
    bh, l, s, d = 2, 16, 20, 8
    q = jnp.asarray(rng.normal(size=(bh, l, d)).astype(np.float32)) * 0.3
    k = jnp.asarray(rng.normal(size=(bh, s, d)).astype(np.float32)) * 0.3
    v = jnp.asarray(rng.normal(size=(bh, s, d)).astype(np.float32))

    def ref(q, k, v):
        w = jax.nn.softmax(jnp.einsum("bld,bsd->bls", q, k), axis=-1)
        return jnp.einsum("bls,bsd->bld", w, v)

    def fused(q, k, v):
        return kmod.attention_core(q, k, v, None, l_tile=16, interpret=True)

    grads_ref = jax.grad(lambda *a: jnp.sum(ref(*a) ** 2), argnums=(0, 1, 2))(
        q, k, v
    )
    grads_fused = jax.grad(
        lambda *a: jnp.sum(fused(*a) ** 2), argnums=(0, 1, 2)
    )(q, k, v)
    for a, b in zip(grads_fused, grads_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)
