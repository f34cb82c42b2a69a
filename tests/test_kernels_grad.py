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


# ------------------------------------------------------------------
# New multi-head kernel (fused_mha): fwd + Pallas bwd vs jnp reference
# ------------------------------------------------------------------
def _mha_ref(q, k, v, heads, mask=None):
    b, l, e = q.shape
    d = e // heads
    split = lambda x: x.reshape(b, -1, heads, d).transpose(0, 2, 1, 3)
    qh, kh, vh = split(q), split(k), split(v)
    s = jnp.einsum("bhld,bhsd->bhls", qh, kh)
    if mask is not None:
        s = jnp.where(mask[:, None, None, :], -1e30, s)
    w = jax.nn.softmax(s, axis=-1)
    o = jnp.einsum("bhls,bhsd->bhld", w, vh)
    return o.transpose(0, 2, 1, 3).reshape(b, l, e)


def test_fused_mha_fwd_matches_reference(rng):
    b, l, s, heads, e = 2, 37, 61, 4, 60  # d = 15 (act3d head size)
    q = jnp.asarray(rng.normal(size=(b, l, e)).astype(np.float32)) * 0.3
    k = jnp.asarray(rng.normal(size=(b, s, e)).astype(np.float32)) * 0.3
    v = jnp.asarray(rng.normal(size=(b, s, e)).astype(np.float32))
    got = kmod.fused_mha(q, k, v, heads, None, 512, True)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(_mha_ref(q, k, v, heads)),
        atol=2e-5, rtol=1e-4,
    )


def test_fused_mha_fwd_masked(rng):
    b, l, s, heads, e = 2, 16, 33, 8, 120  # diffusion head size
    q = jnp.asarray(rng.normal(size=(b, l, e)).astype(np.float32)) * 0.3
    k = jnp.asarray(rng.normal(size=(b, s, e)).astype(np.float32)) * 0.3
    v = jnp.asarray(rng.normal(size=(b, s, e)).astype(np.float32))
    mask = np.zeros((b, s), bool)
    mask[0, -9:] = True
    mask[1, :4] = True
    mask = jnp.asarray(mask)
    got = kmod.fused_mha(q, k, v, heads, mask, 512, True)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(_mha_ref(q, k, v, heads, mask)),
        atol=2e-5, rtol=1e-4,
    )


def test_fused_mha_bwd_matches_reference(rng):
    b, l, s, heads, e = 2, 21, 45, 4, 60
    q = jnp.asarray(rng.normal(size=(b, l, e)).astype(np.float32)) * 0.3
    k = jnp.asarray(rng.normal(size=(b, s, e)).astype(np.float32)) * 0.3
    v = jnp.asarray(rng.normal(size=(b, s, e)).astype(np.float32))
    mask = np.zeros((b, s), bool)
    mask[1, -11:] = True
    mask = jnp.asarray(mask)

    g_ref = jax.grad(
        lambda *a: jnp.sum(_mha_ref(*a, heads, mask) ** 2), argnums=(0, 1, 2)
    )(q, k, v)
    g_fused = jax.grad(
        lambda *a: jnp.sum(kmod.fused_mha(*a, heads, mask, 512, True) ** 2),
        argnums=(0, 1, 2),
    )(q, k, v)
    for a, b_, name in zip(g_fused, g_ref, "qkv"):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b_), atol=3e-5, rtol=1e-4,
            err_msg=f"d{name}",
        )


def test_fused_mha_bwd_large_s_fallback(rng):
    """S beyond the VMEM budget routes through the jnp fallback VJP."""
    b, l, s, heads, e = 1, 16, kmod._MAX_BWD_S + 64, 2, 8
    q = jnp.asarray(rng.normal(size=(b, l, e)).astype(np.float32)) * 0.1
    k = jnp.asarray(rng.normal(size=(b, s, e)).astype(np.float32)) * 0.1
    v = jnp.asarray(rng.normal(size=(b, s, e)).astype(np.float32))
    g_ref = jax.grad(
        lambda *a: jnp.sum(_mha_ref(*a, heads) ** 2), argnums=(0, 1, 2)
    )(q, k, v)
    g_fused = jax.grad(
        lambda *a: jnp.sum(kmod.fused_mha(*a, heads, None, 512, True) ** 2),
        argnums=(0, 1, 2),
    )(q, k, v)
    for a, b_, name in zip(g_fused, g_ref, "qkv"):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b_), atol=3e-5, rtol=1e-4,
            err_msg=f"d{name}",
        )


def test_fused_mha_bwd_multi_ltile(rng):
    """L spanning several backward tiles exercises the dk/dv accumulator."""
    b, l, s, heads, e = 1, kmod._BWD_L_TILE + 40, 64, 4, 32
    q = jnp.asarray(rng.normal(size=(b, l, e)).astype(np.float32)) * 0.2
    k = jnp.asarray(rng.normal(size=(b, s, e)).astype(np.float32)) * 0.2
    v = jnp.asarray(rng.normal(size=(b, s, e)).astype(np.float32))
    g_ref = jax.grad(
        lambda *a: jnp.sum(_mha_ref(*a, heads) ** 2), argnums=(0, 1, 2)
    )(q, k, v)
    g_fused = jax.grad(
        lambda *a: jnp.sum(kmod.fused_mha(*a, heads, None, 512, True) ** 2),
        argnums=(0, 1, 2),
    )(q, k, v)
    for a, b_, name in zip(g_fused, g_ref, "qkv"):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b_), atol=3e-5, rtol=1e-4,
            err_msg=f"d{name}",
        )


def test_fused_cross_attention_head_pad_exact(rng):
    """The d=15 -> 16 lane-padding wrapper (fused_cross_attention) is
    numerically exact: zero pad lanes add nothing to qk dots, get zero
    attention output, and carry zero gradient."""
    b, l, s, heads, e = 2, 21, 45, 4, 60  # d = 15 triggers the pad path
    assert kmod._head_pad_enabled(e // heads)
    q = jnp.asarray(rng.normal(size=(b, l, e)).astype(np.float32)) * 0.3
    k = jnp.asarray(rng.normal(size=(b, s, e)).astype(np.float32)) * 0.3
    v = jnp.asarray(rng.normal(size=(b, s, e)).astype(np.float32))
    got = kmod.fused_cross_attention(q, k, v, heads, interpret=True)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(_mha_ref(q, k, v, heads)),
        atol=2e-5, rtol=1e-4,
    )
    g_ref = jax.grad(
        lambda *a: jnp.sum(_mha_ref(*a, heads) ** 2), argnums=(0, 1, 2)
    )(q, k, v)
    g_pad = jax.grad(
        lambda *a: jnp.sum(
            kmod.fused_cross_attention(*a, heads, interpret=True) ** 2
        ),
        argnums=(0, 1, 2),
    )(q, k, v)
    for a, b_, name in zip(g_pad, g_ref, "qkv"):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b_), atol=3e-5, rtol=1e-4,
            err_msg=f"d{name}",
        )


def test_fused_keep_padded_folded_projection_exact(rng):
    """keep_padded + zero-row-expanded output weight == slice + matmul.

    ops/attention.py folds the per-head un-pad slice into the output
    projection (the slice can't fuse into the matmul; the weight pad
    can).  Values AND weight/input gradients must match the slice path
    exactly up to float addition order.
    """
    b, l, s, heads, e = 2, 21, 45, 4, 60  # d = 15 -> dp = 16
    d, dp = e // heads, 16
    q = jnp.asarray(rng.normal(size=(b, l, e)).astype(np.float32)) * 0.3
    k = jnp.asarray(rng.normal(size=(b, s, e)).astype(np.float32)) * 0.3
    v = jnp.asarray(rng.normal(size=(b, s, e)).astype(np.float32))
    wo = jnp.asarray(rng.normal(size=(e, e)).astype(np.float32)) * 0.1

    def sliced(q, k, v, wo):
        out = kmod.fused_cross_attention(q, k, v, heads, interpret=True)
        return jnp.einsum("ble,ef->blf", out, wo)

    def folded(q, k, v, wo):
        out = kmod.fused_cross_attention(
            q, k, v, heads, interpret=True, keep_padded=True
        )
        assert out.shape[-1] == heads * dp
        wo_x = jnp.pad(
            wo.reshape(heads, d, e), ((0, 0), (0, dp - d), (0, 0))
        ).reshape(heads * dp, e)
        return jnp.einsum("ble,ef->blf", out, wo_x)

    np.testing.assert_allclose(
        np.asarray(folded(q, k, v, wo)), np.asarray(sliced(q, k, v, wo)),
        atol=2e-5, rtol=1e-4,
    )
    g_fold = jax.grad(
        lambda *a: jnp.sum(folded(*a) ** 2), argnums=(0, 1, 2, 3)
    )(q, k, v, wo)
    g_slice = jax.grad(
        lambda *a: jnp.sum(sliced(*a) ** 2), argnums=(0, 1, 2, 3)
    )(q, k, v, wo)
    for a, b_, name in zip(g_fold, g_slice, ("dq", "dk", "dv", "dwo")):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b_), atol=3e-5, rtol=1e-4,
            err_msg=name,
        )


# ---------------------------------------------------------------------------
# In-kernel attention-weight dropout (VERDICT r2 #6).  On CPU the pallas
# TPU PRNG has no lowering, so interpret mode uses a jnp emulation with
# the same seeding discipline and dropout math as the kernel body; the
# real PRNG path is validated on TPU (test_kernels_tpu.py + bench A/B).
# ---------------------------------------------------------------------------


def _dropout_fused(q, k, v, heads, rate, seed, mask=None):
    return kmod.fused_mha(
        q, k, v, heads, mask, 512, True, rate, jnp.asarray([seed], jnp.int32)
    )


def test_fused_dropout_keep_fraction_and_scaling(rng):
    # v = identity (S == E) makes the output exactly the post-dropout
    # weight matrix: zeros where dropped, p/(1-rate) where kept
    b, heads, l, s = 2, 2, 48, 64
    e = s
    q = jnp.asarray(rng.normal(size=(b, l, e)).astype(np.float32)) * 0.2
    k = jnp.asarray(rng.normal(size=(b, s, e)).astype(np.float32)) * 0.2
    rate = 0.3

    # per-head identity values: head h of the output row reproduces the
    # head-h weights only if v's head slice is identity — use heads=1 for
    # an exact readout
    heads = 1
    v = jnp.broadcast_to(jnp.eye(s, e, dtype=jnp.float32), (b, s, e))

    base = kmod.fused_mha(q, k, v, heads, None, 512, True)  # no dropout = p
    dropped = _dropout_fused(q, k, v, heads, rate, seed=5)

    p = np.asarray(base)
    pd = np.asarray(dropped)
    zeros = pd == 0.0
    frac = zeros.mean()
    assert abs(frac - rate) < 0.02, frac  # keep fraction ~ 1-rate
    nz = ~zeros
    np.testing.assert_allclose(
        pd[nz], p[nz] / (1.0 - rate), rtol=1e-5
    )  # kept weights are scaled


def test_fused_dropout_deterministic_per_seed(rng):
    b, heads, l, s, e = 2, 4, 32, 40, 32
    q = jnp.asarray(rng.normal(size=(b, l, e)).astype(np.float32)) * 0.2
    k = jnp.asarray(rng.normal(size=(b, s, e)).astype(np.float32)) * 0.2
    v = jnp.asarray(rng.normal(size=(b, s, e)).astype(np.float32))
    a1 = _dropout_fused(q, k, v, heads, 0.1, seed=3)
    a2 = _dropout_fused(q, k, v, heads, 0.1, seed=3)
    a3 = _dropout_fused(q, k, v, heads, 0.1, seed=4)
    np.testing.assert_array_equal(np.asarray(a1), np.asarray(a2))
    assert not np.array_equal(np.asarray(a1), np.asarray(a3))


def test_fused_dropout_grads_consistent_with_forward_mask(rng):
    """dv must come from the SAME mask the forward used: out is linear in
    v given the mask, so <dv, v> == <g, out> exactly; dq/dk are checked
    by directional finite differences (the mask is seed-fixed, so f is
    differentiable)."""
    b, heads, l, s, e = 2, 2, 24, 30, 16
    rate, seed = 0.25, 11
    q = jnp.asarray(rng.normal(size=(b, l, e)).astype(np.float32)) * 0.3
    k = jnp.asarray(rng.normal(size=(b, s, e)).astype(np.float32)) * 0.3
    v = jnp.asarray(rng.normal(size=(b, s, e)).astype(np.float32))
    mask = np.zeros((b, s), bool)
    mask[0, -5:] = True
    mask = jnp.asarray(mask)
    g = jnp.asarray(rng.normal(size=(b, l, e)).astype(np.float32))

    def f(q, k, v):
        return _dropout_fused(q, k, v, heads, rate, seed, mask)

    out, vjp = jax.vjp(f, q, k, v)
    dq, dk, dv = vjp(g)

    # linearity identity in v (exact up to fp)
    lhs = float(jnp.sum(dv * v))
    rhs = float(jnp.sum(g * out))
    np.testing.assert_allclose(lhs, rhs, rtol=1e-5)

    # directional finite differences for dq and dk
    for arg, grad, name in ((q, dq, "q"), (k, dk, "k")):
        u = jnp.asarray(
            rng.normal(size=arg.shape).astype(np.float32)
        )
        eps = 1e-3

        def at(x):
            args = {"q": (x, k, v), "k": (q, x, v)}[name]
            return float(jnp.sum(f(*args) * g))

        fd = (at(arg + eps * u) - at(arg - eps * u)) / (2 * eps)
        an = float(jnp.sum(grad * u))
        np.testing.assert_allclose(an, fd, rtol=5e-3, err_msg=name)
