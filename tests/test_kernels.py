"""Pallas fused-attention kernel vs the jnp reference path.

On CPU the kernel runs in interpreter mode; the compiled path is exercised
by bench/TPU runs.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from act3d_tpu.kernels.attention import attention_core, fused_cross_attention


def _reference(qh, kh, vh, mask=None):
    scores = jnp.einsum("bld,bsd->bls", qh, kh)
    if mask is not None:
        scores = jnp.where(mask[:, None, :], -jnp.inf, scores)
    w = jax.nn.softmax(scores, axis=-1)
    return jnp.einsum("bls,bsd->bld", w, vh)


@pytest.mark.parametrize("l,s,d", [(64, 96, 16), (100, 57, 15), (512, 300, 8)])
def test_attention_core_matches_reference(rng, l, s, d):
    bh = 4
    q = jnp.asarray(rng.normal(size=(bh, l, d)).astype(np.float32)) * d**-0.5
    k = jnp.asarray(rng.normal(size=(bh, s, d)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(bh, s, d)).astype(np.float32))
    got = attention_core(q, k, v, l_tile=64, interpret=True)
    want = _reference(q, k, v)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_attention_core_with_mask(rng):
    bh, l, s, d = 2, 32, 40, 16
    q = jnp.asarray(rng.normal(size=(bh, l, d)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(bh, s, d)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(bh, s, d)).astype(np.float32))
    mask = np.zeros((bh, s), bool)
    mask[0, -10:] = True
    mask[1, :5] = True
    got = attention_core(
        q, k, v, jnp.asarray(mask), l_tile=32, interpret=True
    )
    want = _reference(q, k, v, jnp.asarray(mask))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


@pytest.mark.parametrize("p,k,c,p_tile", [(200, 17, 60, 64), (512, 64, 8, 128)])
def test_onehot_scatter_rows_matches_jnp_adjoint(rng, p, k, c, p_tile):
    """The Pallas one-hot×MXU gather adjoint equals the slot-map jnp
    formulation (and both equal an explicit scatter) for unique indices,
    including a P that needs tile padding."""
    from act3d_tpu.kernels.gather import onehot_scatter_rows

    b = 3
    g = jnp.asarray(rng.normal(size=(b, k, c)).astype(np.float32))
    idx = np.stack(
        [rng.permutation(p)[:k].astype(np.int32) for _ in range(b)]
    )
    want = np.zeros((b, p, c), np.float32)
    for bi in range(b):
        want[bi, idx[bi]] = np.asarray(g[bi])
    got = onehot_scatter_rows(
        g, jnp.asarray(idx), p, p_tile=p_tile, interpret=True
    )
    np.testing.assert_allclose(np.asarray(got), want, atol=0)


@pytest.mark.parametrize("pattern", ["uniform", "clustered", "edges"])
def test_onehot_scatter_rows_sorted_matches_scatter(rng, pattern):
    """The windowed (sorted-index) adjoint equals an explicit scatter for
    uniform, spatially-clustered (the Act3D case: top-k *nearest* indices
    concentrate), and K-edge-hugging index layouts.  P/K/p_tile chosen so
    K has several j-blocks and the searchsorted windows actually move."""
    from act3d_tpu.kernels.gather import onehot_scatter_rows_sorted

    b, p, k, c, p_tile = 2, 1024, 256, 12, 64
    g = jnp.asarray(rng.normal(size=(b, k, c)).astype(np.float32))
    if pattern == "uniform":
        idx = np.stack([np.sort(rng.permutation(p)[:k]) for _ in range(b)])
    elif pattern == "clustered":
        # all picks inside two tight spans — many tiles empty, two dense
        lo = np.sort(rng.permutation(160)[:128])
        hi = np.sort(rng.permutation(160)[:128]) + p - 160
        idx = np.stack([np.concatenate([lo, hi]) for _ in range(b)])
    else:  # edges: first and last possible positions
        idx = np.stack(
            [np.concatenate([np.arange(k // 2), p - k + k // 2 + np.arange(k - k // 2)])
             for _ in range(b)]
        )
    idx = idx.astype(np.int32)
    want = np.zeros((b, p, c), np.float32)
    for bi in range(b):
        want[bi, idx[bi]] = np.asarray(g[bi])
    got = onehot_scatter_rows_sorted(
        g, jnp.asarray(idx), p, p_tile=p_tile, interpret=True
    )
    np.testing.assert_allclose(np.asarray(got), want, atol=0)


@pytest.mark.parametrize("pattern", ["uniform", "clustered", "edges"])
def test_onehot_scatter_rows_chunked_matches_scatter(rng, pattern):
    """The chunked (in-kernel tile loop) sorted adjoint equals an explicit
    scatter for the same adversarial index layouts."""
    from act3d_tpu.kernels.gather import onehot_scatter_rows_chunked

    b, p, k, c, p_tile = 2, 2048, 256, 12, 128
    g = jnp.asarray(rng.normal(size=(b, k, c)).astype(np.float32))
    if pattern == "uniform":
        idx = np.stack([np.sort(rng.permutation(p)[:k]) for _ in range(b)])
    elif pattern == "clustered":
        lo = np.sort(rng.permutation(160)[:128])
        hi = np.sort(rng.permutation(160)[:128]) + p - 160
        idx = np.stack([np.concatenate([lo, hi]) for _ in range(b)])
    else:
        idx = np.stack(
            [np.concatenate([np.arange(k // 2),
                             p - k + k // 2 + np.arange(k - k // 2)])
             for _ in range(b)]
        )
    idx = idx.astype(np.int32)
    want = np.zeros((b, p, c), np.float32)
    for bi in range(b):
        want[bi, idx[bi]] = np.asarray(g[bi])
    got = onehot_scatter_rows_chunked(
        g, jnp.asarray(idx), p, p_tile=p_tile, n_chunks=4, interpret=True
    )
    np.testing.assert_allclose(np.asarray(got), want, atol=0)


def test_onehot_scatter_rows_sorted_fallback_small_k(rng):
    """K below two j-blocks falls back to the full-K kernel."""
    from act3d_tpu.kernels.gather import onehot_scatter_rows_sorted

    b, p, k, c, p_tile = 2, 300, 40, 8, 128
    g = jnp.asarray(rng.normal(size=(b, k, c)).astype(np.float32))
    idx = np.stack(
        [np.sort(rng.permutation(p)[:k]).astype(np.int32) for _ in range(b)]
    )
    want = np.zeros((b, p, c), np.float32)
    for bi in range(b):
        want[bi, idx[bi]] = np.asarray(g[bi])
    got = onehot_scatter_rows_sorted(
        g, jnp.asarray(idx), p, p_tile=p_tile, interpret=True
    )
    np.testing.assert_allclose(np.asarray(got), want, atol=0)


def test_gather_tokens_sorted_grad_matches_default(rng, monkeypatch):
    """gather_tokens(sorted_indices=True) has an identical VJP through the
    windowed kernel and the slot-map path."""
    from act3d_tpu.ops import geometry as geo

    b, p, c, k = 2, 512, 24, 128
    x = jnp.asarray(rng.normal(size=(b, p, c)).astype(np.float32))
    idx = jnp.asarray(
        np.stack([np.sort(rng.permutation(p)[:k]).astype(np.int32)
                  for _ in range(b)])
    )
    f = lambda x: jnp.sum(
        jnp.sin(geo.gather_tokens(x, idx, sorted_indices=True))
    )

    monkeypatch.setenv("ACT3D_ONEHOT_GATHER_BWD", "0")
    want = jax.grad(f)(x)
    import act3d_tpu.kernels.gather as gmod

    orig = gmod.onehot_scatter_rows_sorted
    monkeypatch.setattr(
        gmod, "onehot_scatter_rows_sorted",
        lambda *a, **kw: orig(*a, **{**kw, "interpret": True, "p_tile": 64}),
    )
    monkeypatch.setenv("ACT3D_ONEHOT_GATHER_BWD", "1")
    got = jax.grad(f)(x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=0)


def test_gather_tokens_grad_onehot_path_matches_default(rng, monkeypatch):
    """gather_tokens' VJP is identical through both backward formulations."""
    from act3d_tpu.ops import geometry as geo

    b, p, c, k = 2, 96, 24, 16
    x = jnp.asarray(rng.normal(size=(b, p, c)).astype(np.float32))
    idx = jnp.asarray(
        np.stack([np.sort(rng.permutation(p)[:k]).astype(np.int32)
                  for _ in range(b)])
    )
    f = lambda x: jnp.sum(jnp.sin(geo.gather_tokens(x, idx)))

    monkeypatch.setenv("ACT3D_ONEHOT_GATHER_BWD", "0")
    want = jax.grad(f)(x)
    # interpret-mode kernel on CPU
    import act3d_tpu.kernels.gather as gmod

    orig = gmod.onehot_scatter_rows
    monkeypatch.setattr(
        gmod, "onehot_scatter_rows",
        lambda *a, **kw: orig(*a, **{**kw, "interpret": True}),
    )
    monkeypatch.setenv("ACT3D_ONEHOT_GATHER_BWD", "1")
    got = jax.grad(f)(x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=0)


def test_fused_multi_head_wrapper_matches_jnp_path(rng):
    from act3d_tpu.ops.attention import AttentionParams, multi_head_attention
    from act3d_tpu.ops import attention as attn_mod

    E, H, B, L, S = 32, 4, 2, 50, 70
    mk = lambda *shape: rng.normal(size=shape).astype(np.float32) * 0.1
    params = AttentionParams(
        wq=jnp.asarray(mk(E, E)), wk=jnp.asarray(mk(E, E)),
        wv=jnp.asarray(mk(E, E)), wo=jnp.asarray(mk(E, E)),
        bq=jnp.asarray(mk(E)), bk=jnp.asarray(mk(E)),
        bv=jnp.asarray(mk(E)), bo=jnp.asarray(mk(E)),
    )
    q = jnp.asarray(mk(B, L, E) * 10)
    kv = jnp.asarray(mk(B, S, E) * 10)

    want = multi_head_attention(params, q, kv, kv, H)

    # interpret-mode fused path (kernels are compiled only on TPU)
    import act3d_tpu.kernels.attention as kmod

    orig = kmod.fused_cross_attention
    kmod.fused_cross_attention = lambda *a, **k: orig(
        *a, **{**k, "interpret": True}
    )
    min_rows = attn_mod._MIN_FUSED_ROWS
    min_s = attn_mod._MIN_FUSED_S
    try:
        attn_mod.use_fused_attention(True)
        # the production routing floors (B*L >= 1024, S >= 128) would
        # route this small test shape to XLA; drop them so the kernel
        # path is what we test
        attn_mod._MIN_FUSED_ROWS = 0
        attn_mod._MIN_FUSED_S = 0
        got = multi_head_attention(params, q, kv, kv, H)
    finally:
        attn_mod.use_fused_attention(False)
        attn_mod._MIN_FUSED_ROWS = min_rows
        attn_mod._MIN_FUSED_S = min_s
        kmod.fused_cross_attention = orig
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), atol=3e-5, rtol=1e-4
    )


@pytest.mark.parametrize(
    "b,l,s,expect_fused",
    [
        (32, 333, 3127, True),   # act3d ghost cross-attn: fused
        (32, 3073, 53, False),   # act3d instruction cross: small S -> XLA
        (1, 50, 3074, False),    # batch-1 sampler step: row floor -> XLA
        (22, 50, 3074, True),    # diffusion train cross (no dropout): fused
    ],
)
def test_fused_attention_routing_floors(rng, b, l, s, expect_fused):
    """The eligibility floors route production shapes as measured in
    BENCH_NOTES round 3 (rows >= 1024, 128 <= S <= 8192)."""
    from act3d_tpu.ops.attention import AttentionParams, multi_head_attention
    from act3d_tpu.ops import attention as attn_mod
    import act3d_tpu.kernels.attention as kmod

    E, H = 12, 4
    mk = lambda *shape: rng.normal(size=shape).astype(np.float32) * 0.1
    params = AttentionParams(
        wq=jnp.asarray(mk(E, E)), wk=jnp.asarray(mk(E, E)),
        wv=jnp.asarray(mk(E, E)), wo=jnp.asarray(mk(E, E)),
    )
    q = jnp.asarray(mk(b, l, E))
    kv = jnp.asarray(mk(b, s, E))

    calls = []
    orig = kmod.fused_cross_attention
    kmod.fused_cross_attention = (
        lambda q, k, v, h, **kw: calls.append(1) or jnp.zeros_like(q)
    )
    try:
        attn_mod.use_fused_attention(True)
        multi_head_attention(params, q, kv, kv, H)
    finally:
        attn_mod.use_fused_attention(False)
        kmod.fused_cross_attention = orig
    assert bool(calls) == expect_fused


def test_fused_padded_projection_path_matches_jnp(rng, monkeypatch):
    """Odd head dims + rotary: the pre-padded projection path (head-dim
    lane padding folded into wq/wk/wv as zero columns, rotary applied in
    the padded layout via the re-indexed pair_rotation_matrix) must match
    the XLA path exactly in values and in every parameter gradient.

    The fold ships default-OFF (production-scale compile failure, see
    ops/attention.py) — pin it ON here so the path stays covered."""
    monkeypatch.setenv("ACT3D_FOLD_HEADPAD", "1")
    from act3d_tpu.ops.attention import AttentionParams, multi_head_attention
    from act3d_tpu.ops import attention as attn_mod
    from act3d_tpu.ops.rotary import rotary_pe_3d
    import act3d_tpu.kernels.attention as kmod

    E, H, B, L, S = 60, 4, 2, 40, 72  # d = 15: padding active
    mk = lambda *shape: rng.normal(size=shape).astype(np.float32) * 0.1
    params = AttentionParams(
        wq=jnp.asarray(mk(E, E)), wk=jnp.asarray(mk(E, E)),
        wv=jnp.asarray(mk(E, E)), wo=jnp.asarray(mk(E, E)),
        bq=jnp.asarray(mk(E)), bk=jnp.asarray(mk(E)),
        bv=jnp.asarray(mk(E)), bo=jnp.asarray(mk(E)),
    )
    q = jnp.asarray(mk(B, L, E) * 10)
    kv = jnp.asarray(mk(B, S, E) * 10)
    q_pe = rotary_pe_3d(jnp.asarray(mk(B, L, 3)), E)
    k_pe = rotary_pe_3d(jnp.asarray(mk(B, S, 3)), E)

    def loss(p):
        out = multi_head_attention(
            p, q, kv, kv, H, q_pe=q_pe, k_pe=k_pe
        )
        return jnp.sum(out**2)

    want, want_grads = jax.value_and_grad(loss)(params)

    orig = kmod.fused_cross_attention
    kmod.fused_cross_attention = lambda *a, **k: orig(
        *a, **{**k, "interpret": True}
    )
    min_rows, min_s = attn_mod._MIN_FUSED_ROWS, attn_mod._MIN_FUSED_S
    try:
        attn_mod.use_fused_attention(True)
        attn_mod._MIN_FUSED_ROWS = 0
        attn_mod._MIN_FUSED_S = 0
        got, got_grads = jax.value_and_grad(loss)(params)
    finally:
        attn_mod.use_fused_attention(False)
        attn_mod._MIN_FUSED_ROWS = min_rows
        attn_mod._MIN_FUSED_S = min_s
        kmod.fused_cross_attention = orig

    np.testing.assert_allclose(float(got), float(want), rtol=1e-5)
    for name in AttentionParams._fields:
        a, b = getattr(got_grads, name), getattr(want_grads, name)
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=5e-4, rtol=1e-3,
            err_msg=f"grad mismatch for {name}",
        )
