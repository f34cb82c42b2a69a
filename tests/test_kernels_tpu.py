"""Real-hardware checks of the Pallas kernels (auto-skip off-TPU).

The CPU suite exercises the kernels in interpret mode; the in-kernel TPU
PRNG (attention-weight dropout) has no CPU lowering, so its compiled path
is validated here.  Run manually on the TPU VM:

    python -m pytest tests/test_kernels_tpu.py -q --no-header -p no:cacheprovider
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

pytestmark = pytest.mark.skipif(
    jax.default_backend() != "tpu", reason="needs a real TPU backend"
)


def test_fused_dropout_on_tpu(rng):
    from act3d_tpu.kernels import attention as kmod

    b, l, s, e = 2, 256, 320, 64
    q = jnp.asarray(rng.normal(size=(b, l, e)).astype(np.float32)) * 0.2
    k = jnp.asarray(rng.normal(size=(b, s, e)).astype(np.float32)) * 0.2
    rate = 0.3
    heads = 1
    v = jnp.broadcast_to(jnp.eye(s, e, dtype=jnp.float32), (b, s, e))
    seed = jnp.asarray([9], jnp.int32)

    base = np.asarray(kmod.fused_mha(q, k, v, heads))
    pd = np.asarray(kmod.fused_mha(q, k, v, heads, None, 512, False, rate, seed))
    # v = I(s, e) reads out the first e columns of the dropped weights.
    # rtol 1e-2: the TPU's default matmul precision truncates f32 operands
    # to bf16 passes, and the two paths quantise different values
    # (p vs p/(1-rate)) through the MXU.
    zeros = pd == 0.0
    assert abs(zeros.mean() - rate) < 0.02, zeros.mean()
    nz = ~zeros
    np.testing.assert_allclose(pd[nz], base[nz] / (1.0 - rate), rtol=1e-2)

    # determinism per seed on the compiled PRNG
    pd2 = np.asarray(kmod.fused_mha(q, k, v, heads, None, 512, False, rate, seed))
    np.testing.assert_array_equal(pd, pd2)

    # backward regenerates the forward's mask: linear-in-v identity
    g = jnp.asarray(rng.normal(size=(b, l, e)).astype(np.float32))
    vr = jnp.asarray(rng.normal(size=(b, s, e)).astype(np.float32))

    def f(vv):
        return kmod.fused_mha(q, k, vv, heads, None, 512, False, rate, seed)

    out, vjp = jax.vjp(f, vr)
    (dv,) = vjp(g)
    np.testing.assert_allclose(
        float(jnp.sum(dv * vr)), float(jnp.sum(g * out)), rtol=1e-2
    )


@pytest.mark.parametrize("ltile", [64, 96])
def test_bwd_l_tile_shrink_same_grads(rng, monkeypatch, ltile):
    """Shrunken backward L-tiles must produce bit-identical grads at
    L <= 128: the backward regenerates the forward's full 128-row
    dropout block and slices its tile window
    (kernels/attention.py::_mha_bwd_body), so the mask — and therefore
    dq/dk/dv — cannot drift.  This is the projection-fold enable path
    (BENCH_NOTES r5 'Projection-fold re-attempt'; 96 is the fold-site
    default, 64 the large-S fallback)."""
    from act3d_tpu.kernels import attention as kmod

    b, l, s, e, heads, rate = 2, 50, 320, 64, 4, 0.1
    q = jnp.asarray(rng.normal(size=(b, l, e)).astype(np.float32)) * 0.2
    k = jnp.asarray(rng.normal(size=(b, s, e)).astype(np.float32)) * 0.2
    v = jnp.asarray(rng.normal(size=(b, s, e)).astype(np.float32))
    g = jnp.asarray(rng.normal(size=(b, l, e)).astype(np.float32))
    seed = jnp.asarray([3], jnp.int32)

    def grads(ltile):
        monkeypatch.setenv("ACT3D_BWD_L_TILE", str(ltile))

        def f(qq, kk, vv):
            return kmod.fused_mha(
                qq, kk, vv, heads, None, 512, False, rate, seed
            )

        out, vjp = jax.vjp(f, q, k, v)
        return out, vjp(g)

    out128, g128 = grads(128)
    out64, g64 = grads(ltile)
    np.testing.assert_array_equal(np.asarray(out128), np.asarray(out64))
    for a, b_ in zip(g128, g64):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b_))
