"""Golden-parity tests of nn layers against torch.nn equivalents.

torch (CPU) is available in the environment; these tests build *public*
torch modules (nn.MultiheadAttention, BatchNorm2d, Conv2d, LayerNorm) with
copied weights and check our flax layers match to float32 tolerance.
"""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from act3d_tpu.nn.layers import MultiheadAttention, AdaLN
from act3d_tpu.nn.resnet import FrozenBatchNorm


def test_attention_matches_torch(rng):
    E, H, B, L, S = 64, 4, 3, 7, 11
    q = rng.normal(size=(B, L, E)).astype(np.float32)
    k = rng.normal(size=(B, S, E)).astype(np.float32)
    v = rng.normal(size=(B, S, E)).astype(np.float32)

    t_attn = torch.nn.MultiheadAttention(E, H, batch_first=True)
    t_attn.eval()
    with torch.no_grad():
        want, _ = t_attn(torch.tensor(q), torch.tensor(k), torch.tensor(v))

    w_in = t_attn.in_proj_weight.detach().numpy()
    b_in = t_attn.in_proj_bias.detach().numpy()
    params = {
        "params": {
            "q_kernel": w_in[:E].T,
            "k_kernel": w_in[E : 2 * E].T,
            "v_kernel": w_in[2 * E :].T,
            "out_kernel": t_attn.out_proj.weight.detach().numpy().T,
            "q_bias": b_in[:E],
            "k_bias": b_in[E : 2 * E],
            "v_bias": b_in[2 * E :],
            "out_bias": t_attn.out_proj.bias.detach().numpy(),
        }
    }
    mod = MultiheadAttention(embed_dim=E, num_heads=H)
    got = mod.apply(params, jnp.asarray(q), jnp.asarray(k), jnp.asarray(v))
    np.testing.assert_allclose(
        np.asarray(got), want.numpy(), atol=2e-5, rtol=1e-4
    )


def test_attention_key_padding_mask_matches_torch(rng):
    E, H, B, L, S = 32, 4, 2, 5, 9
    q = rng.normal(size=(B, L, E)).astype(np.float32)
    kv = rng.normal(size=(B, S, E)).astype(np.float32)
    mask = np.zeros((B, S), bool)
    mask[0, -3:] = True
    mask[1, :2] = True

    t_attn = torch.nn.MultiheadAttention(E, H, batch_first=True)
    t_attn.eval()
    with torch.no_grad():
        want, _ = t_attn(
            torch.tensor(q), torch.tensor(kv), torch.tensor(kv),
            key_padding_mask=torch.tensor(mask),
        )

    w_in = t_attn.in_proj_weight.detach().numpy()
    b_in = t_attn.in_proj_bias.detach().numpy()
    params = {
        "params": {
            "q_kernel": w_in[:E].T,
            "k_kernel": w_in[E : 2 * E].T,
            "v_kernel": w_in[2 * E :].T,
            "out_kernel": t_attn.out_proj.weight.detach().numpy().T,
            "q_bias": b_in[:E],
            "k_bias": b_in[E : 2 * E],
            "v_bias": b_in[2 * E :],
            "out_bias": t_attn.out_proj.bias.detach().numpy(),
        }
    }
    mod = MultiheadAttention(embed_dim=E, num_heads=H)
    got = mod.apply(
        params, jnp.asarray(q), jnp.asarray(kv), jnp.asarray(kv),
        key_padding_mask=jnp.asarray(mask),
    )
    np.testing.assert_allclose(
        np.asarray(got), want.numpy(), atol=2e-5, rtol=1e-4
    )


def test_frozen_batchnorm_matches_torch(rng):
    C = 16
    x = rng.normal(size=(2, 8, 8, C)).astype(np.float32)
    t_bn = torch.nn.BatchNorm2d(C)
    t_bn.eval()
    with torch.no_grad():
        t_bn.weight.copy_(torch.tensor(rng.normal(size=C).astype(np.float32)))
        t_bn.bias.copy_(torch.tensor(rng.normal(size=C).astype(np.float32)))
        t_bn.running_mean.copy_(
            torch.tensor(rng.normal(size=C).astype(np.float32))
        )
        t_bn.running_var.copy_(
            torch.tensor(rng.uniform(0.5, 2.0, size=C).astype(np.float32))
        )
        want = t_bn(torch.tensor(x).permute(0, 3, 1, 2)).permute(0, 2, 3, 1)

    params = {
        "params": {
            "scale": t_bn.weight.detach().numpy(),
            "bias": t_bn.bias.detach().numpy(),
            "mean": t_bn.running_mean.detach().numpy(),
            "var": t_bn.running_var.detach().numpy(),
        }
    }
    got = FrozenBatchNorm(C).apply(params, jnp.asarray(x))
    np.testing.assert_allclose(
        np.asarray(got), want.numpy(), atol=1e-5, rtol=1e-5
    )


def test_adaln_zero_init_is_identity(rng):
    x = rng.normal(size=(2, 5, 16)).astype(np.float32)
    t = rng.normal(size=(2, 16)).astype(np.float32)
    mod = AdaLN(16)
    variables = mod.init(jax.random.PRNGKey(0), jnp.asarray(x), jnp.asarray(t))
    out = mod.apply(variables, jnp.asarray(x), jnp.asarray(t))
    np.testing.assert_allclose(np.asarray(out), x, atol=1e-6)


def test_bilinear_resize_matches_torch(rng):
    from act3d_tpu.nn.encoder import interpolate_bilinear

    x = rng.normal(size=(2, 16, 16, 3)).astype(np.float32)
    want = torch.nn.functional.interpolate(
        torch.tensor(x).permute(0, 3, 1, 2), scale_factor=0.25, mode="bilinear"
    ).permute(0, 2, 3, 1)
    got = interpolate_bilinear(jnp.asarray(x), 4, 4)
    np.testing.assert_allclose(
        np.asarray(got), want.numpy(), atol=1e-5, rtol=1e-5
    )


def test_nearest_upsample_matches_torch(rng):
    from act3d_tpu.nn.fpn import _upsample_nearest_to

    x = rng.normal(size=(1, 4, 4, 2)).astype(np.float32)
    want = torch.nn.functional.interpolate(
        torch.tensor(x).permute(0, 3, 1, 2), size=(8, 8), mode="nearest"
    ).permute(0, 2, 3, 1)
    got = _upsample_nearest_to(jnp.asarray(x), 8, 8)
    np.testing.assert_allclose(np.asarray(got), want.numpy(), atol=0)


def test_conv_same_padding_matches_torch(rng):
    import torch.nn.functional as F
    from flax import linen as nn

    x = rng.normal(size=(1, 9, 9, 4)).astype(np.float32)
    w = rng.normal(size=(8, 4, 3, 3)).astype(np.float32) * 0.1
    want = F.conv2d(
        torch.tensor(x).permute(0, 3, 1, 2), torch.tensor(w),
        stride=2, padding=1,
    ).permute(0, 2, 3, 1)

    conv = nn.Conv(
        8, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)], use_bias=False
    )
    params = {"params": {"kernel": w.transpose(2, 3, 1, 0)}}
    got = conv.apply(params, jnp.asarray(x))
    np.testing.assert_allclose(
        np.asarray(got), want.numpy(), atol=1e-5, rtol=1e-4
    )
