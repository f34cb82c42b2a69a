"""Checkpoint-converter tests: torch-style state dicts -> flax trees.

Builds torch state dicts with the reference's exact naming scheme (from
model/utils/layers.py module structure) and checks the converted flax
modules compute identical outputs to a direct torch implementation where
one exists (MultiheadAttention), and that mapping is complete/strict.
"""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from act3d_tpu.convert.torch_to_jax import _Mapper, strip_ddp_prefix
from act3d_tpu.nn.layers import RelativeCrossAttentionModule


def torch_rcam_state_dict(dim, n_layers, rng):
    """State dict named like the reference RelativeCrossAttentionModule
    (layers.py:335-351)."""
    sd = {}
    for j in range(n_layers):
        a = f"attn_layers.{j}.multihead_attn"
        sd[f"{a}.in_proj_weight"] = rng.normal(size=(3 * dim, dim)).astype(np.float32)
        sd[f"{a}.in_proj_bias"] = rng.normal(size=(3 * dim,)).astype(np.float32)
        sd[f"{a}.out_proj.weight"] = rng.normal(size=(dim, dim)).astype(np.float32)
        sd[f"{a}.out_proj.bias"] = rng.normal(size=(dim,)).astype(np.float32)
        sd[f"attn_layers.{j}.norm.weight"] = rng.normal(size=(dim,)).astype(np.float32)
        sd[f"attn_layers.{j}.norm.bias"] = rng.normal(size=(dim,)).astype(np.float32)
        f = f"ffw_layers.{j}"
        sd[f"{f}.linear1.weight"] = rng.normal(size=(dim, dim)).astype(np.float32)
        sd[f"{f}.linear1.bias"] = rng.normal(size=(dim,)).astype(np.float32)
        sd[f"{f}.linear2.weight"] = rng.normal(size=(dim, dim)).astype(np.float32)
        sd[f"{f}.linear2.bias"] = rng.normal(size=(dim,)).astype(np.float32)
        sd[f"{f}.norm.weight"] = rng.normal(size=(dim,)).astype(np.float32)
        sd[f"{f}.norm.bias"] = rng.normal(size=(dim,)).astype(np.float32)
    return sd


def test_rcam_conversion_via_mapper(rng):
    dim, n_layers, heads = 16, 2, 4
    mod = RelativeCrossAttentionModule(dim, heads, n_layers)
    q = jnp.asarray(rng.normal(size=(1, 3, dim)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(1, 5, dim)).astype(np.float32))
    variables = mod.init(jax.random.PRNGKey(0), q, v)

    sd = {
        f"mod.{k}": val
        for k, val in torch_rcam_state_dict(dim, n_layers, rng).items()
    }
    params = {"mod": variables["params"]}
    m = _Mapper(sd, params)
    m.relative_cross_attn_module("mod", "mod", n_layers)
    converted = m.finish()

    # every leaf must have been replaced (init params differ from random sd)
    out = mod.apply({"params": converted["mod"]}, q, v)
    out_init = mod.apply(variables, q, v)
    assert not np.allclose(np.asarray(out[-1]), np.asarray(out_init[-1]))

    # cross-check attention layer 0 against torch's own MultiheadAttention
    t_attn = torch.nn.MultiheadAttention(dim, heads, batch_first=True)
    with torch.no_grad():
        t_attn.in_proj_weight.copy_(
            torch.tensor(sd["mod.attn_layers.0.multihead_attn.in_proj_weight"])
        )
        t_attn.in_proj_bias.copy_(
            torch.tensor(sd["mod.attn_layers.0.multihead_attn.in_proj_bias"])
        )
        t_attn.out_proj.weight.copy_(
            torch.tensor(sd["mod.attn_layers.0.multihead_attn.out_proj.weight"])
        )
        t_attn.out_proj.bias.copy_(
            torch.tensor(sd["mod.attn_layers.0.multihead_attn.out_proj.bias"])
        )
        t_out, _ = t_attn(torch.tensor(np.asarray(q)), torch.tensor(np.asarray(v)),
                          torch.tensor(np.asarray(v)))

    from act3d_tpu.nn.layers import MultiheadAttention

    mha = MultiheadAttention(dim, heads)
    got = mha.apply(
        {"params": converted["mod"]["attn_0"]["multihead_attn"]}, q, v, v
    )
    np.testing.assert_allclose(
        np.asarray(got), t_out.detach().numpy(), atol=2e-5, rtol=1e-4
    )


def test_strict_unused_keys_raise(rng):
    dim, heads = 16, 4
    mod = RelativeCrossAttentionModule(dim, heads, 1)
    q = jnp.asarray(rng.normal(size=(1, 3, dim)).astype(np.float32))
    variables = mod.init(jax.random.PRNGKey(0), q, q)
    sd = {
        f"mod.{k}": v for k, v in torch_rcam_state_dict(dim, 1, rng).items()
    }
    sd["mod.some_extra.weight"] = np.zeros((2, 2), np.float32)
    m = _Mapper(sd, {"mod": variables["params"]})
    m.relative_cross_attn_module("mod", "mod", 1)
    with pytest.raises(KeyError):
        m.finish()


def test_strip_ddp_prefix():
    sd = {"module.a.weight": 1, "b.bias": 2}
    out = strip_ddp_prefix(sd)
    assert set(out) == {"a.weight", "b.bias"}


def test_shape_mismatch_raises(rng):
    dim, heads = 16, 4
    mod = RelativeCrossAttentionModule(dim, heads, 1)
    q = jnp.asarray(rng.normal(size=(1, 3, dim)).astype(np.float32))
    variables = mod.init(jax.random.PRNGKey(0), q, q)
    sd = {
        f"mod.{k}": v for k, v in torch_rcam_state_dict(dim, 1, rng).items()
    }
    sd["mod.attn_layers.0.multihead_attn.in_proj_weight"] = np.zeros(
        (3 * dim, dim + 1), np.float32
    )
    m = _Mapper(sd, {"mod": variables["params"]})
    with pytest.raises(ValueError):
        m.relative_cross_attn_module("mod", "mod", 1)
