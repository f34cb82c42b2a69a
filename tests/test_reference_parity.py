"""Golden parity against the reference's LITERAL torch modules.

Unlike the builder-authored torch doubles (test_act3d_parity.py etc.), the
oracles here are the actual files under /root/reference loaded via
tests/reference_oracle.py — a shared misreading of the reference cannot make
these pass.  Covers (VERDICT round-1 item #2):

- RotaryPositionEncoding3D / embed_rotary / SinusoidalPosEmb
  (model/utils/position_encodings.py:7-97)
- MultiheadCustomAttention incl. slot competition + key padding
  (model/utils/multihead_custom_attention.py:157-462)
- RelativeCrossAttentionModule (model/utils/layers.py:293-351)
- ParallelAttentionLayer with rotary PE, AdaLN, slot flags
  (model/utils/layers.py:7-218)
- all of utils/pytorch3d_transforms.py that ops/rotations.py ports
- model/utils/utils.py math (6D rotation, normalise_quat, find_traj_nn)
"""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from act3d_tpu.convert.torch_to_jax import _Mapper
from act3d_tpu.nn.layers import (
    MultiheadAttention,
    ParallelAttentionLayer,
    RelativeCrossAttentionModule,
)
from act3d_tpu.ops import rotations as R
from act3d_tpu.ops.rotary import embed_rotary, rotary_pe_3d, sinusoidal_pos_emb

from tests.reference_oracle import (
    ref_layers,
    ref_model_utils,
    ref_multihead_custom_attention,
    ref_position_encodings,
    ref_pytorch3d_transforms,
)


# --------------------------------------------------------------- positional
def test_rotary_pe_3d_matches_reference(rng):
    pe = ref_position_encodings()
    xyz = rng.normal(size=(2, 9, 3)).astype(np.float32)
    for dim in (24, 60, 120):
        want = pe.RotaryPositionEncoding3D(dim)(torch.tensor(xyz)).numpy()
        got = np.asarray(rotary_pe_3d(jnp.asarray(xyz), dim))
        np.testing.assert_allclose(got, want, atol=1e-6)


def test_embed_rotary_matches_reference(rng):
    pe = ref_position_encodings()
    x = rng.normal(size=(2, 9, 24)).astype(np.float32)
    xyz = rng.normal(size=(2, 9, 3)).astype(np.float32)
    code = pe.RotaryPositionEncoding3D(24)(torch.tensor(xyz))
    want = pe.RotaryPositionEncoding.embed_rotary(
        torch.tensor(x), code[..., 0], code[..., 1]
    ).numpy()
    got = np.asarray(embed_rotary(jnp.asarray(x), jnp.asarray(code.numpy())))
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_sinusoidal_pos_emb_matches_reference(rng):
    pe = ref_position_encodings()
    t = rng.uniform(0, 100, size=(7,)).astype(np.float32)
    for dim in (60, 120):
        want = pe.SinusoidalPosEmb(dim)(torch.tensor(t)).numpy()
        got = np.asarray(sinusoidal_pos_emb(jnp.asarray(t), dim))
        np.testing.assert_allclose(got, want, atol=1e-5)


# ---------------------------------------------------------------- attention
def _mca_to_flax(t_module, variables):
    sd = {f"m.{k}": v.detach().numpy() for k, v in t_module.state_dict().items()}
    m = _Mapper(sd, {"m": variables["params"]})
    m.mha("m", "m")
    return m.finish()["m"]


@pytest.mark.parametrize("slot", [False, True])
@pytest.mark.parametrize("use_rotary", [False, True])
def test_multihead_custom_attention_matches_reference(rng, slot, use_rotary):
    mca = ref_multihead_custom_attention()
    pe = ref_position_encodings()
    E, H, B, L, S = 24, 4, 2, 7, 11

    t_attn = mca.MultiheadCustomAttention(
        E, H, dropout=0.0, slot_competition=slot
    )
    t_attn.eval()

    q = rng.normal(size=(B, L, E)).astype(np.float32)
    k = rng.normal(size=(B, S, E)).astype(np.float32)
    v = rng.normal(size=(B, S, E)).astype(np.float32)
    mask = rng.uniform(size=(B, S)) < 0.25
    mask[:, 0] = False  # keep at least one key visible
    q_xyz = rng.normal(size=(B, L, 3)).astype(np.float32)
    k_xyz = rng.normal(size=(B, S, 3)).astype(np.float32)
    rotary = None
    if use_rotary:
        enc = pe.RotaryPositionEncoding3D(E)
        rotary = (enc(torch.tensor(q_xyz)), enc(torch.tensor(k_xyz)))

    with torch.no_grad():
        want = t_attn(
            torch.tensor(q).transpose(0, 1),
            torch.tensor(k).transpose(0, 1),
            torch.tensor(v).transpose(0, 1),
            key_padding_mask=torch.tensor(mask),
            rotary_pe=rotary,
        )[0].transpose(0, 1).numpy()

    f_attn = MultiheadAttention(E, H, slot_competition=slot)
    kwargs = dict(key_padding_mask=jnp.asarray(mask))
    if use_rotary:
        kwargs["q_pe"] = jnp.asarray(rotary[0].numpy())
        kwargs["k_pe"] = jnp.asarray(rotary[1].numpy())
    variables = f_attn.init(
        jax.random.PRNGKey(0), jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
        **kwargs,
    )
    converted = _mca_to_flax(t_attn, variables)
    got = f_attn.apply(
        {"params": converted}, jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
        **kwargs,
    )
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-5, rtol=1e-4)


def test_relative_cross_attention_module_matches_reference(rng):
    lay = ref_layers()
    pe = ref_position_encodings()
    E, H, N_LAYERS, B, L, S = 24, 4, 3, 2, 6, 10

    t_mod = lay.RelativeCrossAttentionModule(E, H, N_LAYERS)
    t_mod.eval()

    q = rng.normal(size=(B, L, E)).astype(np.float32)
    v = rng.normal(size=(B, S, E)).astype(np.float32)
    q_xyz = rng.normal(size=(B, L, 3)).astype(np.float32)
    v_xyz = rng.normal(size=(B, S, 3)).astype(np.float32)
    enc = pe.RotaryPositionEncoding3D(E)
    q_pe = enc(torch.tensor(q_xyz))
    v_pe = enc(torch.tensor(v_xyz))

    with torch.no_grad():
        want = [
            o.transpose(0, 1).numpy()
            for o in t_mod(
                torch.tensor(q).transpose(0, 1),
                torch.tensor(v).transpose(0, 1),
                q_pe, v_pe,
            )
        ]

    f_mod = RelativeCrossAttentionModule(E, H, N_LAYERS)
    variables = f_mod.init(
        jax.random.PRNGKey(0), jnp.asarray(q), jnp.asarray(v),
        jnp.asarray(q_pe.numpy()), jnp.asarray(v_pe.numpy()),
    )
    sd = {f"mod.{k}": t.detach().numpy() for k, t in t_mod.state_dict().items()}
    m = _Mapper(sd, {"mod": variables["params"]})
    m.relative_cross_attn_module("mod", "mod", N_LAYERS)
    converted = m.finish()["mod"]

    got = f_mod.apply(
        {"params": converted}, jnp.asarray(q), jnp.asarray(v),
        jnp.asarray(q_pe.numpy()), jnp.asarray(v_pe.numpy()),
    )
    assert len(got) == len(want) == N_LAYERS
    for g, w in zip(got, want):
        np.testing.assert_allclose(np.asarray(g), w, atol=2e-5, rtol=1e-4)


def test_parallel_attention_layer_matches_reference(rng):
    lay = ref_layers()
    pe = ref_position_encodings()
    dim, heads, B, L, S = 36, 4, 2, 6, 10

    t_layer = lay.ParallelAttentionLayer(
        d_model=dim, dropout=0.0, n_heads=heads,
        self_attention1=True, self_attention2=True,
        cross_attention1=True, cross_attention2=True,
        slot_attention12=True, rotary_pe=True, use_adaln=True,
    )
    t_layer.eval()
    # AdaLN is zero-initialised in the reference; randomize so the test
    # actually exercises the modulation path
    for name, p in t_layer.named_parameters():
        if "adaln" in name:
            with torch.no_grad():
                p.copy_(torch.randn_like(p) * 0.2)

    seq1 = rng.normal(size=(B, L, dim)).astype(np.float32)
    seq2 = rng.normal(size=(B, S, dim)).astype(np.float32)
    xyz1 = rng.normal(size=(B, L, 3)).astype(np.float32)
    xyz2 = rng.normal(size=(B, S, 3)).astype(np.float32)
    sem1 = rng.normal(size=(B, L, dim)).astype(np.float32)
    sem2 = rng.normal(size=(B, S, dim)).astype(np.float32)
    tsig = rng.normal(size=(B, dim)).astype(np.float32)
    mask2 = rng.uniform(size=(B, S)) < 0.2
    mask2[:, 0] = False

    enc = pe.RotaryPositionEncoding3D(dim)
    pe1 = enc(torch.tensor(xyz1))
    pe2 = enc(torch.tensor(xyz2))

    with torch.no_grad():
        want1, want2 = t_layer(
            torch.tensor(seq1), None,
            torch.tensor(seq2), torch.tensor(mask2),
            seq1_pos=pe1, seq2_pos=pe2,
            seq1_sem_pos=torch.tensor(sem1), seq2_sem_pos=torch.tensor(sem2),
            ada_sgnl=torch.tensor(tsig),
        )

    f_layer = ParallelAttentionLayer(
        d_model=dim, n_heads=heads, dropout=0.0,
        self_attention1=True, self_attention2=True,
        cross_attention1=True, cross_attention2=True,
        slot_attention12=True, rotary_pe=True, use_adaln=True,
    )
    call_kwargs = dict(
        seq2_key_padding_mask=jnp.asarray(mask2),
        seq1_pos=jnp.asarray(pe1.numpy()), seq2_pos=jnp.asarray(pe2.numpy()),
        seq1_sem_pos=jnp.asarray(sem1), seq2_sem_pos=jnp.asarray(sem2),
        ada_sgnl=jnp.asarray(tsig),
    )
    variables = f_layer.init(
        jax.random.PRNGKey(0), jnp.asarray(seq1), jnp.asarray(seq2),
        **call_kwargs,
    )
    sd = {f"l.{k}": t.detach().numpy() for k, t in t_layer.state_dict().items()}
    m = _Mapper(sd, {"l": variables["params"]})
    m.parallel_attention_layer("l", "l")
    converted = m.finish()["l"]

    got1, got2 = f_layer.apply(
        {"params": converted}, jnp.asarray(seq1), jnp.asarray(seq2),
        **call_kwargs,
    )
    np.testing.assert_allclose(np.asarray(got1), want1.numpy(), atol=5e-5, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(got2), want2.numpy(), atol=5e-5, rtol=1e-3)


# ------------------------------------------------------ rotation math (p3d)
def _rand_quats(rng, n):
    q = rng.normal(size=(n, 4)).astype(np.float32)
    return (q / np.linalg.norm(q, axis=-1, keepdims=True)).astype(np.float32)


def test_quaternion_matrix_roundtrip_matches_reference(rng):
    p3d = ref_pytorch3d_transforms()
    q = _rand_quats(rng, 32)
    want_m = p3d.quaternion_to_matrix(torch.tensor(q)).numpy()
    got_m = np.asarray(R.quaternion_to_matrix(jnp.asarray(q)))
    np.testing.assert_allclose(got_m, want_m, atol=1e-6)

    want_q = p3d.matrix_to_quaternion(torch.tensor(want_m)).numpy()
    got_q = np.asarray(R.matrix_to_quaternion(jnp.asarray(want_m)))
    np.testing.assert_allclose(got_q, want_q, atol=1e-5)


def test_quaternion_algebra_matches_reference(rng):
    p3d = ref_pytorch3d_transforms()
    a = _rand_quats(rng, 16)
    b = _rand_quats(rng, 16)
    pts = rng.normal(size=(16, 3)).astype(np.float32)

    np.testing.assert_allclose(
        np.asarray(R.quaternion_raw_multiply(jnp.asarray(a), jnp.asarray(b))),
        p3d.quaternion_raw_multiply(torch.tensor(a), torch.tensor(b)).numpy(),
        atol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(R.quaternion_multiply(jnp.asarray(a), jnp.asarray(b))),
        p3d.quaternion_multiply(torch.tensor(a), torch.tensor(b)).numpy(),
        atol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(R.quaternion_invert(jnp.asarray(a))),
        p3d.quaternion_invert(torch.tensor(a)).numpy(),
        atol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(R.quaternion_apply(jnp.asarray(a), jnp.asarray(pts))),
        p3d.quaternion_apply(torch.tensor(a), torch.tensor(pts)).numpy(),
        atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(R.standardize_quaternion(jnp.asarray(a))),
        p3d.standardize_quaternion(torch.tensor(a)).numpy(),
        atol=1e-6,
    )


def test_axis_angle_matches_reference(rng):
    p3d = ref_pytorch3d_transforms()
    aa = rng.normal(size=(16, 3)).astype(np.float32)

    np.testing.assert_allclose(
        np.asarray(R.axis_angle_to_quaternion(jnp.asarray(aa))),
        p3d.axis_angle_to_quaternion(torch.tensor(aa)).numpy(),
        atol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(R.axis_angle_to_matrix(jnp.asarray(aa))),
        p3d.axis_angle_to_matrix(torch.tensor(aa)).numpy(),
        atol=1e-6,
    )
    mats = p3d.random_rotations(16, dtype=torch.float64)
    np.testing.assert_allclose(
        np.asarray(R.matrix_to_axis_angle(jnp.asarray(mats.numpy(), jnp.float32))),
        p3d.matrix_to_axis_angle(mats.float()).numpy(),
        atol=1e-4,
    )
    quats = torch.tensor(_rand_quats(rng, 16))
    np.testing.assert_allclose(
        np.asarray(R.quaternion_to_axis_angle(jnp.asarray(quats.numpy()))),
        p3d.quaternion_to_axis_angle(quats).numpy(),
        atol=1e-5,
    )


def test_euler_angles_match_reference(rng):
    p3d = ref_pytorch3d_transforms()
    euler = (rng.uniform(-1.2, 1.2, size=(16, 3))).astype(np.float32)
    for conv in ("XYZ", "ZYX", "XZY", "YXZ"):
        want_m = p3d.euler_angles_to_matrix(torch.tensor(euler), conv)
        got_m = np.asarray(
            R.euler_angles_to_matrix(jnp.asarray(euler), conv)
        )
        np.testing.assert_allclose(got_m, want_m.numpy(), atol=1e-6)
        np.testing.assert_allclose(
            np.asarray(R.matrix_to_euler_angles(jnp.asarray(got_m), conv)),
            p3d.matrix_to_euler_angles(want_m, conv).numpy(),
            atol=1e-5,
        )


# ----------------------------------------------------- model/utils/utils.py
def test_ortho6d_matches_reference(rng):
    mu = ref_model_utils()
    d6 = rng.normal(size=(16, 6)).astype(np.float32)
    want = mu.compute_rotation_matrix_from_ortho6d(torch.tensor(d6)).numpy()
    got = np.asarray(R.rotation_matrix_from_ortho6d(jnp.asarray(d6)))
    np.testing.assert_allclose(got, want, atol=1e-5)

    want6 = mu.get_ortho6d_from_rotation_matrix(torch.tensor(want)).numpy()
    got6 = np.asarray(R.ortho6d_from_rotation_matrix(jnp.asarray(want)))
    np.testing.assert_allclose(got6, want6, atol=1e-6)


def test_normalise_quat_matches_reference(rng):
    mu = ref_model_utils()
    q = rng.normal(size=(8, 4)).astype(np.float32)
    np.testing.assert_allclose(
        np.asarray(R.normalise_quat(jnp.asarray(q))),
        mu.normalise_quat(torch.tensor(q)).numpy(),
        atol=1e-6,
    )


def test_find_traj_nn_matches_reference(rng):
    from act3d_tpu.ops.geometry import find_traj_nn

    mu = ref_model_utils()
    traj = rng.normal(size=(2, 5, 3)).astype(np.float32)
    pcd = rng.normal(size=(2, 40, 3)).astype(np.float32)

    want = mu.find_traj_nn(torch.tensor(traj), torch.tensor(pcd), nn_=4).numpy()
    got = np.asarray(find_traj_nn(jnp.asarray(traj), jnp.asarray(pcd), 4))
    np.testing.assert_array_equal(got, want)
