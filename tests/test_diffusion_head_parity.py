"""Golden parity: the full DiffusionHead denoising trunk vs a torch double.

Validates the complete composition the reference runs per diffusion step
(reference model/trajectory_optimization/diffusion_head.py:200-363) given
precomputed visual features (the backbone+FPN path has its own parity test):
  traj encoder MLP → sinusoidal time/sem embeddings → vl attention →
  traj-lang attention → traj self+cross rounds (rotary + AdaLN) →
  pos/rot branches → regressors → trajectory update rule.

Both sides share converted weights; inputs are seeded and identical.
"""

import math

import numpy as np
import torch
import torch.nn as nn

import jax
import jax.numpy as jnp

from act3d_tpu.convert.torch_to_jax import _Mapper
from act3d_tpu.models.diffusion_head import DiffusionHead
from act3d_tpu.ops.rotary import rotary_pe_3d

from tests.test_parallel_attention_parity import (
    TorchAdaLN,
    TorchRotaryMHA,
    torch_embed_rotary,
)

DIM = 24
HEADS = 4
N_LAYERS = 3  # num_query_cross_attn_layers


def sinusoidal(x, dim=DIM):
    half = dim // 2
    scale = math.log(10000.0) / (half - 1)
    freqs = torch.exp(torch.arange(half, dtype=torch.float32) * -scale)
    ang = x.float()[..., None] * freqs
    return torch.cat([torch.sin(ang), torch.cos(ang)], dim=-1)


def rotary3d_torch(xyz, dim=DIM):
    return torch.tensor(np.asarray(rotary_pe_3d(xyz.numpy(), dim)))


class TorchPALayer(nn.Module):
    """ParallelAttentionLayer torch double with configurable blocks."""

    def __init__(self, dim, heads, self1, cross1, ffn, rotary, adaln):
        super().__init__()
        self.self1, self.cross1, self.ffn = self1, cross1, ffn
        self.rotary, self.use_adaln = rotary, adaln
        if cross1:
            self.cross_12 = TorchRotaryMHA(dim, heads)
            self.norm_12 = nn.LayerNorm(dim)
            if adaln:
                self.adaln_12 = TorchAdaLN(dim)
        if self1:
            self.sa1 = TorchRotaryMHA(dim, heads)
            self.norm_1 = nn.LayerNorm(dim)
            if adaln:
                self.adaln_1 = TorchAdaLN(dim)
        if ffn and (self1 or cross1):
            self.ffn_fc1 = nn.Linear(dim, 4 * dim)
            self.ffn_fc2 = nn.Linear(4 * dim, dim)
            self.norm_122 = nn.LayerNorm(dim)
            if adaln:
                self.adaln_ff1 = TorchAdaLN(dim)

    def _ada(self, name, x, t):
        if self.use_adaln and t is not None and hasattr(self, name):
            return getattr(self, name)(x, t)
        return x

    def forward(self, seq1, seq2, seq1_pos=None, seq2_pos=None,
                sem_pos=None, t=None, seq1_mask=None):
        def add(x, p):
            return x if p is None else x + p

        if self.cross1:
            q1 = seq1 if self.rotary else add(seq1, seq1_pos)
            k2 = seq2 if self.rotary else add(seq2, seq2_pos)
            q1 = add(q1, sem_pos)
            out = self.cross_12(
                self._ada("adaln_12", q1, t), k2, seq2,
                seq1_pos if self.rotary else None,
                seq2_pos if self.rotary else None,
            )
            seq1 = self.norm_12(seq1 + out)
        if self.self1:
            q1 = k1 = seq1 if self.rotary else add(seq1, seq1_pos)
            v1 = seq1
            q1, k1 = add(q1, sem_pos), add(k1, sem_pos)
            out = self.sa1(
                self._ada("adaln_1", q1, t), self._ada("adaln_1", k1, t),
                self._ada("adaln_1", v1, t),
                seq1_pos if self.rotary else None,
                seq1_pos if self.rotary else None,
            )
            seq1 = self.norm_1(seq1 + out)
        if self.ffn and (self.self1 or self.cross1):
            seq1 = self._ada("adaln_ff1", seq1, t)
            h = self.ffn_fc2(torch.relu(self.ffn_fc1(seq1)))
            seq1 = self.norm_122(seq1 + h)
        return seq1


class TorchDiffusionTrunk(nn.Module):
    """DiffusionHead.denoise double (visual features injected)."""

    def __init__(self):
        super().__init__()
        d, h = DIM, HEADS
        self.traj_enc_fc1 = nn.Linear(9, d)
        self.traj_enc_fc2 = nn.Linear(d, d)
        self.vl = nn.ModuleList(
            [TorchPALayer(d, h, False, True, True, False, False)
             for _ in range(2)]
        )
        self.traj_lang = TorchPALayer(d, h, False, True, False, False, False)
        self.traj_attn = nn.ModuleList(
            [TorchPALayer(d, h, True, True, True, True, True)
             for _ in range(N_LAYERS - 2)]
        )
        self.pos_attn = nn.ModuleList(
            [TorchPALayer(d, h, True, True, True, True, True) for _ in range(2)]
        )
        self.rot_attn = nn.ModuleList(
            [TorchPALayer(d, h, True, True, True, True, True) for _ in range(2)]
        )
        self.pos_reg1 = nn.Linear(d, d)
        self.pos_reg2 = nn.Linear(d, 3)
        self.rot_reg1 = nn.Linear(d, d)
        self.rot_reg2 = nn.Linear(d, 6)

    def forward(self, trajectory, timestep, context_feats, context_pos_xyz,
                instr_feats, curr_grip_feats, curr_grip_xyz,
                goal_grip_feats, goal_grip_xyz):
        traj_feats = self.traj_enc_fc2(torch.relu(self.traj_enc_fc1(trajectory)))
        traj_pos = rotary3d_torch(trajectory[..., :3])
        time_feats = sinusoidal(timestep)
        L = trajectory.shape[1]
        sem = sinusoidal(torch.arange(L))[None].repeat(len(trajectory), 1, 1)

        ctx = context_feats
        for layer in self.vl:
            ctx = layer(ctx, instr_feats)
        ctx = torch.cat([ctx, curr_grip_feats, goal_grip_feats], dim=1)
        ctx_xyz = torch.cat(
            [context_pos_xyz, curr_grip_xyz, goal_grip_xyz], dim=1
        )
        ctx_pos = rotary3d_torch(ctx_xyz)

        traj_feats = self.traj_lang(
            traj_feats, instr_feats, sem_pos=sem
        )
        for layer in self.traj_attn:
            traj_feats = layer(
                traj_feats, ctx, traj_pos, ctx_pos, sem, time_feats
            )
        pos_feats = traj_feats
        for layer in self.pos_attn:
            pos_feats = layer(
                pos_feats, ctx, traj_pos, ctx_pos, sem, time_feats
            )
        rot_feats = traj_feats
        for layer in self.rot_attn:
            rot_feats = layer(
                rot_feats, ctx, traj_pos, ctx_pos, sem, time_feats
            )
        pos = self.pos_reg2(torch.relu(self.pos_reg1(pos_feats)))
        rot = self.rot_reg2(torch.relu(self.rot_reg1(rot_feats)))
        update = torch.cat([pos, rot], -1)
        return torch.cat(
            [trajectory[..., :3] + update[..., :3], update[..., 3:]], -1
        )


def _convert(t_model, flax_params):
    sd = {}
    for k, v in t_model.state_dict().items():
        sd[k] = v.detach().numpy()

    def rename_pa(src_prefix, dst_torch_prefix):
        for k in list(sd):
            if k.startswith(src_prefix + "."):
                rest = k[len(src_prefix) + 1 :]
                rest = rest.replace("ffn_fc1", "ffn_12.0").replace(
                    "ffn_fc2", "ffn_12.3"
                )
                sd[f"{dst_torch_prefix}.{rest}"] = sd.pop(k)

    # map module names onto the reference layout the converter expects
    for i in range(2):
        rename_pa(f"vl.{i}", f"vl_attention.0.layers.{i}")
    rename_pa("traj_lang", "traj_lang_attention.0.layers.0")
    for i in range(N_LAYERS - 2):
        rename_pa(f"traj_attn.{i}", f"traj_attention.0.layers.{i}")
    for i in range(2):
        rename_pa(f"pos_attn.{i}", f"pos_attention.0.layers.{i}")
        rename_pa(f"rot_attn.{i}", f"rot_attention.0.layers.{i}")
    renames = {
        "traj_enc_fc1": "traj_encoder.0",
        "traj_enc_fc2": "traj_encoder.3",
        "pos_reg1": "pos_regressor.0.0",
        "pos_reg2": "pos_regressor.0.3",
        "rot_reg1": "rot_regressor.0.0",
        "rot_reg2": "rot_regressor.0.3",
    }
    for old, new in renames.items():
        for suffix in ("weight", "bias"):
            sd[f"{new}.{suffix}"] = sd.pop(f"{old}.{suffix}")

    m = _Mapper(sd, flax_params)
    m.parallel_attention("vl_attention.0", "vl_attention_0", 2)
    m.parallel_attention("traj_lang_attention.0", "traj_lang_attention_0", 1)
    m.parallel_attention("traj_attention.0", "traj_attention_0", N_LAYERS - 2)
    m.parallel_attention("pos_attention.0", "pos_attention_0", 2)
    m.parallel_attention("rot_attention.0", "rot_attention_0", 2)
    m.linear("traj_encoder.0", "traj_enc_fc1")
    m.linear("traj_encoder.3", "traj_enc_fc2")
    m.linear("pos_regressor.0.0", "pos_regressor_0_fc1")
    m.linear("pos_regressor.0.3", "pos_regressor_0_fc2")
    m.linear("rot_regressor.0.0", "rot_regressor_0_fc1")
    m.linear("rot_regressor.0.3", "rot_regressor_0_fc2")
    return m


def test_diffusion_trunk_parity(rng):
    torch.manual_seed(0)
    t_model = TorchDiffusionTrunk()
    t_model.eval()

    B, L, NCTX, NI = 2, 6, 40, 53
    trajectory = rng.normal(size=(B, L, 9)).astype(np.float32)
    timestep = np.array([7, 42], np.int64)
    ctx_feats = rng.normal(size=(B, NCTX, DIM)).astype(np.float32)
    ctx_xyz = rng.normal(size=(B, NCTX, 3)).astype(np.float32)
    instr = rng.normal(size=(B, NI, DIM)).astype(np.float32)
    cg_feats = rng.normal(size=(B, 1, DIM)).astype(np.float32)
    cg_xyz = rng.normal(size=(B, 1, 3)).astype(np.float32)
    gg_feats = rng.normal(size=(B, 1, DIM)).astype(np.float32)
    gg_xyz = rng.normal(size=(B, 1, 3)).astype(np.float32)

    with torch.no_grad():
        want = t_model(
            torch.tensor(trajectory), torch.tensor(timestep),
            torch.tensor(ctx_feats), torch.tensor(ctx_xyz),
            torch.tensor(instr), torch.tensor(cg_feats),
            torch.tensor(cg_xyz), torch.tensor(gg_feats),
            torch.tensor(gg_xyz),
        ).numpy()

    head = DiffusionHead(
        embedding_dim=DIM, output_dim=9, num_attn_heads=HEADS,
        num_query_cross_attn_layers=N_LAYERS,
        use_instruction=True, use_goal=True, dropout=0.0,
    )

    def run(mdl, traj, ts):
        context = dict(
            rgb_feats_pyramid=[
                jnp.asarray(ctx_feats).reshape(B, 40, DIM)
            ],
            pcd_pyramid=[jnp.asarray(ctx_xyz)],
            instr_feats=jnp.asarray(instr),
            curr_gripper_feats=jnp.asarray(cg_feats),
            curr_gripper_pos=rotary_pe_3d(jnp.asarray(cg_xyz), DIM),
            goal_gripper_feats=jnp.asarray(gg_feats),
            goal_gripper_pos=rotary_pe_3d(jnp.asarray(gg_xyz), DIM),
        )
        mask = jnp.zeros((B, L), bool)
        return mdl.denoise(traj, mask, ts, context)[-1]

    variables = DiffusionHead.init(
        head, jax.random.PRNGKey(0), jnp.asarray(trajectory),
        jnp.asarray(timestep), method=run,
    )
    converted = _convert(t_model, variables["params"])
    # every torch weight consumed, none left over
    extra = [k for k in converted.sd if k not in converted.used]
    assert not extra, extra

    got = DiffusionHead.apply(
        head, {"params": converted.params}, jnp.asarray(trajectory),
        jnp.asarray(timestep), method=run,
    )
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-4, rtol=1e-3)
