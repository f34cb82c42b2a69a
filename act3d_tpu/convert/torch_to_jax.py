"""PyTorch checkpoint → flax parameter-tree converter.

Maps the reference's state-dict names (reference: model/keypose_optimization/
act3d.py, model/trajectory_optimization/*.py, model/utils/*.py) onto this
framework's flax trees so public ``.pth`` checkpoints load and reproduce
outputs (BASELINE.json parity requirement).

Layout rules:
  * Linear:   torch (out, in) weight        -> kernel (in, out)
  * Conv2d:   torch (out, in, kh, kw)       -> kernel (kh, kw, in, out)
  * BatchNorm weight/bias/running_mean/var  -> FrozenBatchNorm scale/bias/mean/var
  * MultiheadAttention in_proj_weight (3E,E)-> q/k/v kernels (E,E) each
  * nn.Embedding(1, F) .weight              -> (1, F) param unchanged

Entry points:
  convert_diffusion_planner(state_dict, params_template)
  convert_act3d(state_dict, params_template)

Both take a torch state dict (tensors or numpy arrays; "module." prefixes
from DDP are stripped, mirroring online_evaluation/eval1.py:137-153) and the
``model.init(...)`` params tree, and return a new tree with every leaf
replaced by converted weights.  Unmatched keys on either side raise.
"""

from __future__ import annotations

from typing import Any, Dict

import numpy as np

__all__ = ["convert_diffusion_planner", "convert_act3d", "strip_ddp_prefix"]


def strip_ddp_prefix(state_dict: Dict[str, Any]) -> Dict[str, Any]:
    return {
        (k[len("module.") :] if k.startswith("module.") else k): v
        for k, v in state_dict.items()
    }


def _np(x) -> np.ndarray:
    if isinstance(x, np.ndarray):
        return x
    return x.detach().cpu().numpy()  # torch tensor


def _set(tree: Dict, path: str, value: np.ndarray):
    parts = path.split("/")
    node = tree
    for p in parts[:-1]:
        node = node[p]
    leaf = parts[-1]
    if leaf not in node:
        raise KeyError(f"flax tree has no leaf {path}")
    if tuple(node[leaf].shape) != tuple(value.shape):
        raise ValueError(
            f"shape mismatch at {path}: flax {node[leaf].shape} vs torch {value.shape}"
        )
    node[leaf] = value.astype(np.float32)


class _Mapper:
    def __init__(self, state_dict: Dict[str, Any], params: Dict):
        import copy

        self.sd = {k: _np(v) for k, v in strip_ddp_prefix(state_dict).items()}
        self.params = copy.deepcopy(
            {k: _tree_to_mutable(v) for k, v in params.items()}
            if not isinstance(params, dict)
            else _tree_to_mutable(params)
        )
        self.used = set()

    def take(self, key: str) -> np.ndarray:
        self.used.add(key)
        return self.sd[key]

    def has(self, key: str) -> bool:
        return key in self.sd

    def linear(self, tkey: str, fpath: str, bias: bool = True):
        _set(self.params, f"{fpath}/kernel", self.take(f"{tkey}.weight").T)
        if bias and self.has(f"{tkey}.bias"):
            _set(self.params, f"{fpath}/bias", self.take(f"{tkey}.bias"))

    def conv(self, tkey: str, fpath: str, bias: bool = False):
        w = self.take(f"{tkey}.weight").transpose(2, 3, 1, 0)
        _set(self.params, f"{fpath}/kernel", w)
        if bias or self.has(f"{tkey}.bias"):
            _set(self.params, f"{fpath}/bias", self.take(f"{tkey}.bias"))

    def bn(self, tkey: str, fpath: str):
        _set(self.params, f"{fpath}/scale", self.take(f"{tkey}.weight"))
        _set(self.params, f"{fpath}/bias", self.take(f"{tkey}.bias"))
        _set(self.params, f"{fpath}/mean", self.take(f"{tkey}.running_mean"))
        _set(self.params, f"{fpath}/var", self.take(f"{tkey}.running_var"))

    def layernorm(self, tkey: str, fpath: str):
        _set(self.params, f"{fpath}/scale", self.take(f"{tkey}.weight"))
        _set(self.params, f"{fpath}/bias", self.take(f"{tkey}.bias"))

    def embed(self, tkey: str, fpath: str):
        _set(self.params, fpath, self.take(f"{tkey}.weight"))

    def mha(self, tkey: str, fpath: str):
        w = self.take(f"{tkey}.in_proj_weight")
        e = w.shape[1]
        _set(self.params, f"{fpath}/q_kernel", w[:e].T)
        _set(self.params, f"{fpath}/k_kernel", w[e : 2 * e].T)
        _set(self.params, f"{fpath}/v_kernel", w[2 * e :].T)
        if self.has(f"{tkey}.in_proj_bias"):
            b = self.take(f"{tkey}.in_proj_bias")
            _set(self.params, f"{fpath}/q_bias", b[:e])
            _set(self.params, f"{fpath}/k_bias", b[e : 2 * e])
            _set(self.params, f"{fpath}/v_bias", b[2 * e :])
        _set(self.params, f"{fpath}/out_kernel", self.take(f"{tkey}.out_proj.weight").T)
        if self.has(f"{tkey}.out_proj.bias"):
            _set(self.params, f"{fpath}/out_bias", self.take(f"{tkey}.out_proj.bias"))

    # composite blocks ---------------------------------------------------
    def adaln(self, tkey: str, fpath: str):
        # AdaLN.modulation = Sequential(SiLU, Linear) (layers.py:273-280)
        self.linear(f"{tkey}.modulation.1", f"{fpath}/modulation")

    def parallel_attention_layer(self, tkey: str, fpath: str):
        """ParallelAttentionLayer (layers.py:7-218)."""
        pairs = [
            ("sa1", "sa1", "norm_1", "adaln_1"),
            ("sa2", "sa2", "norm_2", "adaln_2"),
            ("cross_12", "cross_12", "norm_12", "adaln_12"),
            ("cross_21", "cross_21", "norm_21", "adaln_21"),
        ]
        for t_attn, f_attn, t_norm, t_ada in pairs:
            if self.has(f"{tkey}.{t_attn}.in_proj_weight"):
                self.mha(f"{tkey}.{t_attn}", f"{fpath}/{f_attn}")
            if self.has(f"{tkey}.{t_norm}.weight"):
                self.layernorm(f"{tkey}.{t_norm}", f"{fpath}/{t_norm}")
            if self.has(f"{tkey}.{t_ada}.modulation.1.weight"):
                self.adaln(f"{tkey}.{t_ada}", f"{fpath}/{t_ada}")
        for t_ffn, f_fc1, f_fc2, t_norm in [
            ("ffn_12", "ffn_12_fc1", "ffn_12_fc2", "norm_122"),
            ("ffn_21", "ffn_21_fc1", "ffn_21_fc2", "norm_212"),
        ]:
            if self.has(f"{tkey}.{t_ffn}.0.weight"):
                self.linear(f"{tkey}.{t_ffn}.0", f"{fpath}/{f_fc1}")
                self.linear(f"{tkey}.{t_ffn}.3", f"{fpath}/{f_fc2}")
                self.layernorm(f"{tkey}.{t_norm}", f"{fpath}/{t_norm}")
        for t_ada, f_ada in [("adaln_ff1", "adaln_ff1"), ("adaln_ff2", "adaln_ff2")]:
            if self.has(f"{tkey}.{t_ada}.modulation.1.weight"):
                self.adaln(f"{tkey}.{t_ada}", f"{fpath}/{f_ada}")

    def parallel_attention(self, tkey: str, fpath: str, num_layers: int):
        for j in range(num_layers):
            self.parallel_attention_layer(
                f"{tkey}.layers.{j}", f"{fpath}/layer_{j}"
            )

    def relative_cross_attn_module(self, tkey: str, fpath: str, num_layers: int):
        """RelativeCrossAttentionModule (layers.py:335-351)."""
        for j in range(num_layers):
            self.mha(
                f"{tkey}.attn_layers.{j}.multihead_attn",
                f"{fpath}/attn_{j}/multihead_attn",
            )
            self.layernorm(
                f"{tkey}.attn_layers.{j}.norm", f"{fpath}/attn_{j}/norm"
            )
            self.linear(
                f"{tkey}.ffw_layers.{j}.linear1", f"{fpath}/ffw_{j}/linear1"
            )
            self.linear(
                f"{tkey}.ffw_layers.{j}.linear2", f"{fpath}/ffw_{j}/linear2"
            )
            self.layernorm(
                f"{tkey}.ffw_layers.{j}.norm", f"{fpath}/ffw_{j}/norm"
            )

    def clip_backbone(self, tkey: str, fpath: str, layers=None):
        """CLIP ModifiedResNet (clip.py:22-43 / CLIP model.py).

        Layer block counts are inferred from the state dict (RN50 default
        (3,4,6,3)); empty prefixes address a root-level module.
        """
        tj = (lambda n: f"{tkey}.{n}" if tkey else n)
        fj = (lambda n: f"{fpath}/{n}" if fpath else n)
        if layers is None:
            layers = tuple(
                len(
                    {
                        k[len(tj(f"layer{li}.")):].split(".")[0]
                        for k in self.sd
                        if k.startswith(tj(f"layer{li}."))
                    }
                )
                for li in (1, 2, 3, 4)
            )
        for i in (1, 2, 3):
            self.conv(tj(f"conv{i}"), fj(f"conv{i}"))
            self.bn(tj(f"bn{i}"), fj(f"bn{i}"))
        for li, n_blocks in enumerate(layers, start=1):
            for b in range(n_blocks):
                base = tj(f"layer{li}.{b}")
                fbase = fj(f"layer{li}_{b}")
                for c in (1, 2, 3):
                    self.conv(f"{base}.conv{c}", f"{fbase}/conv{c}")
                    self.bn(f"{base}.bn{c}", f"{fbase}/bn{c}")
                if self.has(f"{base}.downsample.0.weight"):
                    self.conv(f"{base}.downsample.0", f"{fbase}/downsample_conv")
                    self.bn(f"{base}.downsample.1", f"{fbase}/downsample_bn")

    def fpn(self, tkey: str, fpath: str):
        """torchvision FeaturePyramidNetwork; supports both the plain-conv
        (inner_blocks.N.weight) and Conv2dNormActivation
        (inner_blocks.N.0.weight) torchvision layouts."""
        names = ["res1", "res2", "res3", "res4", "res5"]
        for i, name in enumerate(names):
            for t_block, f_block in [
                (f"inner_blocks.{i}", f"inner_{name}"),
                (f"layer_blocks.{i}", f"layer_{name}"),
            ]:
                key = (
                    f"{tkey}.{t_block}"
                    if self.has(f"{tkey}.{t_block}.weight")
                    else f"{tkey}.{t_block}.0"
                )
                self.conv(key, f"{fpath}/{f_block}", bias=True)

    # --------------------------------------------------------------------
    def finish(self, ignore_unused=("position_noise_scheduler", "rotation_noise_scheduler")):
        unused = [
            k
            for k in self.sd
            if k not in self.used
            and not any(k.startswith(p) for p in ignore_unused)
            and "num_batches_tracked" not in k
        ]
        if unused:
            raise KeyError(f"unconverted torch keys: {unused[:20]}")
        return self.params


def _tree_to_mutable(tree):
    if hasattr(tree, "items"):
        return {k: _tree_to_mutable(v) for k, v in tree.items()}
    return np.asarray(tree)


def convert_diffusion_planner(
    state_dict: Dict[str, Any],
    params: Dict,
    *,
    use_instruction: bool = True,
    use_goal: bool = True,
    attn_rounds: int = 1,
    feat_scales: int = 1,
    num_query_cross_attn_layers: int = 6,
    num_vis_ins_attn_layers: int = 2,
) -> Dict:
    """Convert a reference DiffusionPlanner .pth state dict."""
    m = _Mapper(state_dict, params)
    head_t = "prediction_head"
    head_f = "prediction_head"

    m.clip_backbone(f"{head_t}.backbone", f"{head_f}/visual/backbone")
    m.fpn(f"{head_t}.feature_pyramid", f"{head_f}/visual/feature_pyramid")

    m.linear(f"{head_t}.traj_encoder.0", f"{head_f}/traj_enc_fc1")
    m.linear(f"{head_t}.traj_encoder.3", f"{head_f}/traj_enc_fc2")
    m.linear(f"{head_t}.curr_gripper_encoder", f"{head_f}/curr_gripper_encoder")
    if use_goal:
        m.linear(f"{head_t}.goal_gripper_encoder", f"{head_f}/goal_gripper_encoder")
    m.linear(f"{head_t}.instruction_encoder", f"{head_f}/instruction_encoder")
    m.embed(f"{head_t}.curr_gripper_embed", f"{head_f}/curr_gripper_embed")
    m.embed(f"{head_t}.goal_gripper_embed", f"{head_f}/goal_gripper_embed")

    n_blocks = attn_rounds * feat_scales
    for i in range(n_blocks):
        if use_instruction:
            m.parallel_attention(
                f"{head_t}.vl_attention.{i}", f"{head_f}/vl_attention_{i}",
                num_vis_ins_attn_layers,
            )
            m.parallel_attention(
                f"{head_t}.traj_lang_attention.{i}",
                f"{head_f}/traj_lang_attention_{i}", 1,
            )
        m.parallel_attention(
            f"{head_t}.traj_attention.{i}", f"{head_f}/traj_attention_{i}",
            num_query_cross_attn_layers - 2,
        )
        m.parallel_attention(
            f"{head_t}.pos_attention.{i}", f"{head_f}/pos_attention_{i}", 2
        )
        m.parallel_attention(
            f"{head_t}.rot_attention.{i}", f"{head_f}/rot_attention_{i}", 2
        )
        m.linear(f"{head_t}.pos_regressor.{i}.0", f"{head_f}/pos_regressor_{i}_fc1")
        m.linear(f"{head_t}.pos_regressor.{i}.3", f"{head_f}/pos_regressor_{i}_fc2")
        m.linear(f"{head_t}.rot_regressor.{i}.0", f"{head_f}/rot_regressor_{i}_fc1")
        m.linear(f"{head_t}.rot_regressor.{i}.3", f"{head_f}/rot_regressor_{i}_fc2")
    return m.finish()


def convert_act3d(
    state_dict: Dict[str, Any],
    params: Dict,
    *,
    num_sampling_level: int = 3,
    weight_tying: bool = True,
    gp_emb_tying: bool = True,
    use_instruction: bool = True,
    regress_position_offset: bool = False,
    num_ghost_point_cross_attn_layers: int = 2,
    num_query_cross_attn_layers: int = 2,
    num_vis_ins_attn_layers: int = 2,
) -> Dict:
    """Convert a reference Act3D .pth state dict."""
    m = _Mapper(state_dict, params)
    m.clip_backbone("backbone", "visual/backbone")
    m.fpn("feature_pyramid", "visual/feature_pyramid")

    if gp_emb_tying:
        m.embed("ghost_points_embed_pyramid.0", "ghost_points_embed")
        for i in range(1, num_sampling_level):
            m.used.add(f"ghost_points_embed_pyramid.{i}.weight")
    else:
        for i in range(num_sampling_level):
            m.embed(
                f"ghost_points_embed_pyramid.{i}", f"ghost_points_embed_{i}"
            )
    m.embed("curr_gripper_embed", "curr_gripper_embed")
    m.embed("query_embed", "query_embed")

    def stack(tname, fname, n_layers):
        if weight_tying:
            m.relative_cross_attn_module(f"{tname}.0", fname, n_layers)
            # tied modules share tensors; mark duplicates as consumed
            for i in range(1, num_sampling_level):
                for k in list(m.sd):
                    if k.startswith(f"{tname}.{i}."):
                        m.used.add(k)
        else:
            for i in range(num_sampling_level):
                m.relative_cross_attn_module(
                    f"{tname}.{i}", f"{fname}_{i}", n_layers
                )

    stack(
        "ghost_point_cross_attn_pyramid", "ghost_point_cross_attn",
        num_ghost_point_cross_attn_layers,
    )
    stack(
        "query_cross_attn_pyramid", "query_cross_attn",
        num_query_cross_attn_layers,
    )
    if use_instruction:
        stack("vis_ins_attn_pyramid", "vis_ins_attn", num_vis_ins_attn_layers)
        m.linear("instruction_encoder", "instruction_encoder")

    if regress_position_offset:
        m.linear("ghost_point_offset_predictor.0", "ghost_point_offset_fc1")
        m.linear("ghost_point_offset_predictor.2", "ghost_point_offset_fc2")
    m.linear("gripper_state_predictor.0", "gripper_state_fc1")
    m.linear("gripper_state_predictor.2", "gripper_state_fc2")
    return m.finish()
