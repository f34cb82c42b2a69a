"""Golden parity: flax ClipModifiedResNet/FPN vs an independently-written
torch implementation of the same (public) CLIP RN50 architecture.

This validates the riskiest parity surface — stem wiring, anti-aliased
bottlenecks, downsample branches, FPN top-down path — against torch op
semantics with shared random weights.  (The reference imports OpenAI's
`clip` package, unavailable here; both sides below are written from the
public architecture description.)
"""

import numpy as np
import pytest
import torch
import torch.nn as nn

import jax
import jax.numpy as jnp

from act3d_tpu.convert.torch_to_jax import _Mapper
from act3d_tpu.nn.fpn import FeaturePyramidNetwork
from act3d_tpu.nn.resnet import ClipModifiedResNet


class TorchClipBottleneck(nn.Module):
    expansion = 4

    def __init__(self, inplanes, planes, stride=1):
        super().__init__()
        self.conv1 = nn.Conv2d(inplanes, planes, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(planes)
        self.conv2 = nn.Conv2d(planes, planes, 3, padding=1, bias=False)
        self.bn2 = nn.BatchNorm2d(planes)
        self.avgpool = nn.AvgPool2d(stride) if stride > 1 else nn.Identity()
        self.conv3 = nn.Conv2d(planes, planes * 4, 1, bias=False)
        self.bn3 = nn.BatchNorm2d(planes * 4)
        self.relu = nn.ReLU(inplace=True)
        self.downsample = None
        if stride > 1 or inplanes != planes * 4:
            # CLIP's OrderedDict naming: "-1" avgpool, "0" conv, "1" bn
            from collections import OrderedDict

            self.downsample = nn.Sequential(
                OrderedDict(
                    [
                        (
                            "-1",
                            nn.AvgPool2d(stride) if stride > 1 else nn.Identity(),
                        ),
                        ("0", nn.Conv2d(inplanes, planes * 4, 1, bias=False)),
                        ("1", nn.BatchNorm2d(planes * 4)),
                    ]
                )
            )

    def forward(self, x):
        identity = x
        out = self.relu(self.bn1(self.conv1(x)))
        out = self.relu(self.bn2(self.conv2(out)))
        out = self.avgpool(out)
        out = self.bn3(self.conv3(out))
        if self.downsample is not None:
            identity = self.downsample(x)
        return self.relu(out + identity)


class TorchClipResNet(nn.Module):
    def __init__(self, layers=(2, 2, 2, 2), width=32):
        super().__init__()
        self.conv1 = nn.Conv2d(3, width // 2, 3, stride=2, padding=1, bias=False)
        self.bn1 = nn.BatchNorm2d(width // 2)
        self.conv2 = nn.Conv2d(width // 2, width // 2, 3, padding=1, bias=False)
        self.bn2 = nn.BatchNorm2d(width // 2)
        self.conv3 = nn.Conv2d(width // 2, width, 3, padding=1, bias=False)
        self.bn3 = nn.BatchNorm2d(width)
        self.avgpool = nn.AvgPool2d(2)
        self.relu = nn.ReLU(inplace=True)

        self._inplanes = width
        self.layer1 = self._make_layer(width, layers[0], 1)
        self.layer2 = self._make_layer(width * 2, layers[1], 2)
        self.layer3 = self._make_layer(width * 4, layers[2], 2)
        self.layer4 = self._make_layer(width * 8, layers[3], 2)

    def _make_layer(self, planes, blocks, stride):
        mods = [TorchClipBottleneck(self._inplanes, planes, stride)]
        self._inplanes = planes * 4
        for _ in range(1, blocks):
            mods.append(TorchClipBottleneck(self._inplanes, planes))
        return nn.Sequential(*mods)

    def forward(self, x):
        x = self.relu(self.bn1(self.conv1(x)))
        x = self.relu(self.bn2(self.conv2(x)))
        x0 = self.relu(self.bn3(self.conv3(x)))
        x = self.avgpool(x0)
        x1 = self.layer1(x)
        x2 = self.layer2(x1)
        x3 = self.layer3(x2)
        x4 = self.layer4(x3)
        return {"res1": x0, "res2": x1, "res3": x2, "res4": x3, "res5": x4}


def _randomize_bn_stats(module, rng):
    for m in module.modules():
        if isinstance(m, nn.BatchNorm2d):
            with torch.no_grad():
                m.running_mean.copy_(
                    torch.tensor(rng.normal(0, 0.3, m.num_features), dtype=torch.float32)
                )
                m.running_var.copy_(
                    torch.tensor(rng.uniform(0.5, 1.5, m.num_features), dtype=torch.float32)
                )
                m.weight.copy_(
                    torch.tensor(rng.normal(1, 0.2, m.num_features), dtype=torch.float32)
                )
                m.bias.copy_(
                    torch.tensor(rng.normal(0, 0.2, m.num_features), dtype=torch.float32)
                )


def test_clip_backbone_parity(rng):
    layers, width = (2, 2, 2, 2), 32
    t_model = TorchClipResNet(layers, width)
    _randomize_bn_stats(t_model, rng)
    t_model.eval()

    x = rng.uniform(-1, 1, (2, 3, 64, 64)).astype(np.float32)
    with torch.no_grad():
        want = t_model(torch.tensor(x))

    f_model = ClipModifiedResNet(layers=layers, width=width)
    variables = f_model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3))
    )
    mapper = _Mapper(t_model.state_dict(), variables["params"])
    mapper.clip_backbone("", "")
    # clip_backbone expects a dotted prefix; re-map with explicit root
    params = mapper.params

    got = f_model.apply(
        {"params": params}, jnp.asarray(x.transpose(0, 2, 3, 1))
    )
    for key in ("res1", "res2", "res3", "res4", "res5"):
        np.testing.assert_allclose(
            np.asarray(got[key]).transpose(0, 3, 1, 2),
            want[key].numpy(),
            atol=2e-4,
            rtol=1e-3,
            err_msg=key,
        )


def test_fpn_parity_with_manual_torch(rng):
    """FPN vs a manual torch implementation of torchvision's semantics."""
    chans = {"res1": 8, "res2": 16, "res3": 32, "res4": 64, "res5": 128}
    out_ch = 12
    sizes = {"res1": 32, "res2": 16, "res3": 8, "res4": 4, "res5": 2}

    inner = {
        k: nn.Conv2d(c, out_ch, 1) for k, c in chans.items()
    }
    layer = {k: nn.Conv2d(out_ch, out_ch, 3, padding=1) for k in chans}

    feats_t = {
        k: torch.tensor(
            rng.normal(size=(1, chans[k], sizes[k], sizes[k])).astype(np.float32)
        )
        for k in chans
    }
    names = ["res1", "res2", "res3", "res4", "res5"]
    with torch.no_grad():
        last = inner["res5"](feats_t["res5"])
        want = {"res5": layer["res5"](last)}
        for k in reversed(names[:-1]):
            lat = inner[k](feats_t[k])
            last = lat + torch.nn.functional.interpolate(
                last, size=lat.shape[-2:], mode="nearest"
            )
            want[k] = layer[k](last)

    fpn = FeaturePyramidNetwork(out_channels=out_ch)
    feats_j = {
        k: jnp.asarray(v.numpy().transpose(0, 2, 3, 1))
        for k, v in feats_t.items()
    }
    variables = fpn.init(jax.random.PRNGKey(0), feats_j)
    params = {}
    import copy

    params = copy.deepcopy(
        jax.tree.map(np.asarray, variables["params"])
    )
    for k in names:
        params[f"inner_{k}"]["kernel"] = (
            inner[k].weight.detach().numpy().transpose(2, 3, 1, 0)
        )
        params[f"inner_{k}"]["bias"] = inner[k].bias.detach().numpy()
        params[f"layer_{k}"]["kernel"] = (
            layer[k].weight.detach().numpy().transpose(2, 3, 1, 0)
        )
        params[f"layer_{k}"]["bias"] = layer[k].bias.detach().numpy()

    got = fpn.apply({"params": params}, feats_j)
    for k in names:
        np.testing.assert_allclose(
            np.asarray(got[k]).transpose(0, 3, 1, 2),
            want[k].numpy(),
            atol=2e-5,
            rtol=1e-4,
            err_msg=k,
        )
