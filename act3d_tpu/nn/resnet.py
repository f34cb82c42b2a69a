"""Visual backbones: CLIP ModifiedResNet-50 and torchvision-style ResNet-50.

TPU-native (NHWC, flax.linen) equivalents of the reference's frozen feature
extractors (reference: model/utils/clip.py:22-43, model/utils/resnet.py:35-56).
Both return a 5-level feature dict {res1..res5} at strides {2,4,8,16,32}.

The backbone is *frozen* in every reference config (act3d.py:72-73,
encoder.py:33-34), so BatchNorm is implemented as :class:`FrozenBatchNorm`:
running statistics are parameters that are never updated, exactly matching
torch eval()-mode BN.  Weights come from the checkpoint converter
(``act3d_tpu.convert``); random init is used for tests.

Normalisation constants follow CLIP / ImageNet preprocessing
(clip.py:18, resnet.py:11).
"""

from __future__ import annotations

from typing import Dict, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

CLIP_MEAN = (0.48145466, 0.4578275, 0.40821073)
CLIP_STD = (0.26862954, 0.26130258, 0.27577711)
IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)

BN_EPS = 1e-5


def normalize_rgb(rgb: jax.Array, mean: Sequence[float], std: Sequence[float]):
    """Channel-normalise NHWC images in [0, 1]."""
    mean = jnp.asarray(mean, dtype=rgb.dtype)
    std = jnp.asarray(std, dtype=rgb.dtype)
    return (rgb - mean) / std


class FrozenBatchNorm(nn.Module):
    """BatchNorm in permanent eval mode (running stats as frozen params)."""

    features: int

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        ones = nn.initializers.ones_init()
        zeros = nn.initializers.zeros_init()
        scale = self.param("scale", ones, (self.features,))
        bias = self.param("bias", zeros, (self.features,))
        mean = self.param("mean", zeros, (self.features,))
        var = self.param("var", ones, (self.features,))
        inv = scale * jax.lax.rsqrt(var + BN_EPS)
        return x * inv + (bias - mean * inv)


def _conv(features: int, kernel: int, stride: int = 1, name: str = None):
    return nn.Conv(
        features,
        (kernel, kernel),
        strides=(stride, stride),
        padding=[(kernel // 2, kernel // 2)] * 2,
        use_bias=False,
        name=name,
    )


def _avg_pool(x: jax.Array, window: int) -> jax.Array:
    return nn.avg_pool(x, (window, window), strides=(window, window))


class ClipBottleneck(nn.Module):
    """CLIP's anti-aliased Bottleneck: stride via AvgPool, expansion 4."""

    planes: int
    stride: int = 1

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        out_ch = self.planes * 4
        identity = x

        h = nn.relu(FrozenBatchNorm(self.planes, name="bn1")(
            _conv(self.planes, 1, name="conv1")(x)))
        h = nn.relu(FrozenBatchNorm(self.planes, name="bn2")(
            _conv(self.planes, 3, name="conv2")(h)))
        if self.stride > 1:
            h = _avg_pool(h, self.stride)
        h = FrozenBatchNorm(out_ch, name="bn3")(
            _conv(out_ch, 1, name="conv3")(h))

        if self.stride > 1 or x.shape[-1] != out_ch:
            if self.stride > 1:
                identity = _avg_pool(identity, self.stride)
            identity = FrozenBatchNorm(out_ch, name="downsample_bn")(
                _conv(out_ch, 1, name="downsample_conv")(identity))
        return nn.relu(h + identity)


class ClipModifiedResNet(nn.Module):
    """CLIP RN50 visual trunk returning {res1..res5} (clip.py:22-43).

    Input: (N, H, W, 3) normalised images.  res1 is the stem output before
    the stem avg-pool (stride 2, 64 ch); res2..res5 are layer1..layer4.
    """

    layers: Tuple[int, int, int, int] = (3, 4, 6, 3)
    width: int = 64

    @nn.compact
    def __call__(self, x: jax.Array) -> Dict[str, jax.Array]:
        w = self.width
        # 3-conv stem
        h = nn.relu(FrozenBatchNorm(w // 2, name="bn1")(
            _conv(w // 2, 3, stride=2, name="conv1")(x)))
        h = nn.relu(FrozenBatchNorm(w // 2, name="bn2")(
            _conv(w // 2, 3, name="conv2")(h)))
        res1 = nn.relu(FrozenBatchNorm(w, name="bn3")(
            _conv(w, 3, name="conv3")(h)))
        h = _avg_pool(res1, 2)

        feats = {"res1": res1}
        planes = [w, w * 2, w * 4, w * 8]
        strides = [1, 2, 2, 2]
        for li, (n_blocks, p, s) in enumerate(
            zip(self.layers, planes, strides), start=1
        ):
            for bi in range(n_blocks):
                h = ClipBottleneck(
                    planes=p,
                    stride=s if bi == 0 else 1,
                    name=f"layer{li}_{bi}",
                )(h)
            feats[f"res{li + 1}"] = h
        return feats


class TorchBottleneck(nn.Module):
    """torchvision Bottleneck (stride on conv2), eval-mode BN."""

    planes: int
    stride: int = 1

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        out_ch = self.planes * 4
        identity = x
        h = nn.relu(FrozenBatchNorm(self.planes, name="bn1")(
            _conv(self.planes, 1, name="conv1")(x)))
        h = nn.relu(FrozenBatchNorm(self.planes, name="bn2")(
            _conv(self.planes, 3, stride=self.stride, name="conv2")(h)))
        h = FrozenBatchNorm(out_ch, name="bn3")(
            _conv(out_ch, 1, name="conv3")(h))
        if self.stride > 1 or x.shape[-1] != out_ch:
            identity = FrozenBatchNorm(out_ch, name="downsample_bn")(
                _conv(out_ch, 1, stride=self.stride, name="downsample_conv")(x))
        return nn.relu(h + identity)


class TorchResNet50(nn.Module):
    """torchvision ResNet-50 feature trunk (resnet.py:35-56).

    res1 is the post-stem ReLU output (stride 2, 64 ch), before max-pool.
    """

    layers: Tuple[int, int, int, int] = (3, 4, 6, 3)

    @nn.compact
    def __call__(self, x: jax.Array) -> Dict[str, jax.Array]:
        h = nn.Conv(
            64, (7, 7), strides=(2, 2), padding=[(3, 3), (3, 3)],
            use_bias=False, name="conv1",
        )(x)
        res1 = nn.relu(FrozenBatchNorm(64, name="bn1")(h))
        h = nn.max_pool(
            jnp.pad(res1, ((0, 0), (1, 1), (1, 1), (0, 0)), constant_values=-jnp.inf),
            (3, 3), strides=(2, 2),
        )

        feats = {"res1": res1}
        planes = [64, 128, 256, 512]
        strides = [1, 2, 2, 2]
        for li, (n_blocks, p, s) in enumerate(
            zip(self.layers, planes, strides), start=1
        ):
            for bi in range(n_blocks):
                h = TorchBottleneck(
                    planes=p, stride=s if bi == 0 else 1, name=f"layer{li}_{bi}",
                )(h)
            feats[f"res{li + 1}"] = h
        return feats
