"""Shared visual encoding: frozen backbone + FPN + multi-scale pyramid.

TPU-native equivalent of the reference's shared ``Encoder`` visual path
(reference: model/utils/encoder.py:115-167) and Act3D's identical private
copy (model/keypose_optimization/act3d.py:359-392).

Design notes (TPU-first):
  * NHWC throughout; the (B, ncam, 3, H, W) reference API layout is
    transposed once on entry.
  * the backbone is frozen in every config — its outputs are wrapped in
    ``stop_gradient`` and its params are additionally masked out of the
    optimizer (train.engine), mirroring ``requires_grad=False``.
  * cameras are folded into the batch dim for the conv stack (large batched
    convs → MXU friendly) and unfolded for the token pyramid.
  * point-cloud pyramid levels use bilinear (align_corners=False,
    no antialias) resizing to match ``F.interpolate`` exactly.
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from .fpn import FeaturePyramidNetwork
from .resnet import (
    CLIP_MEAN,
    CLIP_STD,
    IMAGENET_MEAN,
    IMAGENET_STD,
    ClipModifiedResNet,
    TorchResNet50,
    normalize_rgb,
)


def pyramid_layout(image_size: Tuple[int, int]):
    """(feature_map_pyramid, downscaling_factor_pyramid) per encoder.py:40-53."""
    if image_size == (64, 64):
        # not a reference config — same structure as 128^2; used by the
        # budgeted multichip dryrun to fit flagship-width compiles on CPU
        return ["res2", "res1", "res1", "res1"], [4, 2, 2, 2]
    if image_size == (128, 128):
        return ["res2", "res1", "res1", "res1"], [4, 2, 2, 2]
    if image_size == (256, 256):
        return ["res3", "res1", "res1", "res1"], [8, 2, 2, 2]
    raise ValueError(f"unsupported image size {image_size}")


def interpolate_bilinear(x: jax.Array, h: int, w: int) -> jax.Array:
    """NHWC bilinear resize matching torch F.interpolate(align_corners=False)."""
    return jax.image.resize(
        x, (x.shape[0], h, w, x.shape[3]), method="linear", antialias=False
    )


class VisualEncoder(nn.Module):
    """Frozen backbone + FPN + (features, point-cloud) pyramids.

    Call with reference-layout tensors:
      rgb: (B, ncam, 3, H, W) in [0, 1]
      pcd: (B, ncam, 3, H, W) world coordinates

    Returns:
      rgb_feats_pyramid: list of (B, ncam * H_i * W_i, F) visual tokens,
        camera-major row-major order (matches encoder.py:153-158).  Token-
        major because every consumer attends over flat tokens — emitting
        (B, ncam, H, W, F) forced a second tiled-layout relayout copy at
        each consumer's reshape (~2.5 ms/step in the act3d b32 trace).
      pcd_pyramid: list of (B, ncam * H_i * W_i, 3), same token order.
    """

    backbone: str = "clip"
    image_size: Tuple[int, int] = (256, 256)
    embedding_dim: int = 60
    num_sampling_level: int = 3
    # None = follow the input dtype (mixed precision casts the batch to
    # bf16 and the frozen trunk runs bf16 end-to-end); set to force a dtype.
    compute_dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(
        self, rgb: jax.Array, pcd: jax.Array
    ) -> Tuple[List[jax.Array], List[jax.Array]]:
        b, ncam, _, h, w = rgb.shape
        feature_maps, downscale = pyramid_layout(self.image_size)

        # (B*ncam, H, W, 3)
        images = rgb.reshape(b * ncam, 3, h, w).transpose(0, 2, 3, 1)
        if self.backbone == "clip":
            images = normalize_rgb(images, CLIP_MEAN, CLIP_STD)
            trunk = ClipModifiedResNet(name="backbone")
        elif self.backbone == "resnet":
            images = normalize_rgb(images, IMAGENET_MEAN, IMAGENET_STD)
            trunk = TorchResNet50(name="backbone")
        else:
            raise ValueError(f"unknown backbone {self.backbone}")

        if self.compute_dtype is not None:
            images = images.astype(self.compute_dtype)
        feats = trunk(images)
        # Frozen backbone: no gradients flow into it (act3d.py:72-73).
        feats = jax.tree.map(jax.lax.stop_gradient, feats)

        feats = FeaturePyramidNetwork(
            out_channels=self.embedding_dim, name="feature_pyramid"
        )(feats)

        clouds = pcd.reshape(b * ncam, 3, h, w).transpose(0, 2, 3, 1)

        rgb_feats_pyramid: List[jax.Array] = []
        pcd_pyramid: List[jax.Array] = []
        for i in range(self.num_sampling_level):
            f_i = feats[feature_maps[i]]
            hi, wi = h // downscale[i], w // downscale[i]
            pcd_i = interpolate_bilinear(clouds, hi, wi)
            rgb_feats_pyramid.append(
                f_i.reshape(b, ncam * hi * wi, self.embedding_dim)
            )
            pcd_pyramid.append(pcd_i.reshape(b, ncam * hi * wi, 3))
        return rgb_feats_pyramid, pcd_pyramid
