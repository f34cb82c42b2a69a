"""Feature Pyramid Network (flax.linen, NHWC).

Semantics match ``torchvision.ops.FeaturePyramidNetwork`` as used by the
reference (reference: model/keypose_optimization/act3d.py:76-77,
model/utils/encoder.py:37-39): 1x1 lateral convs + nearest-neighbour
top-down upsampling + 3x3 output convs, biases enabled.
"""

from __future__ import annotations

from typing import Dict, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn


def _upsample_nearest_to(x: jax.Array, h: int, w: int) -> jax.Array:
    """Nearest-neighbour resize NHWC to (h, w) — exact 2x duplication path."""
    in_h, in_w = x.shape[1], x.shape[2]
    if h == in_h and w == in_w:
        return x
    if h % in_h == 0 and w % in_w == 0:
        x = jnp.repeat(x, h // in_h, axis=1)
        return jnp.repeat(x, w // in_w, axis=2)
    return jax.image.resize(x, (x.shape[0], h, w, x.shape[3]), method="nearest")


class FeaturePyramidNetwork(nn.Module):
    """Top-down FPN over an ordered dict of feature maps.

    Attributes:
      level_names: keys of the input dict, ordered bottom (highest res) to
        top (lowest res), e.g. ("res1", ..., "res5").
      out_channels: output embedding dim for every level.
    """

    level_names: Sequence[str] = ("res1", "res2", "res3", "res4", "res5")
    out_channels: int = 60

    @nn.compact
    def __call__(self, feats: Dict[str, jax.Array]) -> Dict[str, jax.Array]:
        names = list(self.level_names)
        # torchvision initialises FPN convs with kaiming_uniform(a=1)
        init = nn.initializers.variance_scaling(
            1.0 / 3.0, "fan_in", "uniform"
        )
        inner = {
            n: nn.Conv(
                self.out_channels, (1, 1), kernel_init=init,
                name=f"inner_{n}",
            )(feats[n])
            for n in names
        }
        results: Dict[str, jax.Array] = {}
        last = inner[names[-1]]
        results[names[-1]] = nn.Conv(
            self.out_channels, (3, 3), padding=[(1, 1), (1, 1)],
            kernel_init=init, name=f"layer_{names[-1]}",
        )(last)
        for n in reversed(names[:-1]):
            lateral = inner[n]
            top_down = _upsample_nearest_to(
                last, lateral.shape[1], lateral.shape[2]
            )
            last = lateral + top_down
            results[n] = nn.Conv(
                self.out_channels, (3, 3), padding=[(1, 1), (1, 1)],
                kernel_init=init, name=f"layer_{n}",
            )(last)
        return results
