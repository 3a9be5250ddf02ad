"""Compact convolutional trunk for the detection front-end (flax).

The reference's trunk is a ResNeXt-152-C4 frozen inside the TorchScript
VinVL artifact. TPU-natively we want a trunk XLA can tile onto the MXU:
NHWC convs, channels in multiples of 64, GroupNorm (no running statistics
-> one inference graph, no train/eval divergence), bf16-able. Depth/width
are config knobs; the default is a ~ResNet-18-shaped trunk to stride 16.
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
from flax import linen as nn


class ResBlock(nn.Module):
    """Basic residual block: 3x3 conv -> GN -> relu -> 3x3 conv -> GN."""
    channels: int
    stride: int = 1
    dtype: str = "float32"

    @nn.compact
    def __call__(self, x):
        dt = jnp.dtype(self.dtype)
        r = x
        x = nn.Conv(self.channels, (3, 3), strides=self.stride,
                    use_bias=False, dtype=dt, name="conv1")(x)
        x = nn.GroupNorm(num_groups=32, dtype=dt, name="gn1")(x)
        x = nn.relu(x)
        x = nn.Conv(self.channels, (3, 3), use_bias=False, dtype=dt,
                    name="conv2")(x)
        x = nn.GroupNorm(num_groups=32, dtype=dt, name="gn2")(x)
        if r.shape != x.shape:
            r = nn.Conv(self.channels, (1, 1), strides=self.stride,
                        use_bias=False, dtype=dt, name="proj")(r)
            r = nn.GroupNorm(num_groups=32, dtype=dt, name="gn_proj")(r)
        return nn.relu(x + r)


class Trunk(nn.Module):
    """Stem (stride 4) + 3 stages -> stride-16 feature map [B, H/16, W/16, C].

    stage_channels/stage_blocks control width/depth; channels stay multiples
    of 64 so XLA tiles convs onto the MXU without padding waste.
    """
    stage_channels: Sequence[int] = (64, 128, 256)
    stage_blocks: Sequence[int] = (2, 2, 2)
    dtype: str = "float32"

    @nn.compact
    def __call__(self, x):
        dt = jnp.dtype(self.dtype)
        x = x.astype(dt)
        x = nn.Conv(64, (7, 7), strides=2, use_bias=False, dtype=dt,
                    name="stem_conv")(x)
        x = nn.GroupNorm(num_groups=32, dtype=dt, name="stem_gn")(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding="SAME")
        for si, (ch, nb) in enumerate(zip(self.stage_channels,
                                          self.stage_blocks)):
            for bi in range(nb):
                stride = 2 if (bi == 0 and si > 0) else 1
                x = ResBlock(ch, stride, self.dtype,
                             name=f"stage{si}_block{bi}")(x)
        return x
