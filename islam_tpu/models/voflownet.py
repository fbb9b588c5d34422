"""VOFlowNet pose-regression head (the only trained subnet under the
reference run scripts, run_kitti.sh:39).

TPU-native rebuild of ``VOFlowRes`` (Network/VOFlowNet.py:41-218): ResNet-style
feature embedding over cat(flow[2ch], intrinsic-layer[2ch]) followed by
separate 3-layer MLP heads for translation and rotation.  NHWC; config=1,
down_scale=True, intrinsic=True, stereo=0 is the main path
(Network/VONet.py:16); the multi-camera variant (VOFlowNet.py:196-218) is kept
for inventory parity.
"""

from __future__ import annotations

from typing import Any, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from islam_tpu.models.layers import Conv2d


class ConvReLU(nn.Module):
    features: int
    kernel_size: int = 3
    stride: int = 2
    padding: int = 1
    dilation: int = 1

    @nn.compact
    def __call__(self, x):
        x = Conv2d(self.features, self.kernel_size, self.stride,
                   self.padding, self.dilation, name="conv")(x)
        return nn.relu(x)


class BasicBlock(nn.Module):
    """VOFlowNet.py:20-39: conv+relu, conv, (optional 1x1 downsample), +, relu."""
    planes: int
    stride: int
    downsample: bool
    pad: int = 1
    dilation: int = 1

    @nn.compact
    def __call__(self, x):
        out = ConvReLU(self.planes, 3, self.stride, self.pad, self.dilation,
                       name="conv1")(x)
        out = Conv2d(self.planes, 3, 1, self.pad, self.dilation,
                     name="conv2")(out)
        if self.downsample:
            x = Conv2d(self.planes, 1, self.stride, 0, name="downsample")(x)
        return nn.relu(out + x)


class LinearReLU(nn.Module):
    features: int

    @nn.compact
    def __call__(self, x):
        return nn.relu(nn.Dense(self.features, name="fc")(x))


class FeatureEmbedding(nn.Module):
    """__feature_embedding (VOFlowNet.py:110-157), config=1, down_scale=True."""
    config: int = 1
    down_scale: bool = True
    inputnum: int = 4

    @nn.compact
    def __call__(self, x):
        if self.config == 0:
            blocknums = [2, 2, 3, 3, 3, 3, 3]
            outputnums = [32, 64, 64, 64, 128, 128, 128]
        elif self.config in (1, 2):
            blocknums = [2, 2, 3, 4, 6, 7, 3]
            outputnums = [32, 64, 64, 128, 128, 256, 256]
        else:
            blocknums = [3, 4, 7, 9, 9, 5, 3]
            outputnums = [32, 64, 128, 128, 256, 256, 512]

        x = ConvReLU(32, 3, 2, 1, name="head0")(x)
        x = ConvReLU(32, 3, 1, 1, name="head1")(x)
        x = ConvReLU(32, 3, 1, 1, name="head2")(x)

        inplanes = 32
        layer_specs = []
        start = 0 if not self.down_scale else 2
        for li in range(start, 7):
            layer_specs.append((outputnums[li], blocknums[li]))

        for li, (planes, blocks) in enumerate(layer_specs):
            # stride-2 first block always carries the 1x1 downsample
            # (VOFlowNet.py:159-163: created when stride != 1).
            x = BasicBlock(planes, 2, True, name=f"layer{li}_block0")(x)
            inplanes = planes
            for bi in range(1, blocks):
                x = BasicBlock(planes, 1, False,
                               name=f"layer{li}_block{bi}")(x)
        return x


class VOFlowRes(nn.Module):
    """Main pose head. Input NHWC (B, H, W, 4) = cat(flow, intrinsic layer)."""
    intrinsic: bool = True
    down_scale: bool = True
    config: int = 1
    stereo: float = 0

    @nn.compact
    def __call__(self, x, extrinsic=None):
        feat = FeatureEmbedding(config=self.config, down_scale=self.down_scale,
                                name="feat_net")(x)
        if self.config == 3:
            feat = jnp.mean(feat, axis=(1, 2), keepdims=True)
        # Flatten in torch NCHW order (VOFlowNet.py:190 x.view(B, -1)) so
        # imported Dense weights line up with the feature layout.
        feat = jnp.moveaxis(feat, -1, 1).reshape(feat.shape[0], -1)

        t = LinearReLU(128, name="trans_fc1")(feat)
        t = LinearReLU(32, name="trans_fc2")(t)
        t = nn.Dense(3, name="trans_fc3")(t)

        r = LinearReLU(128, name="rot_fc1")(feat)
        r = LinearReLU(32, name="rot_fc2")(r)
        r = nn.Dense(3, name="rot_fc3")(r)

        return jnp.concatenate([t, r], axis=1)
