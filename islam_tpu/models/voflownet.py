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


def _encode_pose_sincos(x, L=10):
    """Sin/cos positional pose encoding (VOFlowNet.py:173-177)."""
    c = (2.0 ** jnp.arange(L)) * jnp.pi
    y = c.reshape(1, -1, 1) * x[:, None, :]
    return jnp.concatenate([jnp.sin(y), jnp.cos(y)], axis=1).reshape(
        x.shape[0], -1)


class VOFlowRes(nn.Module):
    """Main pose head. Input NHWC (B, H, W, 4) = cat(flow, intrinsic layer).

    stereo=2.1/2.2 enables the multi-camera variant
    (VOFlowNet.py:196-218): separate AB/AC flow embeddings, an extrinsic
    encoder MLP (or sin/cos encoding), translation head over the fused
    features, rotation head over the AC embedding.
    """
    intrinsic: bool = True
    down_scale: bool = True
    config: int = 1
    stereo: float = 0
    extrinsic_encoder_layers: int = 2
    trans_head_layers: int = 3

    def _flatten(self, feat):
        # Flatten in torch NCHW order (VOFlowNet.py:190 x.view(B, -1)) so
        # imported Dense weights line up with the feature layout.
        if self.config == 3:
            feat = jnp.mean(feat, axis=(1, 2), keepdims=True)
        return jnp.moveaxis(feat, -1, 1).reshape(feat.shape[0], -1)

    @nn.compact
    def __call__(self, x, extrinsic=None):
        if self.stereo in (2.1, 2.2):
            return self._forward_multicam(x, extrinsic)

        feat = FeatureEmbedding(config=self.config, down_scale=self.down_scale,
                                name="feat_net")(x)
        feat = self._flatten(feat)

        t = LinearReLU(128, name="trans_fc1")(feat)
        t = LinearReLU(32, name="trans_fc2")(t)
        t = nn.Dense(3, name="trans_fc3")(t)

        r = LinearReLU(128, name="rot_fc1")(feat)
        r = LinearReLU(32, name="rot_fc2")(r)
        r = nn.Dense(3, name="rot_fc3")(r)

        return jnp.concatenate([t, r], axis=1)

    def _forward_multicam(self, x, extrinsic):
        x_AB = x[..., (0, 1, 4, 5)]
        x_AC = x[..., (2, 3, 4, 5)]

        feat_net = FeatureEmbedding(config=self.config,
                                    down_scale=self.down_scale,
                                    name="feat_net")
        if self.stereo == 2.2:
            feat_AB = FeatureEmbedding(config=self.config,
                                       down_scale=self.down_scale,
                                       name="feat_net2")(x_AB)
        else:
            feat_AB = feat_net(x_AB)
        feat_AC = feat_net(x_AC)
        feat_AB = self._flatten(feat_AB)
        feat_AC = self._flatten(feat_AC)

        if self.extrinsic_encoder_layers >= 1:
            e = LinearReLU(128, name="extrinsic_fc1")(extrinsic)
            for i in range(self.extrinsic_encoder_layers - 1):
                e = LinearReLU(128, name=f"extrinsic_fc{i + 2}")(e)
        else:
            e = _encode_pose_sincos(extrinsic)

        ab = LinearReLU(128, name="fcAB_trans")(feat_AB)
        ac = LinearReLU(128, name="fcAC_trans")(feat_AC)
        t = jnp.concatenate([ac, ab, e], axis=1)
        t = LinearReLU(128, name="trans_head_fc1")(t)
        for i in range(self.trans_head_layers - 3):
            t = LinearReLU(128, name=f"trans_head_mid{i}")(t)
        t = LinearReLU(32, name="trans_head_fc2")(t)
        t = nn.Dense(3, name="trans_head_fc3")(t)

        r = LinearReLU(128, name="rot_fc1")(feat_AC)
        r = LinearReLU(32, name="rot_fc2")(r)
        r = nn.Dense(3, name="rot_fc3")(r)
        return jnp.concatenate([t, r], axis=1)
