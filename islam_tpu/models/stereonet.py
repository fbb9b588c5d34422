"""StereoNet7 disparity network + PSM submodules for TPU.

TPU-native rebuild of ``StereoNet7`` (Network/StereoNet7.py:54-167) and the
PSM pieces it uses: ``feature_extraction`` (Network/PSM/submodule.py:66-155),
``Hourglass`` (Network/PSM/hourglass.py:54-77) and the SSP pooling block
(StereoNet7.py:16-51).  NHWC.  The reference's batch-doubling trick
(StereoNet7.py:96-98) -- running the shared feature extractor on stacked L/R
images -- is kept: it turns two small convs into one bigger, MXU-friendlier
one.
"""

from __future__ import annotations


import jax
import jax.numpy as jnp
from flax import linen as nn

from islam_tpu.models.layers import (BatchNorm, Conv2d, Conv2dP, ConvT2d,
                                     avg_pool, max_pool, resize_bilinear)


class ConvBN(nn.Module):
    """PSM convbn (submodule.py:10-13): conv (no bias) + BatchNorm."""
    features: int
    kernel_size: int = 3
    stride: int = 1
    pad: int = 1
    dilation: int = 1
    train: bool = True

    @nn.compact
    def __call__(self, x):
        pad = self.dilation if self.dilation > 1 else self.pad
        x = Conv2d(self.features, self.kernel_size, self.stride, pad,
                   self.dilation, use_bias=False, name="conv")(x)
        return BatchNorm(use_running_average=not self.train, name="bn")(x)


class PSMBasicBlock(nn.Module):
    """PSM BasicBlock (submodule.py:22-43)."""
    planes: int
    stride: int
    downsample: bool
    pad: int = 1
    dilation: int = 1
    train: bool = True

    @nn.compact
    def __call__(self, x):
        out = nn.relu(ConvBN(self.planes, 3, self.stride, self.pad,
                             self.dilation, self.train, name="conv1")(x))
        out = ConvBN(self.planes, 3, 1, self.pad, self.dilation, self.train,
                     name="conv2")(out)
        if self.downsample:
            x = Conv2d(self.planes, 1, self.stride, 0, use_bias=False,
                       name="downsample_conv")(x)
            x = BatchNorm(use_running_average=not self.train,
                          name="downsample_bn")(x)
        return out + x


class FeatureExtraction(nn.Module):
    """PSM feature_extraction (submodule.py:66-155) with bigger=True,
    last_planes=64, middleblock=3 as used by StereoNet7 (StereoNet7.py:59).
    Returns a 1/2-scale feature map."""
    last_planes: int = 64
    bigger: bool = True
    middleblock: int = 3
    train: bool = True

    @nn.compact
    def __call__(self, x):
        t = self.train
        x = nn.relu(ConvBN(32, 3, 2, 1, 1, t, name="firstconv_0")(x))
        x = nn.relu(ConvBN(32, 3, 1, 1, 1, t, name="firstconv_1")(x))
        out = nn.relu(ConvBN(32, 3, 1, 1, 1, t, name="firstconv_2")(x))

        def layer(x, planes, blocks, stride, name):
            inp = x.shape[-1]
            down = stride != 1 or inp != planes
            x = PSMBasicBlock(planes, stride, down, 1, 1, t,
                              name=f"{name}_block0")(x)
            for bi in range(1, blocks):
                x = PSMBasicBlock(planes, 1, False, 1, 1, t,
                                  name=f"{name}_block{bi}")(x)
            return x

        output_0 = layer(out, 32, 3, 1, "layer1")
        output_raw = layer(output_0, 64, self.middleblock, 2, "layer2")
        output = layer(output_raw, 128, 3, 1, "layer3")
        output_skip = layer(output, 128, 3, 1, "layer4")

        th, tw = output_skip.shape[1], output_skip.shape[2]

        def branch(x, pool, name):
            # Clamp pool windows so sub-448x640 inputs (tests, dry runs)
            # remain valid; at the reference resolution this is a no-op.
            b = avg_pool(x, min(pool, x.shape[1], x.shape[2]))
            b = nn.relu(ConvBN(32, 1, 1, 0, 1, t, name=f"{name}_conv")(b))
            return resize_bilinear(b, (th, tw), align_corners=True)

        b1 = branch(output_skip, 64, "branch1")
        b2 = branch(output_skip, 32, "branch2")
        b3 = branch(output_skip, 16, "branch3")
        b4 = branch(output_skip, 8, "branch4")

        feat = jnp.concatenate([output_raw, output_skip, b4, b3, b2, b1],
                               axis=-1)
        if self.bigger:
            feat = resize_bilinear(feat, (th * 2, tw * 2), align_corners=True)
            feat = jnp.concatenate([feat, output_0], axis=-1)

        feat = nn.relu(ConvBN(128, 3, 1, 1, 1, t, name="lastconv_0")(feat))
        feat = Conv2d(self.last_planes, 1, 1, 0, use_bias=False,
                      name="lastconv_1")(feat)
        return feat


class HGConv(nn.Module):
    """hourglass.py Conv (bias=True, optional relu; bn unused here)."""
    features: int
    kernel_size: int = 3
    relu: bool = True

    @nn.compact
    def __call__(self, x):
        p = (self.kernel_size - 1) // 2
        x = Conv2d(self.features, self.kernel_size, 1, p, name="conv")(x)
        if self.relu:
            x = nn.relu(x)
        return x


class Residual(nn.Module):
    """hourglass.py:27-52."""
    out_dim: int

    @nn.compact
    def __call__(self, x):
        inp_dim = x.shape[-1]
        if inp_dim != self.out_dim:
            residual = HGConv(self.out_dim, 1, relu=False,
                              name="skip_layer")(x)
        else:
            residual = x
        out = nn.relu(x)
        out = HGConv(self.out_dim // 2, 1, relu=False, name="conv1")(out)
        out = nn.relu(out)
        out = HGConv(self.out_dim // 2, 3, relu=False, name="conv2")(out)
        out = nn.relu(out)
        out = HGConv(self.out_dim, 1, relu=False, name="conv3")(out)
        return out + residual


class Hourglass(nn.Module):
    """hourglass.py:54-77 (recursive, bilinear upsample)."""
    n: int
    f: int
    increase: int = 0

    @nn.compact
    def __call__(self, x):
        nf = self.f + self.increase
        up1 = Residual(nf, name="up1")(x)
        pool1 = max_pool(up1, 2)
        if self.n > 1:
            low2 = Hourglass(self.n - 1, nf, 0, name="low2")(pool1)
        else:
            low2 = Residual(nf, name="low2")(pool1)
        low3 = Residual(nf, name="low3")(low2)
        up2 = resize_bilinear(low3, (up1.shape[1], up1.shape[2]),
                              align_corners=False)
        return up1 + up2


class SSP(nn.Module):
    """StereoNet7.py:16-51 spatial pyramid pooling."""

    @nn.compact
    def __call__(self, x):
        th, tw = x.shape[1], x.shape[2]
        quarter = x.shape[-1] // 4

        def branch(pool, name):
            b = avg_pool(x, min(pool, x.shape[1], x.shape[2]))
            b = nn.relu(Conv2d(quarter, 1, 1, 0, name=f"{name}_conv")(b))
            return resize_bilinear(b, (th, tw), align_corners=False)

        b1 = branch(64, "branch1")
        b2 = branch(32, "branch2")
        b3 = branch(16, "branch3")
        b4 = branch(8, "branch4")
        return jnp.concatenate([x, b4, b3, b2, b1], axis=-1)


class StereoNet7(nn.Module):
    """Input (B, H, W, 6) = cat(img0_norm, img0_r_norm); output full-res
    disparity (B, H, W, 1).

    ``quarter_output`` computes the head only at rows/cols 0, 4, 8, ... --
    bit-identical to ``full_disp[:, ::4, ::4]``, which is exactly torch's
    ``F.interpolate(scale_factor=0.25, mode='nearest')`` of the full output
    (reference VONet.py:34, the only way the trainer consumes disparity).
    Skips 15/16 of the final deconv + head convs and the full-res buffers.
    Parameter tree is identical to the full-res module."""
    train_bn: bool = True
    quarter_output: bool = False

    @nn.compact
    def __call__(self, x):
        B, H, W, C = x.shape
        assert C % 2 == 0
        # Batch-doubling trick (StereoNet7.py:96-98): shared extractor on
        # the stacked L/R halves, block order like torch's cat((l, r), 0).
        x1 = jnp.concatenate([x[..., :C // 2], x[..., C // 2:]], axis=0)
        x1 = FeatureExtraction(train=self.train_bn,
                               name="feature_extraction")(x1)
        # conv_c0 consumes cat(l_feat, r_feat, x2) along channels
        # (StereoNet7.py:99-101); feeding the three as channel-parts of a
        # sliced-kernel conv (kernel ranges [0:f], [f:2f], [2f:2f+C]) avoids
        # materializing the (B, h, w, 2f) channel interleave — two ~147 MB
        # layout copies per step at the bench shapes.  Identical math and
        # identical 'kernel' parameter, so torch import is unaffected.
        x2 = resize_bilinear(x, (H // 2, W // 2), align_corners=False)
        x = Conv2dP(64, 3, 1, 1, name="conv_c0")((x1[:B], x1[B:], x2))
        cat0 = Hourglass(2, 64, 0, name="conv_c1")(x)           # 1/2 - 64
        x = Hourglass(2, 64, 0, name="conv_c2")(cat0)           # 1/2
        x = max_pool(x, 2)                                      # 1/4 - 64
        cat1 = SSP(name="conv_c2_SSP")(x)                       # 1/4 - 128
        x = Hourglass(2, 128, 64, name="conv_c3")(cat1)         # 1/4 -> 192
        cat2 = max_pool(x, 2)                                   # 1/8 - 192
        x = Hourglass(2, 192, 64, name="conv_c4")(cat2)         # -> 256
        cat3 = max_pool(x, 2)                                   # 1/16 - 256
        x = nn.relu(Conv2d(384, 3, 1, 1, name="conv_c5")(cat3))
        cat4 = max_pool(x, 2)                                   # 1/32 - 384
        x = nn.relu(Conv2d(512, 3, 1, 1, name="conv_c6")(cat4))
        x = max_pool(x, 2)                                      # 1/64 - 512
        x = nn.relu(Conv2d(512, 3, 1, 1, name="conv_c6_2")(x))

        x = nn.relu(ConvT2d(512, 4, 2, 1, name="deconv_c7_2")(x))   # 1/32
        x = jnp.concatenate([x, cat4], axis=-1)                     # 896
        x = nn.relu(ConvT2d(320, 4, 2, 1, name="deconv_c7")(x))     # 1/16
        x = jnp.concatenate([x, cat3], axis=-1)                     # 576
        x = nn.relu(ConvT2d(192, 4, 2, 1, name="deconv_c8")(x))     # 1/8
        x = Hourglass(2, 192, 0, name="conv_c8")(x)
        x = jnp.concatenate([x, cat2], axis=-1)                     # 384
        x = nn.relu(ConvT2d(128, 4, 2, 1, name="deconv_c9")(x))     # 1/4
        x = Hourglass(2, 128, 0, name="conv_c9")(x)
        x = jnp.concatenate([x, cat1], axis=-1)                     # 256
        x = nn.relu(ConvT2d(64, 4, 2, 1, name="deconv_c10")(x))     # 1/2
        x = Hourglass(2, 64, 0, name="conv_c10")(x)
        x = jnp.concatenate([x, cat0], axis=-1)                     # 128
        out_stride = 4 if self.quarter_output else 1
        x = nn.relu(ConvT2d(64, 4, 2, 1, out_stride=out_stride,
                            name="deconv_c11")(x))                  # 1/1 (or
        # only positions 0 mod 4 of it when quarter_output)
        x = nn.relu(Conv2d(16, 1, 1, 0, name="conv_c12")(x))
        out0 = Conv2d(1, 1, 1, 0, name="conv_c13")(x)
        return out0, None


def stereo_loss(output, target, criterion, mask=None, unc=None, lamb=1.0):
    """Disparity supervision (StereoNet7.py:148-167): masked criterion or
    the uncertainty-weighted L1; returns (loss_unc_or_plain, plain_or_None)."""
    if mask is not None:
        w = mask.astype(output.dtype)
        output = output * w
        target = target * w
        if unc is not None:
            unc = unc * w
    if unc is None:
        return criterion(output, target), None
    diff = jnp.abs(output - target)
    loss_unc = jnp.mean(jnp.exp(-unc) * diff + unc * lamb)
    return loss_unc / (1.0 + lamb), jnp.mean(diff)
