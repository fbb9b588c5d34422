"""PWC-DC optical-flow network for TPU.

TPU-native rebuild of ``PWCDCNet`` (Network/PWC/PWCNet.py:58-294): 6-level
siamese conv pyramid, per-level warp + local correlation (the reference's
CUDA kernel, here islam_tpu.ops.correlation) + DenseNet-style decoder +
deconv upsampling, and the dilated context refiner.  NHWC throughout; the
correlation/warp ops take NHWC directly so no layout shuffles hit the hot
path.  Outputs 5 scales of flow, finest first, matching PWCNet.py:291.
"""

from __future__ import annotations


import jax
import jax.numpy as jnp
from flax import linen as nn

from islam_tpu.models.layers import Conv2d, Conv2dP, ConvT2d, leaky_relu
from islam_tpu.ops.correlation import correlation
from islam_tpu.ops.warp import flow_warp


class ConvLeaky(nn.Module):
    features: int
    kernel_size: int = 3
    stride: int = 1
    padding: int = 1
    dilation: int = 1

    @nn.compact
    def __call__(self, x):
        x = Conv2dP(self.features, self.kernel_size, self.stride,
                    self.padding, self.dilation, name="conv")(x)
        return leaky_relu(x, 0.1)


def _corr_nhwc(f1, f2, md=4):
    """Correlation on NHWC tensors -> NHWC output with (2md+1)^2 channels."""
    out = correlation(jnp.moveaxis(f1, -1, 1), jnp.moveaxis(f2, -1, 1), md=md)
    return jnp.moveaxis(out, 1, -1)


def _warp_nhwc(x, flo):
    return jnp.moveaxis(
        flow_warp(jnp.moveaxis(x, -1, 1), jnp.moveaxis(flo, -1, 1)), 1, -1)


class PredictUncertainty(nn.Module):
    """predict_uncertainty (PWCNet.py:22-33): 3-conv funnel to 1 channel."""

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        x = leaky_relu(Conv2d(c // 2, 3, 1, 1, name="conv0")(x), 0.1)
        x = leaky_relu(Conv2d(c // 4, 3, 1, 1, name="conv1")(x), 0.1)
        return Conv2d(1, 3, 1, 1, name="conv2")(x)


class PWCDCNet(nn.Module):
    md: int = 4
    flow_norm: float = 20.0
    uncertainty: bool = False  # main path uses False (Network/VONet.py:10)
    # concat-free decoder: DenseNet concat chains evaluated as sliced-kernel
    # conv sums (identical math/params, no concat buffers materialized).
    # Perf experiment, docs/RESULTS.md "non-conv glue"; unsupported with
    # uncertainty heads (they reshape on channel counts).
    concat_free: bool = False

    def setup(self):
        # Siamese pyramid (PWCNet.py:78-95)
        chans = [(3, 16), (16, 16), (16, 16)]
        self.conv1a = ConvLeaky(16, 3, 2, 1)
        self.conv1aa = ConvLeaky(16, 3, 1, 1)
        self.conv1b = ConvLeaky(16, 3, 1, 1)
        self.conv2a = ConvLeaky(32, 3, 2, 1)
        self.conv2aa = ConvLeaky(32, 3, 1, 1)
        self.conv2b = ConvLeaky(32, 3, 1, 1)
        self.conv3a = ConvLeaky(64, 3, 2, 1)
        self.conv3aa = ConvLeaky(64, 3, 1, 1)
        self.conv3b = ConvLeaky(64, 3, 1, 1)
        self.conv4a = ConvLeaky(96, 3, 2, 1)
        self.conv4aa = ConvLeaky(96, 3, 1, 1)
        self.conv4b = ConvLeaky(96, 3, 1, 1)
        self.conv5a = ConvLeaky(128, 3, 2, 1)
        self.conv5aa = ConvLeaky(128, 3, 1, 1)
        self.conv5b = ConvLeaky(128, 3, 1, 1)
        self.conv6aa = ConvLeaky(196, 3, 2, 1)
        self.conv6a = ConvLeaky(196, 3, 1, 1)
        self.conv6b = ConvLeaky(196, 3, 1, 1)

        # Decoder blocks per level (PWCNet.py:107-153)
        def dec(name):
            return (
                ConvLeaky(128, 3, 1, 1, name=f"{name}_0"),
                ConvLeaky(128, 3, 1, 1, name=f"{name}_1"),
                ConvLeaky(96, 3, 1, 1, name=f"{name}_2"),
                ConvLeaky(64, 3, 1, 1, name=f"{name}_3"),
                ConvLeaky(32, 3, 1, 1, name=f"{name}_4"),
            )

        self.dec6 = dec("conv6")
        self.dec5 = dec("conv5")
        self.dec4 = dec("conv4")
        self.dec3 = dec("conv3")
        self.dec2 = dec("conv2")

        self.predict_flow6 = Conv2dP(2, 3, 1, 1, name="predict_flow6")
        self.predict_flow5 = Conv2dP(2, 3, 1, 1, name="predict_flow5")
        self.predict_flow4 = Conv2dP(2, 3, 1, 1, name="predict_flow4")
        self.predict_flow3 = Conv2dP(2, 3, 1, 1, name="predict_flow3")
        self.predict_flow2 = Conv2dP(2, 3, 1, 1, name="predict_flow2")
        if self.uncertainty:
            self.unc6 = PredictUncertainty(name="unc6")
            self.unc5 = PredictUncertainty(name="unc5")
            self.unc4 = PredictUncertainty(name="unc4")
            self.unc3 = PredictUncertainty(name="unc3")
            self.unc2 = PredictUncertainty(name="unc2")
            self.dc_unc7 = PredictUncertainty(name="dc_unc7")

        self.deconv6 = ConvT2d(2, 4, 2, 1)
        self.deconv5 = ConvT2d(2, 4, 2, 1)
        self.deconv4 = ConvT2d(2, 4, 2, 1)
        self.deconv3 = ConvT2d(2, 4, 2, 1)
        self.upfeat6 = ConvT2d(2, 4, 2, 1)
        self.upfeat5 = ConvT2d(2, 4, 2, 1)
        self.upfeat4 = ConvT2d(2, 4, 2, 1)
        self.upfeat3 = ConvT2d(2, 4, 2, 1)

        # Dilated context network (PWCNet.py:155-161)
        self.dc_conv1 = ConvLeaky(128, 3, 1, 1, 1)
        self.dc_conv2 = ConvLeaky(128, 3, 1, 2, 2)
        self.dc_conv3 = ConvLeaky(128, 3, 1, 4, 4)
        self.dc_conv4 = ConvLeaky(96, 3, 1, 8, 8)
        self.dc_conv5 = ConvLeaky(64, 3, 1, 16, 16)
        self.dc_conv6 = ConvLeaky(32, 3, 1, 1, 1)
        self.dc_conv7 = Conv2d(2, 3, 1, 1, name="dc_conv7")

    def _multi_scale_conv(self, blocks, x):
        """DenseNet-style concat chain (PWCNet.py:208-214).

        With ``concat_free`` the chain keeps the parts as a tuple and each
        block consumes them through sliced-kernel conv sums -- numerically
        conv(concat(parts)) with no concat buffer ever written."""
        if self.concat_free and not self.uncertainty:
            parts = list(x) if isinstance(x, tuple) else [x]
            for blk in blocks:
                parts.insert(0, blk(tuple(parts)))
            return tuple(parts)
        if isinstance(x, tuple):
            x = jnp.concatenate(x, axis=-1)
        for blk in blocks:
            x = jnp.concatenate([blk(x), x], axis=-1)
        return x

    def _level(self, pred, deconv, upfeat, feat_high, feat_low1, feat_low2,
               scale, unc=None):
        """concate_two_layers (PWCNet.py:216-233)."""
        flow_high = pred(feat_high)
        flow_unc = unc(feat_high) if unc is not None else None
        up_flow = deconv(flow_high)
        up_feat = upfeat(feat_high)
        warp_feat = _warp_nhwc(feat_low2, up_flow * scale)
        corr = leaky_relu(_corr_nhwc(feat_low1, warp_feat, self.md), 0.1)
        if self.concat_free and not self.uncertainty:
            return (corr, feat_low1, up_flow, up_feat), flow_high, flow_unc
        x = jnp.concatenate([corr, feat_low1, up_flow, up_feat], axis=-1)
        if flow_unc is not None:
            from islam_tpu.models.layers import resize_bilinear
            up_unc = resize_bilinear(
                flow_unc, (up_feat.shape[1], up_feat.shape[2]))
            x = jnp.concatenate([x, up_unc], axis=-1)
        return x, flow_high, flow_unc

    def _pyramid(self, im):
        c1 = self.conv1b(self.conv1aa(self.conv1a(im)))
        c2 = self.conv2b(self.conv2aa(self.conv2a(c1)))
        c3 = self.conv3b(self.conv3aa(self.conv3a(c2)))
        c4 = self.conv4b(self.conv4aa(self.conv4a(c3)))
        c5 = self.conv5b(self.conv5aa(self.conv5a(c4)))
        c6 = self.conv6b(self.conv6a(self.conv6aa(c5)))
        return c1, c2, c3, c4, c5, c6

    def __call__(self, x, shared_frames: bool = False):
        """x: (B, H, W, 6) = cat(img0, img1), or with ``shared_frames``
        (B+1, H, W, 3) consecutive frames -- the siamese pyramid is computed
        ONCE per frame and pairs are adjacent slices (saves ~44% of pyramid
        convs for the trainer's consecutive-pair windows).
        Returns ((flow2..flow6), uncs)."""
        if shared_frames:
            pyr = self._pyramid(x)
            c11, c12, c13, c14, c15, c16 = (c[:-1] for c in pyr)
            c21, c22, c23, c24, c25, c26 = (c[1:] for c in pyr)
        else:
            im1 = x[..., 0:3]
            im2 = x[..., 3:6]
            c11, c12, c13, c14, c15, c16 = self._pyramid(im1)
            c21, c22, c23, c24, c25, c26 = self._pyramid(im2)

        unc = [getattr(self, f"unc{i}", None) if self.uncertainty else None
               for i in (6, 5, 4, 3)]

        corr6 = leaky_relu(_corr_nhwc(c16, c26, self.md), 0.1)
        x = self._multi_scale_conv(self.dec6, corr6)
        x, flow6, unc6 = self._level(self.predict_flow6, self.deconv6,
                                     self.upfeat6, x, c15, c25, 0.625, unc[0])

        x = self._multi_scale_conv(self.dec5, x)
        x, flow5, unc5 = self._level(self.predict_flow5, self.deconv5,
                                     self.upfeat5, x, c14, c24, 1.25, unc[1])

        x = self._multi_scale_conv(self.dec4, x)
        x, flow4, unc4 = self._level(self.predict_flow4, self.deconv4,
                                     self.upfeat4, x, c13, c23, 2.5, unc[2])

        x = self._multi_scale_conv(self.dec3, x)
        x, flow3, unc3 = self._level(self.predict_flow3, self.deconv3,
                                     self.upfeat3, x, c12, c22, 5.0, unc[3])

        x = self._multi_scale_conv(self.dec2, x)
        flow2 = self.predict_flow2(x)
        unc2 = self.unc2(x) if self.uncertainty else None

        x = self.dc_conv4(self.dc_conv3(self.dc_conv2(self.dc_conv1(x))))
        x = self.dc_conv6(self.dc_conv5(x))
        refine = self.dc_conv7(x)
        flow2 = flow2 + refine

        if self.uncertainty:
            refine_unc = self.dc_unc7(x)
            unc2 = jnp.log(jnp.exp(unc2) + jnp.exp(refine_unc))

        return (flow2, flow3, flow4, flow5, flow6), \
            (unc2, unc3, unc4, unc5, unc6)


# ---------------------------------------------------------------------------
# Multi-scale flow supervision helpers (PWCNet.py:296-450).  Pure functions
# over NHWC arrays; ``criterion`` is e.g. lambda a, b: jnp.mean(abs(a - b)).
# ---------------------------------------------------------------------------

def scale_targetflow(targetflow, small_scale=False):
    """GT flow pyramid at the 5 prediction scales (PWCNet.py:296-308)."""
    from islam_tpu.models.layers import interpolate_scale

    target4 = targetflow if small_scale else interpolate_scale(
        targetflow, 0.25)
    targets = [target4]
    for _ in range(4):
        targets.append(interpolate_scale(targets[-1], 0.5))
    return targets


def scale_mask(mask, small_scale=False):
    """Occlusion-mask pyramid; True = supervise (PWCNet.py:310-332)."""
    from islam_tpu.models.layers import interpolate_scale

    m4 = mask if small_scale else interpolate_scale(mask, 0.25)
    masks = [m4]
    for _ in range(4):
        masks.append(interpolate_scale(masks[-1], 0.5))
    return [jnp.logical_or(m < 0.5, m > 1) for m in masks]


def calc_one_flow_loss(output, target, criterion, mask=None, unc=None,
                       lamb=1.0):
    """PWCNet.py:334-347: masked criterion, or the uncertainty-weighted L1."""
    if unc is None:
        if mask is not None:
            w = mask.astype(output.dtype)
            diff_ok = criterion(output * w, target * w)
            return diff_ok
        return criterion(output, target)
    diff = jnp.abs(output - target)
    loss_unc = jnp.mean(jnp.exp(-unc) * diff + unc * lamb)
    return loss_unc / (1.0 + lamb)


def calc_flow_loss(outputs, target, criterion, mask=None, uncs=None,
                   lamb=1.0, training=True):
    """Multi-scale training loss (PWCNet.py:404-450): mean over the 5 scales
    plus the finest-scale no-uncertainty loss."""
    small_scale = target.shape == outputs[0].shape
    if training:
        targets = scale_targetflow(target, small_scale)
        masks = ([None] * 5 if mask is None
                 else scale_mask(mask, small_scale))
        losses = []
        for k in range(5):
            unc_k = uncs[k] if uncs is not None else None
            losses.append(calc_one_flow_loss(
                outputs[k], targets[k], criterion, masks[k], unc_k, lamb))
        loss = sum(losses) / 5.0
        loss_nounc = calc_one_flow_loss(outputs[0], targets[0], criterion,
                                        masks[0], None, lamb)
        return loss, loss_nounc
    from islam_tpu.models.layers import interpolate_scale

    out4 = outputs[0] if small_scale else interpolate_scale(outputs[0], 4)
    unc4 = None
    if uncs is not None and uncs[0] is not None:
        unc4 = uncs[0] if small_scale else interpolate_scale(uncs[0], 4)
    valid = None if mask is None else (mask < 10)
    loss = calc_one_flow_loss(out4, target, criterion, valid, unc4, lamb)
    loss_nounc = calc_one_flow_loss(out4, target, criterion, valid, None,
                                    lamb)
    return loss, loss_nounc
