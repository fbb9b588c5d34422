"""PSMNet stereo alternates (basic + stacked-hourglass) for TPU.

Rebuild of the reference's unused-but-exported stereo variants
(Network/PSM/{basic,stackhourglass}.py, exported via PSM/__init__.py:1-3):
shift-based 3D cost volume, 3D conv hourglasses, soft-argmin disparity
regression.  Layout NDHWC for 3D convs (disparity is the depth axis).  The
cost volume is built with static shifts + where-masking rather than in-place
index writes (stackhourglass.py:117-126), which XLA fuses into one kernel.
"""

from __future__ import annotations


import jax
import jax.numpy as jnp
from flax import linen as nn

from islam_tpu.models.layers import ConvT3d, _interp_matrix
from islam_tpu.models.stereonet import FeatureExtraction


def ConvBN3d(features, kernel_size=3, stride=1, pad=1, use_bias=False,
             train=True, name=None):
    class _CB(nn.Module):
        @nn.compact
        def __call__(self, x):
            y = nn.Conv(features, (kernel_size,) * 3,
                        strides=(stride,) * 3,
                        padding=[(pad, pad)] * 3, use_bias=use_bias,
                        name="conv")(x)
            return nn.BatchNorm(use_running_average=not train,
                                momentum=0.9, epsilon=1e-5, name="bn")(y)
    return _CB(name=name)


def build_cost_volume(ref_fea: jax.Array, target_fea: jax.Array,
                      maxdisp4: int) -> jax.Array:
    """Shift-based concat cost volume.

    ref/target: (B, H, W, C); output (B, D, H, W, 2C) where channel block 0
    is the reference features and block 1 the target shifted right by d
    (both zeroed for x < d), matching stackhourglass.py:117-126.
    """
    B, H, W, C = ref_fea.shape
    slices = []
    for d in range(maxdisp4):
        if d == 0:
            s = jnp.concatenate([ref_fea, target_fea], axis=-1)
        else:
            ref_s = jnp.pad(ref_fea[:, :, d:], ((0, 0), (0, 0), (d, 0), (0, 0)))
            tgt_s = jnp.pad(target_fea[:, :, :-d],
                            ((0, 0), (0, 0), (d, 0), (0, 0)))
            s = jnp.concatenate([ref_s, tgt_s], axis=-1)
        slices.append(s)
    return jnp.stack(slices, axis=1)  # (B, D, H, W, 2C)


def disparity_regression(prob: jax.Array, maxdisp: int) -> jax.Array:
    """Soft-argmin (submodule.py:56-64). prob: (B, D, H, W) softmaxed."""
    disp = jnp.arange(maxdisp, dtype=prob.dtype).reshape(1, maxdisp, 1, 1)
    return jnp.sum(prob * disp, axis=1, keepdims=True)


def _trilinear_resize(x, out_dhw, align_corners=False):
    """(B, D, H, W, C) trilinear resize as three static-matrix contractions
    (MXU-friendly, no gathers).  align_corners=False matches stackhourglass's
    F.interpolate default (stackhourglass.py:146-160); True matches basic.py's
    F.upsample(align_corners=True) (basic.py:87)."""
    D, H, W = x.shape[1], x.shape[2], x.shape[3]
    Do, Ho, Wo = out_dhw
    dt = x.dtype
    if Do != D:
        x = jnp.einsum("od,bdhwc->bohwc",
                       jnp.asarray(_interp_matrix(D, Do, align_corners), dt), x)
    if Ho != H:
        x = jnp.einsum("oh,bdhwc->bdowc",
                       jnp.asarray(_interp_matrix(H, Ho, align_corners), dt), x)
    if Wo != W:
        x = jnp.einsum("ow,bdhwc->bdhoc",
                       jnp.asarray(_interp_matrix(W, Wo, align_corners), dt), x)
    return x


class Hourglass3D(nn.Module):
    """stackhourglass.py:10-50."""
    inplanes: int
    train: bool = True

    @nn.compact
    def __call__(self, x, presqu, postsqu):
        t = self.train
        p2 = self.inplanes * 2
        out = nn.relu(ConvBN3d(p2, 3, 2, 1, train=t, name="conv1")(x))
        pre = ConvBN3d(p2, 3, 1, 1, train=t, name="conv2")(out)
        pre = nn.relu(pre + postsqu) if postsqu is not None else nn.relu(pre)

        out = nn.relu(ConvBN3d(p2, 3, 2, 1, train=t, name="conv3")(pre))
        out = nn.relu(ConvBN3d(p2, 3, 1, 1, train=t, name="conv4")(out))

        def deconv3d(feat, features, name):
            # torch ConvTranspose3d(k=3, s=2, p=1, output_padding=1, bias=F)
            y = ConvT3d(features, 3, 2, 1, output_padding=1, use_bias=False,
                        name=name + "_conv")(feat)
            return nn.BatchNorm(use_running_average=not t, momentum=0.9,
                                epsilon=1e-5, name=name + "_bn")(y)

        post = deconv3d(out, p2, "conv5")
        post = nn.relu(post + presqu) if presqu is not None else nn.relu(
            post + pre)
        out = deconv3d(post, self.inplanes, "conv6")
        return out, pre, post


class PSMNetStackHourglass(nn.Module):
    """stackhourglass.py:52-176. Input (B, H, W, 6) stacked L/R."""
    maxdisp: int = 192
    train_bn: bool = True
    training_mode: bool = False

    @nn.compact
    def __call__(self, x):
        t = self.train_bn
        B, H, W, C = x.shape
        x1 = jnp.moveaxis(x.reshape(B, H, W, 2, C // 2), 3, 1)
        x1 = x1.reshape(B * 2, H, W, C // 2)
        feat = FeatureExtraction(last_planes=32, bigger=False, middleblock=16,
                                 train=t, name="feature_extraction")(x1)
        h4, w4, f = feat.shape[1], feat.shape[2], feat.shape[3]
        feat = feat.reshape(B, 2, h4, w4, f)
        ref, target = feat[:, 0], feat[:, 1]

        D4 = self.maxdisp // 4
        cost = build_cost_volume(ref, target, D4)  # (B, D4, h4, w4, 64)

        def seq(x, name):
            y = nn.relu(ConvBN3d(32, 3, 1, 1, train=t, name=name + "_0")(x))
            return ConvBN3d(32, 3, 1, 1, train=t, name=name + "_1")(y)

        cost0 = nn.relu(ConvBN3d(32, 3, 1, 1, train=t, name="dres0_0")(cost))
        cost0 = nn.relu(ConvBN3d(32, 3, 1, 1, train=t, name="dres0_1")(cost0))
        cost0 = seq(cost0, "dres1") + cost0

        out1, pre1, post1 = Hourglass3D(32, t, name="dres2")(cost0, None, None)
        out1 = out1 + cost0
        out2, pre2, post2 = Hourglass3D(32, t, name="dres3")(out1, pre1, post1)
        out2 = out2 + cost0
        out3, pre3, post3 = Hourglass3D(32, t, name="dres4")(out2, pre1, post2)
        out3 = out3 + cost0

        def classif(x, name):
            y = nn.relu(ConvBN3d(32, 3, 1, 1, train=t, name=name + "_0")(x))
            return nn.Conv(1, (3, 3, 3), padding=[(1, 1)] * 3, use_bias=False,
                           name=name + "_1")(y)

        cost1 = classif(out1, "classif1")
        cost2 = classif(out2, "classif2") + cost1
        cost3 = classif(out3, "classif3") + cost2

        def predict(c):
            c = _trilinear_resize(c, (self.maxdisp, H, W))[..., 0]
            prob = jax.nn.softmax(c, axis=1)
            return disparity_regression(prob, self.maxdisp)

        if self.training_mode:
            return (predict(cost1), predict(cost2), predict(cost3)), None
        return predict(cost3), None


class PSMNetBasic(nn.Module):
    """basic.py:10-107. Inputs are separate left/right images (B, H, W, 3)."""
    maxdisp: int = 192
    train_bn: bool = True

    @nn.compact
    def __call__(self, left, right):
        t = self.train_bn
        B, H, W, _ = left.shape
        feat = FeatureExtraction(last_planes=32, bigger=False, middleblock=16,
                                 train=t, name="feature_extraction")
        ref = feat(left)
        target = feat(right)

        D4 = self.maxdisp // 4
        cost = build_cost_volume(ref, target, D4)

        def seq(x, name):
            y = nn.relu(ConvBN3d(32, 3, 1, 1, train=t, name=name + "_0")(x))
            return ConvBN3d(32, 3, 1, 1, train=t, name=name + "_1")(y)

        cost0 = nn.relu(ConvBN3d(32, 3, 1, 1, train=t, name="dres0_0")(cost))
        cost0 = nn.relu(ConvBN3d(32, 3, 1, 1, train=t, name="dres0_1")(cost0))
        for name in ("dres1", "dres2", "dres3", "dres4"):
            cost0 = seq(cost0, name) + cost0

        y = nn.relu(ConvBN3d(32, 3, 1, 1, train=t, name="classify_0")(cost0))
        cost = nn.Conv(1, (3, 3, 3), padding=[(1, 1)] * 3, use_bias=False,
                       name="classify_1")(y)
        # basic.py:87 upsamples with align_corners=True
        cost = _trilinear_resize(cost, (self.maxdisp, H, W),
                                 align_corners=True)[..., 0]
        prob = jax.nn.softmax(cost, axis=1)
        return disparity_regression(prob, self.maxdisp)
