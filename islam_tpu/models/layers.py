"""Layer primitives with torch-equivalent semantics, NHWC layout for TPU.

The reference networks are plain PyTorch (Conv2d / ConvTranspose2d /
BatchNorm2d / bilinear interpolation).  These wrappers reproduce the exact
same math in NHWC so that (a) reference checkpoints import by transposing
weights and (b) XLA lays convolutions onto the MXU without layout shuffles.
"""

from __future__ import annotations

from typing import Any, Callable, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn


def leaky_relu(x, slope=0.1):
    return jnp.where(x >= 0, x, slope * x)


def Conv2d(features, kernel_size=3, stride=1, padding=0, dilation=1,
           use_bias=True, dtype=None, name=None):
    """torch.nn.Conv2d equivalent (NHWC). Returns a configured nn.Conv so
    parameters live directly at ``<name>/{kernel,bias}``."""
    k = kernel_size if isinstance(kernel_size, tuple) else (
        kernel_size, kernel_size)
    s = stride if isinstance(stride, tuple) else (stride, stride)
    p = padding if isinstance(padding, tuple) else (padding, padding)
    d = dilation if isinstance(dilation, tuple) else (dilation, dilation)
    return nn.Conv(
        features=features, kernel_size=k, strides=s,
        padding=[(p[0], p[0]), (p[1], p[1])], kernel_dilation=d,
        use_bias=use_bias, dtype=dtype,
        kernel_init=nn.initializers.kaiming_normal(),
        name=name)


class ConvT2d(nn.Module):
    """torch.nn.ConvTranspose2d equivalent (NHWC).

    Implemented as a fractionally-strided convolution:
        y = conv(dilate(x, s), flip(W), padding = k - 1 - p)
    Param ``kernel`` is stored pre-flipped in (H, W, I, O) so the forward is
    a single conv_general_dilated; the torch importer flips when converting.
    """
    features: int
    kernel_size: int = 4
    stride: int = 2
    padding: int = 1
    use_bias: bool = True
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        k, s, p = self.kernel_size, self.stride, self.padding
        in_ch = x.shape[-1]
        kernel = self.param(
            "kernel", nn.initializers.kaiming_normal(),
            (k, k, in_ch, self.features), jnp.float32)
        pad = k - 1 - p
        y = jax.lax.conv_general_dilated(
            x.astype(self.dtype or x.dtype),
            kernel.astype(self.dtype or x.dtype),
            window_strides=(1, 1),
            padding=((pad, pad), (pad, pad)),
            lhs_dilation=(s, s),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros,
                              (self.features,), jnp.float32)
            y = y + bias
        return y


def BatchNorm(use_running_average=False, momentum=0.9, epsilon=1e-5,
              name=None):
    """torch.nn.BatchNorm2d equivalent.

    The reference runs its frozen flow/stereo subnets in train() mode
    (TartanVO.py:91), i.e. batch statistics; ``use_running_average`` flips to
    imported running stats for eval parity.
    """
    return nn.BatchNorm(
        use_running_average=use_running_average,
        momentum=momentum, epsilon=epsilon,
        axis_name=None, name=name)


def max_pool(x, window=2, stride=None):
    stride = stride or window
    return nn.max_pool(x, (window, window), strides=(stride, stride),
                       padding="VALID")


def avg_pool(x, window, stride=None):
    stride = stride or window
    return nn.avg_pool(x, (window, window), strides=(stride, stride),
                       padding="VALID")


def resize_bilinear(x, out_hw, align_corners=False):
    """Bilinear resize of NHWC ``x`` to ``out_hw`` = (H', W').

    align_corners=False matches torch F.interpolate default (half-pixel
    centers, what jax.image.resize implements); align_corners=True matches
    the PSM feature pyramid (Network/PSM/submodule.py:131-143).
    """
    H, W = x.shape[1], x.shape[2]
    Ho, Wo = out_hw
    if not align_corners:
        # antialias=False matches torch F.interpolate(mode='bilinear'),
        # which never prefilters on downscale.
        return jax.image.resize(x, (x.shape[0], Ho, Wo, x.shape[3]),
                                method="bilinear", antialias=False)
    # align_corners=True: output i samples input at i*(H-1)/(H'-1)
    def coords(n_out, n_in):
        if n_out == 1:
            return jnp.zeros((1,), jnp.float32)
        return jnp.arange(n_out, dtype=jnp.float32) * ((n_in - 1) / (n_out - 1))

    fy = coords(Ho, H)
    fx = coords(Wo, W)
    y0 = jnp.clip(jnp.floor(fy), 0, H - 1)
    x0 = jnp.clip(jnp.floor(fx), 0, W - 1)
    y1 = jnp.clip(y0 + 1, 0, H - 1)
    x1 = jnp.clip(x0 + 1, 0, W - 1)
    wy = (fy - y0)[None, :, None, None]
    wx = (fx - x0)[None, None, :, None]
    y0i, y1i, x0i, x1i = (a.astype(jnp.int32) for a in (y0, y1, x0, x1))
    top = x[:, y0i][:, :, x0i] * (1 - wx) + x[:, y0i][:, :, x1i] * wx
    bot = x[:, y1i][:, :, x0i] * (1 - wx) + x[:, y1i][:, :, x1i] * wx
    return top * (1 - wy) + bot * wy


def interpolate_scale(x, scale, mode="bilinear"):
    """torch F.interpolate(scale_factor=...) equivalent for NHWC."""
    Ho = int(x.shape[1] * scale)
    Wo = int(x.shape[2] * scale)
    if mode == "nearest":
        return jax.image.resize(x, (x.shape[0], Ho, Wo, x.shape[3]),
                                method="nearest")
    return resize_bilinear(x, (Ho, Wo), align_corners=False)
