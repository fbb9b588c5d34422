"""Layer primitives with torch-equivalent semantics, NHWC layout for TPU.

The reference networks are plain PyTorch (Conv2d / ConvTranspose2d /
BatchNorm2d / bilinear interpolation).  These wrappers reproduce the exact
same math in NHWC so that (a) reference checkpoints import by transposing
weights and (b) XLA lays convolutions onto the MXU without layout shuffles.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
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


def _split_conv_sum(parts, kernel, conv_one):
    """conv(concat(parts, axis=-1)) == sum_i conv(part_i, kernel_slice_i).

    The input-channel axis of an HWIO ``kernel`` is sliced to each part's
    width, so a DenseNet-style concat chain never materializes the growing
    concat buffer (the 13 ms/step concat family in docs/RESULTS.md).
    """
    off = 0
    y = None
    for p in parts:
        c = p.shape[-1]
        kp = jax.lax.slice_in_dim(kernel, off, off + c, axis=2)
        t = conv_one(p, kp)
        y = t if y is None else y + t
        off += c
    return y


class PartsConv(nn.Module):
    """nn.Conv-compatible 2-D conv that also accepts a TUPLE of
    channel-parts, evaluating conv(concat(parts)) as a sum of sliced-kernel
    convs with no concat materialized.  Parameter names and shapes are
    identical to Conv2d's nn.Conv (``kernel`` (kh, kw, in, out) + ``bias``),
    so torch checkpoint import is unaffected."""

    features: int
    kernel_size: tuple = (3, 3)
    stride: tuple = (1, 1)
    padding: tuple = (1, 1)
    dilation: tuple = (1, 1)
    use_bias: bool = True
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        parts = x if isinstance(x, (list, tuple)) else (x,)
        in_ch = sum(p.shape[-1] for p in parts)
        kh, kw = self.kernel_size
        kernel = self.param("kernel", nn.initializers.kaiming_normal(),
                            (kh, kw, in_ch, self.features), jnp.float32)
        bias = (self.param("bias", nn.initializers.zeros,
                           (self.features,), jnp.float32)
                if self.use_bias else None)
        dt = self.dtype or parts[0].dtype
        kernel = kernel.astype(dt)
        p0, p1 = self.padding

        def conv_one(p, kp):
            return jax.lax.conv_general_dilated(
                p.astype(dt), kp, window_strides=self.stride,
                padding=((p0, p0), (p1, p1)), rhs_dilation=self.dilation,
                dimension_numbers=("NHWC", "HWIO", "NHWC"))

        y = _split_conv_sum(parts, kernel, conv_one)
        if bias is not None:
            y = y + bias.astype(dt)
        return y


def Conv2dP(features, kernel_size=3, stride=1, padding=0, dilation=1,
            use_bias=True, dtype=None, name=None):
    """Conv2d twin built on PartsConv (tuple-input capable)."""
    t = lambda v: v if isinstance(v, tuple) else (v, v)  # noqa: E731
    return PartsConv(features=features, kernel_size=t(kernel_size),
                     stride=t(stride), padding=t(padding),
                     dilation=t(dilation), use_bias=use_bias, dtype=dtype,
                     name=name)


class ConvT2d(nn.Module):
    """torch.nn.ConvTranspose2d equivalent (NHWC).

    Implemented as a fractionally-strided convolution:
        y = conv(dilate(x, s), flip(W), padding = k - 1 - p)
    Param ``kernel`` is stored pre-flipped in (H, W, I, O) so the forward is
    a single conv_general_dilated; the torch importer flips when converting.
    Accepts a tuple of channel-parts like PartsConv.

    ``out_stride`` = n > 1 computes ONLY the output rows/cols at positions
    0, n, 2n, ... (exactly ``full_output[::n, ::n]``) without materializing
    the full-resolution output.  Because a stride-s transposed conv's output
    at position m uses only the kernel taps t with t % s == pad % s when
    m % s == 0, the subsampled output is an ordinary strided conv over the
    un-dilated input with the spatially sliced kernel — 1/n^2 of the work.
    Used by StereoNet7's quarter-res disparity head (the trainer consumes
    disp only through a x4 nearest downsample, reference VONet.py:34).
    Requires out_stride % stride == 0.
    """
    features: int
    kernel_size: int = 4
    stride: int = 2
    padding: int = 1
    use_bias: bool = True
    dtype: Any = None
    out_stride: int = 1

    @nn.compact
    def __call__(self, x):
        parts = x if isinstance(x, (list, tuple)) else (x,)
        k, s, p = self.kernel_size, self.stride, self.padding
        in_ch = sum(q.shape[-1] for q in parts)
        kernel = self.param(
            "kernel", nn.initializers.kaiming_normal(),
            (k, k, in_ch, self.features), jnp.float32)
        pad = k - 1 - p
        dt = self.dtype or parts[0].dtype

        if self.out_stride > 1:
            os_ = self.out_stride
            assert os_ % s == 0, (os_, s)
            # full_out[m] = sum_t dilate(x,s)[m + t - pad] * K[t]; at
            # m = os*i only taps with (os*i + t - pad) % s == 0 hit real
            # (non-inserted-zero) input samples: t % s == pad % s.  Those
            # taps read consecutive input positions (os//s)*i + (t-pad)//s.
            t0 = pad % s
            taps = list(range(t0, k, s))
            ke = len(taps)
            st = os_ // s
            pb = max(0, -((taps[0] - pad) // s))  # left zero-pad
            kernel = kernel[t0::s, t0::s]

            def conv_one(q, kp):
                # True transposed-conv output size is (in-1)*s - 2p + k;
                # the subsampled head keeps ceil(full/os) rows/cols.  (The
                # earlier in*s//os shortcut over-counts when 2p > k - s.)
                n_out = tuple(-(-((sz - 1) * s - 2 * p + k) // os_)
                              for sz in q.shape[1:3])
                # Right zero-pad: the last output's window spans padded
                # positions [st*(n-1), st*(n-1)+ke), so the padded length
                # pb+sz+pr must reach st*(n-1)+ke (e.g. k=5, s=2, p=2,
                # out_stride=2 genuinely needs pr=1); without it the conv
                # comes up short of full_output[::n].
                pr = tuple(max(0, st * (n - 1) + ke - pb - sz)
                           for n, sz in zip(n_out, q.shape[1:3]))
                y = jax.lax.conv_general_dilated(
                    q.astype(dt), kp.astype(dt),
                    window_strides=(st, st),
                    padding=((pb, pr[0]), (pb, pr[1])),
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                )
                assert y.shape[1:3] == n_out, (y.shape, n_out, ke, pb, pr)
                return y
        else:
            def conv_one(q, kp):
                return jax.lax.conv_general_dilated(
                    q.astype(dt), kp.astype(dt),
                    window_strides=(1, 1),
                    padding=((pad, pad), (pad, pad)),
                    lhs_dilation=(s, s),
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                )

        y = _split_conv_sum(parts, kernel, conv_one)
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros,
                              (self.features,), jnp.float32)
            y = y + bias.astype(dt)
        return y


class ConvT3d(nn.Module):
    """torch.nn.ConvTranspose3d equivalent (NDHWC).

    Fractionally-strided conv of the pre-flipped kernel, with torch's
    ``output_padding`` realized as extra right-side padding:
        out = (in-1)*s - 2p + k + op
    Used by the PSMNet 3-D hourglasses (stackhourglass.py:25-29:
    k=3, s=2, p=1, output_padding=1).
    """
    features: int
    kernel_size: int = 3
    stride: int = 2
    padding: int = 1
    output_padding: int = 1
    use_bias: bool = True
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        k, s, p = self.kernel_size, self.stride, self.padding
        in_ch = x.shape[-1]
        kernel = self.param(
            "kernel", nn.initializers.kaiming_normal(),
            (k, k, k, in_ch, self.features), jnp.float32)
        lo = k - 1 - p
        hi = lo + self.output_padding
        y = jax.lax.conv_general_dilated(
            x.astype(self.dtype or x.dtype),
            kernel.astype(self.dtype or x.dtype),
            window_strides=(1, 1, 1),
            padding=((lo, hi),) * 3,
            lhs_dilation=(s, s, s),
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
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


def _interp_matrix(n_in: int, n_out: int, align_corners: bool) -> np.ndarray:
    """Static (n_out, n_in) bilinear interpolation matrix.

    Resizes become two small matmuls on the MXU instead of gathers -- XLA
    lowers fancy-index gathers to serial while-loops on TPU, which profiling
    showed dominating the step (8 ms per resize in the PSM pyramid).
    """
    m = np.zeros((n_out, n_in), np.float32)
    if n_out == 1:
        m[0, 0] = 1.0
        return m
    for i in range(n_out):
        if align_corners:
            f = i * (n_in - 1) / (n_out - 1)
        else:
            f = (i + 0.5) * n_in / n_out - 0.5
        f = min(max(f, 0.0), n_in - 1)
        lo = int(np.floor(f))
        hi = min(lo + 1, n_in - 1)
        w = f - lo
        m[i, lo] += 1.0 - w
        m[i, hi] += w
    return m


def _upsample2x_bilinear(x):
    """Exact x2 bilinear upsample (torch F.interpolate align_corners=False
    half-pixel semantics, including the edge clamp) as ONE depthwise
    fractionally-strided conv: edge-pad by 1, lhs_dilation=2, fixed 4-tap
    kernel [.25,.75,.75,.25] (outer product in 2-D).

    out[2i] = .25 x[i-1] + .75 x[i]; out[2i+1] = .75 x[i] + .25 x[i+1]
    (clamped), which is what the half-pixel source grid f = m/2 - 1/4
    evaluates to.  Stays in native NHWC — the einsum-matmul form forces
    XLA:TPU layout copies on both passes (the 'copy' family in
    docs/RESULTS.md), which for a bandwidth-bound op costs more than the
    whole resize."""
    B, H, W, C = x.shape
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="edge")
    k1 = np.asarray([0.25, 0.75, 0.75, 0.25], np.float32)
    k = jnp.asarray(np.outer(k1, k1).reshape(4, 4, 1, 1), x.dtype)
    k = jnp.broadcast_to(k, (4, 4, 1, C))
    return jax.lax.conv_general_dilated(
        xp, k, window_strides=(1, 1), padding=((0, 0), (0, 0)),
        lhs_dilation=(2, 2), dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=C)


def _resize_bilinear_matmul(x, out_hw, align_corners):
    """General-ratio path: two static-matrix contractions on the MXU."""
    H, W = x.shape[1], x.shape[2]
    Ho, Wo = out_hw
    my = jnp.asarray(_interp_matrix(H, Ho, align_corners), x.dtype)
    mx = jnp.asarray(_interp_matrix(W, Wo, align_corners), x.dtype)
    out = jnp.einsum("oh,bhwc->bowc", my, x)
    return jnp.einsum("pw,bowc->bopc", mx, out)


def resize_bilinear(x, out_hw, align_corners=False):
    """Bilinear resize of NHWC ``x`` to ``out_hw`` = (H', W').

    align_corners=False matches torch F.interpolate default (half-pixel
    centers, no antialias prefilter); align_corners=True matches the PSM
    feature pyramid (Network/PSM/submodule.py:131-143).  Exact x2 / x1/2
    half-pixel resizes take layout-native paths (depthwise dilated conv /
    2x2 average pool — both identical math to the general path); other
    ratios are two static-matrix contractions (MXU-friendly, no gathers).
    """
    H, W = x.shape[1], x.shape[2]
    Ho, Wo = out_hw
    if (Ho, Wo) == (H, W):
        return x
    if not align_corners:
        if (Ho, Wo) == (2 * H, 2 * W):
            return _upsample2x_bilinear(x)
        if (H, W) == (2 * Ho, 2 * Wo):
            # Half-pixel x1/2: every output is the mean of its 2x2 block.
            return nn.avg_pool(x, (2, 2), strides=(2, 2), padding="VALID")
    return _resize_bilinear_matmul(x, out_hw, align_corners)


def interpolate_scale(x, scale, mode="bilinear"):
    """torch F.interpolate(scale_factor=...) equivalent for NHWC."""
    Ho = int(x.shape[1] * scale)
    Wo = int(x.shape[2] * scale)
    if mode == "nearest":
        return jax.image.resize(x, (x.shape[0], Ho, Wo, x.shape[3]),
                                method="nearest")
    return resize_bilinear(x, (Ho, Wo), align_corners=False)
