"""VONet composite: flow + stereo + pose head.

TPU-native rebuild of ``VONet`` (Network/VONet.py:5-39): PWC flow on
cat(img0, img1) taking the finest scale, StereoNet on the normalized stereo
pair with the 1/4 nearest downsampling (VONet.py:34) folded into the
stereo head as a strided evaluation, then the pose head on cat(flow,
intrinsic layer).  NHWC.  Parameter freezing (``fix_parts``) is handled at
the optimizer level (islam_tpu.train builds the trainable mask), matching
the reference's requires_grad_(False) scheme (VONet.py:20-26).
"""

from __future__ import annotations


import jax.numpy as jnp
from flax import linen as nn

from islam_tpu.models.pwcnet import PWCDCNet
from islam_tpu.models.stereonet import StereoNet7
from islam_tpu.models.voflownet import VOFlowRes


class VONet(nn.Module):
    train_bn: bool = True
    concat_free: bool = False  # PWC decoder without concat buffers
    # Run the (always-frozen-in-the-presets) StereoNet's BatchNorms in
    # eval mode even while training: running-average BN is a constant
    # per-channel affine that XLA fuses into the conv epilogue, removing
    # the batch-statistics reduction passes over the big (H/2, W/2)
    # feature maps.  Deliberate deviation from the reference, which calls
    # .train() on the whole vonet so even frozen subnets use batch
    # statistics (TartanVO.py:91); see docs/PARITY.md.
    frozen_bn_eval: bool = False

    def setup(self):
        self.flowNet = PWCDCNet(concat_free=self.concat_free)
        # quarter_output: the head is evaluated only at the 1/4-res sample
        # positions -- bit-identical to torch's
        # F.interpolate(disp, scale_factor=0.25, mode='nearest')
        # (reference VONet.py:34) of the full-res output, at 1/16 the
        # deconv/head cost and without the full-res buffers.
        self.stereoNet = StereoNet7(
            train_bn=self.train_bn and not self.frozen_bn_eval,
            quarter_output=True)
        self.flowPoseNet = VOFlowRes(intrinsic=True, down_scale=True,
                                     config=1, stereo=0)

    def __call__(self, img0, img1, img0_norm, img0_r_norm, intrinsic,
                 frames=None):
        """All inputs NHWC; intrinsic is the 1/4-scale 2-channel ray map.
        With ``frames`` (B+1, H, W, 3) of consecutive frames, the flow
        pyramid is shared across adjacent pairs (img0/img1 ignored by the
        flow net).

        Returns (flow (B,h,w,2) at 1/4 res, disp (B,h,w,1) at 1/4 res,
        pose (B,6) normalized).
        """
        if frames is not None:
            flows, _ = self.flowNet(frames, shared_frames=True)
        else:
            flows, _ = self.flowNet(jnp.concatenate([img0, img1], axis=-1))
        flow = flows[0]

        # Already 1/4 res: quarter_output samples positions 0 mod 4, the
        # exact pixels torch nearest-downsampling would keep (VONet.py:34).
        disp, _ = self.stereoNet(
            jnp.concatenate([img0_norm, img0_r_norm], axis=-1))

        x = jnp.concatenate([flow, intrinsic], axis=-1)
        pose = self.flowPoseNet(x)
        return flow, disp, pose
