"""islam_tpu: a TPU-native (JAX/XLA/Pallas) visual-inertial SLAM framework.

A ground-up rebuild of the capabilities of sair-lab/iSLAM (RA-L 2024,
arXiv 2306.07894) designed for TPU hardware: the learned stereo VO front-end
(PWC-Net optical flow, StereoNet disparity, VOFlowNet pose head), the IMU
denoising + preintegration stack, and the pose-velocity graph optimization
(PVGO) back-end solved by Levenberg-Marquardt on the SE(3) manifold -- all as
pure, jittable JAX programs, with Pallas kernels on the hot path and
shard_map-based scale-out across a device mesh.
"""

__version__ = "0.1.0"

from islam_tpu import lie
from islam_tpu.lie import SE3, SO3
