"""IMU integration module: denoise + preintegrate over RGB-aligned windows.

TPU-native rebuild of ``IMUModule`` (imu_integrator.py:31-164).  The reference
loops over RGB frames calling the PyPose preintegrator per frame and shipping
each result to the host; here the full window is integrated by one scan
(islam_tpu.imu.preintegrator) inside jit, and BOTH output modes
(imu_integrator.py:70-78) are derived from the same scan:

- world mode:  absolute (pos, rot, vel) at each frame end, init state first.
- motion mode: per-frame-pair deltas
    drot[i] = rot[i]^-1 * rot[i+1]                (relative rot in frame i)
    dvel[i] = vel[i+1] - vel[i]                   (world-frame delta velocity)
    dpos[i] = pos[i+1] - pos[i] - vel[i] * T_i    (accel-only translation)
  which equal the reference's zero-init-per-frame integration algebraically.

Frames with no IMU samples reproduce imu_integrator.py:134-140: world-mode
velocity is zeroed, motion-mode pos/vel deltas are zero, rotation carries.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from islam_tpu import lie
from islam_tpu.imu import denoiser as dn
from islam_tpu.imu.preintegrator import IMUState, preintegrate


@functools.partial(jax.jit, static_argnames=("denoise_accel", "denoise_gyro"))
def integrate_window(denoise_params: Optional[Dict[str, Any]],
                     dts: jax.Array, gyros: jax.Array, accels: jax.Array,
                     n_valid: jax.Array, frame_ends: jax.Array,
                     has_frame: jax.Array, init: IMUState,
                     gravity: jax.Array,
                     accel_bias: jax.Array, gyro_bias: jax.Array,
                     subtract_bias: jax.Array,
                     denoise_accel: bool = True, denoise_gyro: bool = True):
    """Jitted core. All arrays padded to a fixed sample count S.

    Args:
        denoise_params: denoiser pytree or None (bias-subtraction path).
        dts/gyros/accels: (S,)/(S,3)/(S,3), zero-padded past ``n_valid``.
        n_valid: scalar int, true sample count.
        frame_ends: (B+1,) index of last sample of each frame prefix, i.e.
            frame_ends[i] = sync[st+i] - sync[st] - 1 for i in 0..B
            (frame_ends[0] = -1 selects the init state).
        has_frame: (B,) bool, frame i has >= 1 sample.
        init: world IMUState at window start.
        subtract_bias: scalar bool; enables the optm_bias path
            (imu_integrator.py:101-105).

    Returns dict with world-mode (pos, rot, vel) of shape (B+1, .) and
    motion-mode (dpos, drot, dvel) of shape (B, .).
    """
    valid = jnp.arange(dts.shape[0]) < n_valid

    sb = jnp.asarray(subtract_bias, accels.dtype)
    if denoise_accel:
        accels = accels - sb * accel_bias[None, :]
    if denoise_gyro:
        gyros = gyros - sb * gyro_bias[None, :]
    accels = accels * valid[:, None].astype(accels.dtype)
    gyros = gyros * valid[:, None].astype(gyros.dtype)

    if denoise_params is not None:
        d_acc, d_gyro = dn.denoise(denoise_params, accels, gyros, n_valid)
        if denoise_accel:
            accels = d_acc
        if denoise_gyro:
            gyros = d_gyro
        accels = accels * valid[:, None].astype(accels.dtype)
        gyros = gyros * valid[:, None].astype(gyros.dtype)

    states = preintegrate(dts, gyros, accels, init, gravity, valid=valid)

    # Gather per-frame-boundary states (frame_ends[0] = -1 -> init).
    full_pos = jnp.concatenate([init.pos[None], states.pos], axis=0)
    full_rot = jnp.concatenate([init.rot[None], states.rot], axis=0)
    full_vel = jnp.concatenate([init.vel[None], states.vel], axis=0)
    idx = frame_ends + 1
    pos = full_pos[idx]  # (B+1, 3)
    rot = full_rot[idx]
    vel = full_vel[idx]

    # Frame durations T_i for the accel-only translation.
    cum_t = jnp.concatenate([jnp.zeros((1,), dts.dtype),
                             jnp.cumsum(dts * valid.astype(dts.dtype))])
    t_bound = cum_t[idx]
    frame_T = t_bound[1:] - t_bound[:-1]

    drot = lie.quat_mul(lie.quat_conj(rot[:-1]), rot[1:])
    dvel = vel[1:] - vel[:-1]
    dpos = pos[1:] - pos[:-1] - vel[:-1] * frame_T[:, None]

    # Empty frames: world vel zeroed (imu_integrator.py:140); deltas are
    # already zero because consecutive frame_ends coincide.
    hf = has_frame.astype(vel.dtype)[:, None]
    vel = vel.at[1:].set(vel[1:] * hf)

    return {
        "pos": pos, "rot": rot, "vel": vel,
        "dpos": dpos, "drot": drot, "dvel": dvel,
    }


class IMUModule:
    """Host-side wrapper holding full-sequence IMU tensors on device.

    Mirrors the reference constructor signature (imu_integrator.py:32-66) with
    ``denoise_params`` (a pytree) in place of a torch checkpoint path.
    """

    def __init__(self, accels, gyros, dts, accel_bias=None, gyro_bias=None,
                 init=None, gravity=9.81007, rgb2imu_sync=None,
                 denoise_params=None, denoise_accel=True, denoise_gyro=True,
                 max_window_samples=None, batch_frames=8):
        self._accels_np = np.asarray(accels, np.float32)
        self._gyros_np = np.asarray(gyros, np.float32)
        self.accels = jnp.asarray(self._accels_np)
        self.gyros = jnp.asarray(self._gyros_np)
        dts = np.asarray(dts, np.float32).reshape(-1)
        # dts may be one shorter than samples (np.diff); pad with last value.
        if dts.shape[0] < self._accels_np.shape[0]:
            dts = np.concatenate([dts, dts[-1:]])
        self._dts_np = dts
        self.dts = jnp.asarray(dts)
        self.gravity = jnp.asarray(float(gravity), jnp.float32)

        n = self.accels.shape[0]
        if rgb2imu_sync is None:
            self.rgb2imu_sync = np.arange(n)
        else:
            self.rgb2imu_sync = np.asarray(rgb2imu_sync)

        self.accel_bias = jnp.asarray(
            np.zeros(3) if accel_bias is None else np.asarray(accel_bias),
            jnp.float32)
        self.gyro_bias = jnp.asarray(
            np.zeros(3) if gyro_bias is None else np.asarray(gyro_bias),
            jnp.float32)

        self.denoise_params = denoise_params
        self.denoise_accel = denoise_accel
        self.denoise_gyro = denoise_gyro
        self.use_denoise_model = denoise_params is not None and (
            denoise_accel or denoise_gyro)
        # optm_bias path active when no denoiser given (imu_integrator.py:52)
        self.optm_bias = (not self.use_denoise_model) and (
            denoise_accel or denoise_gyro)

        self.default_init = init

        # Static padded window size: max samples across batch windows.
        if max_window_samples is None:
            sync = self.rgb2imu_sync
            spans = [sync[min(i + batch_frames, len(sync) - 1)] - sync[i]
                     for i in range(0, max(1, len(sync) - 1))]
            max_window_samples = int(max(spans)) + 1 if spans else 16
        # Round up to a multiple of the denoiser token for tidy shapes.
        self.S = int(-(-max_window_samples // dn.TOKEN) * dn.TOKEN)

    def _parse_init(self, init, motion_mode):
        """Mirrors prase_init (imu_integrator.py:11-28)."""
        if init is None:
            return IMUState(pos=jnp.zeros(3), rot=jnp.asarray([0., 0., 0., 1.]),
                            vel=jnp.zeros(3))
        rot = jnp.asarray(np.asarray(init["rot"]), jnp.float32)
        if motion_mode:
            return IMUState(pos=jnp.zeros(3), rot=rot, vel=jnp.zeros(3))
        return IMUState(pos=jnp.asarray(np.asarray(init["pos"]), jnp.float32),
                        rot=rot,
                        vel=jnp.asarray(np.asarray(init["vel"]), jnp.float32))

    def window_inputs(self, st: int, end: int):
        """Build fixed-shape padded inputs for frames [st, end]."""
        sync = self.rgb2imu_sync
        i0 = int(sync[st])
        i1 = int(sync[end])
        n_valid = i1 - i0
        S = self.S
        assert n_valid <= S, f"window {n_valid} exceeds padded size {S}"

        def pad(x, fill=0.0):
            x = np.asarray(x)
            out = np.full((S,) + x.shape[1:], fill, dtype=np.float32)
            out[:n_valid] = x[:n_valid]
            return jnp.asarray(out)

        dts = pad(self._dts_np[i0:i1])
        gyros = pad(self._gyros_np[i0:i1])
        accels = pad(self._accels_np[i0:i1])

        frame_ends = np.asarray(
            [int(sync[i]) - i0 - 1 for i in range(st, end + 1)], np.int32)
        has_frame = frame_ends[1:] > frame_ends[:-1]
        return (dts, gyros, accels, jnp.asarray(n_valid),
                jnp.asarray(frame_ends), jnp.asarray(has_frame))

    def integrate(self, st: int, end: int, init=None, motion_mode=False):
        """Reference-shaped API (imu_integrator.py:69-164).

        Returns (poses, rots, covs, vels); world mode shapes (B+1, .), motion
        mode shapes (B, .), with rots as quaternion arrays (x, y, z, w).
        """
        out = self.integrate_both(st, end, init)
        if motion_mode:
            return out["dpos"], out["drot"], [], out["dvel"]
        return out["pos"], out["rot"], [], out["vel"]

    def integrate_both(self, st: int, end: int, init=None,
                       denoise_params="module"):
        """Single scan producing both world and motion modes."""
        dts, gyros, accels, n_valid, frame_ends, has_frame = (
            self.window_inputs(st, end))
        init_state = self._parse_init(
            init if init is not None else self.default_init, motion_mode=False)
        params = (self.denoise_params if denoise_params == "module"
                  else denoise_params)
        return integrate_window(
            params, dts, gyros, accels, n_valid, frame_ends, has_frame,
            init_state, self.gravity, self.accel_bias, self.gyro_bias,
            jnp.asarray(self.optm_bias),
            denoise_accel=self.denoise_accel, denoise_gyro=self.denoise_gyro)
