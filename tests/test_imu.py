"""IMU preintegration vs analytic constant-rate trajectories (SURVEY.md sec 4)."""

import jax
import jax.numpy as jnp
import numpy as np
from scipy.spatial.transform import Rotation as R

from islam_tpu import lie
from islam_tpu.imu.preintegrator import IMUState, preintegrate
from islam_tpu.imu.module import IMUModule


def make_init(pos=(0, 0, 0), rot=(0, 0, 0, 1), vel=(0, 0, 0)):
    return IMUState(pos=jnp.asarray(pos, jnp.float32),
                    rot=jnp.asarray(rot, jnp.float32),
                    vel=jnp.asarray(vel, jnp.float32))


class TestPreintegrate:
    def test_static_freefall(self):
        """Zero inputs, gravity g: pure free fall."""
        S = 100
        dts = jnp.full((S,), 0.01)
        zeros = jnp.zeros((S, 3))
        out = preintegrate(dts, zeros, zeros, make_init(), gravity=9.81)
        t = 1.0
        np.testing.assert_allclose(np.asarray(out.vel[-1]), [0, 0, -9.81 * t],
                                   atol=1e-4)
        np.testing.assert_allclose(np.asarray(out.pos[-1]),
                                   [0, 0, -0.5 * 9.81 * t ** 2], atol=1e-3)

    def test_stationary_with_gravity_compensation(self):
        """Accelerometer reading +g cancels gravity: stays put."""
        S = 50
        dts = jnp.full((S,), 0.01)
        acc = jnp.tile(jnp.asarray([[0.0, 0.0, 9.81]]), (S, 1))
        out = preintegrate(dts, jnp.zeros((S, 3)), acc, make_init(), 9.81)
        np.testing.assert_allclose(np.asarray(out.pos[-1]), 0, atol=1e-5)
        np.testing.assert_allclose(np.asarray(out.vel[-1]), 0, atol=1e-5)

    def test_constant_rotation_rate(self):
        """Constant omega: final rotation = Exp(omega * t)."""
        S = 200
        dt = 0.005
        omega = np.asarray([0.3, -0.2, 0.5], np.float32)
        dts = jnp.full((S,), dt)
        gyro = jnp.tile(jnp.asarray(omega)[None], (S, 1))
        out = preintegrate(dts, gyro, jnp.zeros((S, 3)), make_init(), 0.0)
        q = np.asarray(out.rot[-1])
        q_ref = R.from_rotvec(omega * S * dt).as_quat()
        sign = np.sign(np.dot(q, q_ref))
        np.testing.assert_allclose(q, q_ref * sign, atol=1e-4)

    def test_constant_acceleration_straight_line(self):
        S = 100
        dt = 0.01
        a = np.asarray([1.0, 0.0, 0.0], np.float32)
        dts = jnp.full((S,), dt)
        acc = jnp.tile(jnp.asarray(a)[None], (S, 1))
        out = preintegrate(dts, jnp.zeros((S, 3)), acc, make_init(), 0.0)
        t = S * dt
        np.testing.assert_allclose(np.asarray(out.vel[-1]), a * t, atol=1e-4)
        # Discrete sum matches the exact ZOH formula (not 0.5 a t^2 exactly)
        np.testing.assert_allclose(np.asarray(out.pos[-1]),
                                   0.5 * a * t ** 2, atol=1e-2)

    def test_valid_mask_no_ops(self):
        S = 20
        dts = jnp.full((S,), 0.01)
        rng = np.random.default_rng(1)
        gyro = jnp.asarray(rng.normal(size=(S, 3)), jnp.float32)
        acc = jnp.asarray(rng.normal(size=(S, 3)), jnp.float32)
        valid = jnp.asarray([True] * 10 + [False] * 10)
        out_masked = preintegrate(dts, gyro, acc, make_init(), 9.81, valid)
        out_short = preintegrate(dts[:10], gyro[:10], acc[:10], make_init(), 9.81)
        np.testing.assert_allclose(np.asarray(out_masked.pos[9]),
                                   np.asarray(out_short.pos[-1]), atol=1e-6)
        # Padded tail: dt=0 no-ops keep the state frozen.
        np.testing.assert_allclose(np.asarray(out_masked.pos[-1]),
                                   np.asarray(out_masked.pos[9]), atol=1e-6)


class TestIMUModule:
    def _make_module(self, n_frames=10, hz=10, denoise_params=None):
        rng = np.random.default_rng(42)
        S = n_frames * hz
        accels = rng.normal(size=(S, 3)).astype(np.float32) * 0.1
        accels[:, 2] += 9.81  # gravity compensation
        gyros = rng.normal(size=(S, 3)).astype(np.float32) * 0.05
        dts = np.full((S - 1,), 1.0 / hz / 1.0, np.float32) * 0.1 * hz / hz
        dts = np.full((S - 1,), 0.01, np.float32)
        sync = np.arange(n_frames) * hz
        init = {"pos": np.zeros(3), "rot": np.asarray([0, 0, 0, 1.0]),
                "vel": np.zeros(3)}
        return IMUModule(accels, gyros, dts, init=init, gravity=9.81,
                         rgb2imu_sync=sync, denoise_params=denoise_params,
                         batch_frames=8)

    def test_world_and_motion_consistency(self):
        m = self._make_module()
        pos, rot, _, vel = m.integrate(0, 8, motion_mode=False)
        dpos, drot, _, dvel = m.integrate(0, 8, motion_mode=True)
        assert pos.shape == (9, 3) and rot.shape == (9, 4)
        assert dpos.shape == (8, 3) and drot.shape == (8, 4)
        # drot chains back to absolute rotation
        q = np.asarray(rot[0])
        for i in range(8):
            q = np.asarray(lie.quat_mul(jnp.asarray(q), drot[i]))
        qa = np.asarray(rot[-1])
        sign = np.sign(np.dot(q, qa))
        np.testing.assert_allclose(q, qa * sign, atol=1e-4)
        # dvel sums to total velocity change
        np.testing.assert_allclose(np.asarray(jnp.sum(dvel, axis=0)),
                                   np.asarray(vel[-1] - vel[0]), atol=1e-4)

    def test_per_frame_matches_loop(self):
        """Window scan == frame-by-frame integration with threaded state."""
        m = self._make_module()
        pos, rot, _, vel = m.integrate(0, 8, motion_mode=False)
        # Manually integrate frame by frame
        from islam_tpu.imu.preintegrator import preintegrate as pre
        state = IMUState(pos=jnp.zeros(3), rot=jnp.asarray([0, 0, 0, 1.0]),
                         vel=jnp.zeros(3))
        for i in range(8):
            sl = slice(i * 10, (i + 1) * 10)
            out = pre(m.dts[sl], m.gyros[sl], m.accels[sl], state, 9.81)
            state = IMUState(pos=out.pos[-1], rot=out.rot[-1], vel=out.vel[-1])
            np.testing.assert_allclose(np.asarray(pos[i + 1]),
                                       np.asarray(state.pos), atol=1e-4)
            np.testing.assert_allclose(np.asarray(vel[i + 1]),
                                       np.asarray(state.vel), atol=1e-4)

    def test_denoiser_grad_flows(self):
        from islam_tpu.imu import denoiser as dn
        params = dn.init_params(jax.random.PRNGKey(0))
        m = self._make_module(denoise_params=params)

        def loss_fn(p):
            out = m.integrate_both(0, 8, denoise_params=p)
            return jnp.sum(out["dvel"] ** 2) + jnp.sum(out["drot"][:, :3] ** 2)

        g = jax.grad(loss_fn)(params)
        from jax.flatten_util import ravel_pytree
        flat, _ = ravel_pytree(g)
        assert np.all(np.isfinite(np.asarray(flat)))
        assert float(jnp.sum(jnp.abs(flat))) > 0
