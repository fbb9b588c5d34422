"""bf16 mixed-precision path: numerically close to f32, same structure."""

import jax
import jax.numpy as jnp
import numpy as np

from islam_tpu import testing
from islam_tpu.models import tartanvo as tvo

H, W, B = 64, 128, 2


class TestBF16Forward:
    def test_motion_close_to_f32(self):
        ds = testing.make_dataset(num_frames=B + 1, height=H, width=W)
        from islam_tpu.data.dataset import collate
        sample = collate([ds[i] for i in range(B)])
        batch = testing.device_batch(sample, 0)
        variables = tvo.init_params(jax.random.PRNGKey(0), H, W)
        baseline = jnp.linalg.norm(batch["extrinsic"][:, :3], axis=1)

        def fwd(bf16):
            res = tvo.forward(
                variables, batch["img0"], batch["img1"], batch["img0_norm"],
                batch["img0_r_norm"], batch["intrinsic"],
                batch["intrinsic_calib"], baseline,
                gt_motion=batch["motion"], frames=batch.get("frames"),
                datatype="kitti", correct_scale=True,
                use_kitti_coord=True, is_train=True, bf16=bf16)
            return np.asarray(res["motion"])

        m32 = fwd(False)
        m16 = fwd(True)
        assert m16.dtype == np.float32  # cast back before geometry
        # rotations are tiny for an untrained net: absolute tolerance works
        np.testing.assert_allclose(m16, m32, atol=2e-2)
