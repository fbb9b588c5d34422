"""Checkpoint machinery: key translation, orbax roundtrip."""

import jax.numpy as jnp
import numpy as np
import pytest

from islam_tpu.utils.checkpoints import (flax_path_to_torch_key,
                                         latest_checkpoint_step,
                                         restore_checkpoint, save_checkpoint,
                                         torch_value_to_flax)


class TestKeyTranslation:
    @pytest.mark.parametrize("path,expected", [
        # PWCNet (wrapped in VONet)
        (("params", "flowNet", "conv1a", "conv", "kernel"),
         "flowNet.conv1a.0.weight"),
        (("params", "flowNet", "conv6_3", "conv", "bias"),
         "flowNet.conv6_3.0.bias"),
        (("params", "flowNet", "predict_flow6", "kernel"),
         "flowNet.predict_flow6.weight"),
        (("params", "flowNet", "deconv6", "kernel"),
         "flowNet.deconv6.weight"),
        (("params", "flowNet", "dc_conv2", "conv", "kernel"),
         "flowNet.dc_conv2.0.weight"),
        # VOFlowNet
        (("params", "flowPoseNet", "feat_net", "head0", "conv", "kernel"),
         "flowPoseNet.feat_net.0.0.weight"),
        (("params", "flowPoseNet", "feat_net", "layer0_block0", "conv1",
          "conv", "kernel"),
         "flowPoseNet.feat_net.3.0.conv1.0.weight"),
        (("params", "flowPoseNet", "feat_net", "layer4_block2", "conv2",
          "bias"),
         "flowPoseNet.feat_net.7.2.conv2.bias"),
        (("params", "flowPoseNet", "feat_net", "layer1_block0", "downsample",
          "kernel"),
         "flowPoseNet.feat_net.4.0.downsample.weight"),
        (("params", "flowPoseNet", "trans_fc1", "fc", "kernel"),
         "flowPoseNet.voflow_trans.0.0.weight"),
        (("params", "flowPoseNet", "rot_fc3", "kernel"),
         "flowPoseNet.voflow_rot.2.weight"),
        # StereoNet
        (("params", "stereoNet", "feature_extraction", "firstconv_1", "conv",
          "kernel"),
         "stereoNet.feature_extraction.firstconv.2.0.weight"),
        (("batch_stats", "stereoNet", "feature_extraction", "firstconv_0",
          "bn", "mean"),
         "stereoNet.feature_extraction.firstconv.0.1.running_mean"),
        (("params", "stereoNet", "feature_extraction", "layer2_block1",
          "conv1", "bn", "scale"),
         "stereoNet.feature_extraction.layer2.1.conv1.0.1.weight"),
        (("params", "stereoNet", "feature_extraction", "branch3_conv", "conv",
          "kernel"),
         "stereoNet.feature_extraction.branch3.1.0.weight"),
        (("params", "stereoNet", "feature_extraction", "lastconv_1",
          "kernel"),
         "stereoNet.feature_extraction.lastconv.2.weight"),
        (("params", "stereoNet", "conv_c1", "up1", "conv2", "conv", "kernel"),
         "stereoNet.conv_c1.up1.conv2.conv.weight"),
        (("params", "stereoNet", "conv_c2_SSP", "branch1_conv", "kernel"),
         "stereoNet.conv_c2_SSP.branch1.1.weight"),
        (("params", "stereoNet", "deconv_c9", "kernel"),
         "stereoNet.deconv_c9.weight"),
    ])
    def test_mapping(self, path, expected):
        assert flax_path_to_torch_key(path) == expected

    def test_conv_transform(self):
        v = np.arange(2 * 3 * 3 * 3, dtype=np.float32).reshape(2, 3, 3, 3)
        out = torch_value_to_flax(("params", "x", "conv", "kernel"), v,
                                  (3, 3, 3, 2))
        assert out.shape == (3, 3, 3, 2)
        np.testing.assert_allclose(out[1, 2, 0, 1], v[1, 0, 1, 2])

    def test_deconv_transform_flip(self):
        v = np.arange(2 * 4 * 4 * 4, dtype=np.float32).reshape(2, 4, 4, 4)
        out = torch_value_to_flax(("params", "deconv6", "kernel"), v,
                                  (4, 4, 2, 4))
        np.testing.assert_allclose(out[0, 0, 1, 2], v[1, 2, 3, 3])

    def test_dense_transpose(self):
        v = np.arange(6, dtype=np.float32).reshape(2, 3)
        out = torch_value_to_flax(("params", "fc", "kernel"), v, (3, 2))
        np.testing.assert_allclose(out, v.T)


class TestOrbax:
    def test_roundtrip(self, tmp_path):
        tree = {"a": jnp.arange(5.0), "b": {"c": jnp.ones((2, 3))}}
        save_checkpoint(str(tmp_path), 3, tree)
        back = restore_checkpoint(str(tmp_path), 3, template=tree)
        np.testing.assert_allclose(np.asarray(back["a"]), np.arange(5.0))
        np.testing.assert_allclose(np.asarray(back["b"]["c"]), 1.0)
        assert latest_checkpoint_step(str(tmp_path), 10) == 3
        assert latest_checkpoint_step(str(tmp_path), 3) is None
