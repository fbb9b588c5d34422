"""Data layer: loaders (on-disk fixtures), transforms, dataset, native preproc."""

import os

import numpy as np
import pytest

from islam_tpu.data.transforms import (Compose, CropCenter, DownscaleFlow,
                                       Normalize, ToNHWCTensor)

from tests.rng_helpers import PerTestRNG

RNG = PerTestRNG(51)
MEAN = [0.485, 0.456, 0.406]
STD = [0.229, 0.224, 0.225]


def make_tartanair_fixture(root, n=6, h=96, w=128):
    import cv2
    import yaml

    os.makedirs(f"{root}/image_left", exist_ok=True)
    os.makedirs(f"{root}/image_right", exist_ok=True)
    os.makedirs(f"{root}/imu", exist_ok=True)
    for i in range(n):
        img = RNG.integers(0, 255, (h, w, 3), np.uint8)
        cv2.imwrite(f"{root}/image_left/{i:06d}.png", img)
        cv2.imwrite(f"{root}/image_right/{i:06d}.png", img)
    poses = np.concatenate(
        [RNG.normal(size=(n, 3)),
         np.tile([0, 0, 0, 1.0], (n, 1))], axis=1)
    np.savetxt(f"{root}/pose_left.txt", poses)
    S = n * 10
    np.save(f"{root}/imu/acc_nograv_body.npy",
            RNG.normal(size=(S, 3)).astype(np.float32))
    np.save(f"{root}/imu/gyro.npy", RNG.normal(size=(S, 3)).astype(np.float32))
    np.save(f"{root}/imu/vel_global.npy",
            RNG.normal(size=(S, 3)).astype(np.float32))
    with open(f"{root}/imu/parameter.yaml", "w") as f:
        yaml.dump({"acc_zero_bias": [0.01, 0.02, 0.03],
                   "gyro_zero_bias": [0.001, 0.002, 0.003]}, f)


class TestTartanAirLoader:
    def test_load_and_get_pair(self, tmp_path):
        root = str(tmp_path / "P000")
        make_tartanair_fixture(root)

        from islam_tpu.data.dataset import TrajFolderDataset

        transform = Compose([
            CropCenter((64, 96), fix_ratio=True),
            DownscaleFlow(),
            Normalize(mean=MEAN, std=STD, keep_old=True),
            ToNHWCTensor(),
        ])
        ds = TrajFolderDataset(root, "tartanair", transform=transform)
        # end_frame=-1 drops the last frame (reference semantics,
        # TrajFolderDataset.py:357-358): 6 images -> 5 frames -> 4 links
        assert len(ds) == 4
        assert ds.has_imu
        assert ds.gravity == 0.0
        np.testing.assert_allclose(ds.accel_bias, [0.01, 0.02, 0.03])
        s = ds[0]
        assert s["img0"].shape == (64, 96, 3)
        assert s["img0_norm"].shape == (64, 96, 3)
        assert s["intrinsic"].shape == (16, 24, 2)
        assert s["motion"].shape == (7,)
        assert s["link"].tolist() == [0, 1]
        # normalized image consistency
        back = s["img0_norm"] * np.asarray(STD) + np.asarray(MEAN)
        np.testing.assert_allclose(back, s["img0"], atol=1e-5)

    def test_frame_range_imu_realignment(self, tmp_path):
        root = str(tmp_path / "P001")
        make_tartanair_fixture(root, n=8)
        from islam_tpu.data.dataset import TrajFolderDataset

        ds = TrajFolderDataset(root, "tartanair", start_frame=2, end_frame=6)
        assert ds.num_img == 4
        assert ds.rgb2imu_sync[0] == 0  # realigned to window start
        assert len(ds.accels) == ds.rgb2imu_sync[-1] + 1


def make_euroc_fixture(root, n=5, h=96, w=128):
    import cv2
    import yaml

    ts = (np.arange(n) * 50 + 1000) * int(1e6)  # ns, 20 Hz
    for cam in ("cam0", "cam1"):
        os.makedirs(f"{root}/{cam}/data", exist_ok=True)
        with open(f"{root}/{cam}/data.csv", "w") as f:
            f.write("#timestamp,filename\n")
            for t in ts:
                f.write(f"{t},{t}.png\n")
                img = RNG.integers(0, 255, (h, w, 3), np.uint8)
                cv2.imwrite(f"{root}/{cam}/data/{t}.png", img)
        K = [100.0, 100.0, w / 2, h / 2]
        T = np.eye(4)
        if cam == "cam1":
            T[0, 3] = 0.11  # baseline
        with open(f"{root}/{cam}/sensor.yaml", "w") as f:
            yaml.dump({"intrinsics": K,
                       "distortion_coefficients": [0.0, 0.0, 0.0, 0.0],
                       "T_BS": {"data": T.reshape(-1).tolist()}}, f)

    os.makedirs(f"{root}/state_groundtruth_estimate0", exist_ok=True)
    with open(f"{root}/state_groundtruth_estimate0/data.csv", "w") as f:
        f.write("#ts," + ",".join(f"c{i}" for i in range(16)) + "\n")
        for i, t in enumerate(ts):
            pos = [i * 0.1, 0, 0]
            quat_wxyz = [1.0, 0, 0, 0]
            vel = [1.0, 0, 0]
            bg = [0.001, 0.002, 0.003]
            ba = [0.01, 0.02, 0.03]
            row = [t] + pos + quat_wxyz + vel + bg + ba
            f.write(",".join(str(x) for x in row) + "\n")

    os.makedirs(f"{root}/imu0", exist_ok=True)
    ts_imu = (np.arange(n * 10) * 5 + 1000) * int(1e6)  # 200 Hz
    with open(f"{root}/imu0/data.csv", "w") as f:
        f.write("#ts,wx,wy,wz,ax,ay,az\n")
        for t in ts_imu:
            f.write(f"{t},0.01,0.02,0.03,0.1,0.2,9.9\n")
    T_BI = np.eye(4)
    with open(f"{root}/imu0/sensor.yaml", "w") as f:
        yaml.dump({"T_BS": {"data": T_BI.reshape(-1).tolist()}}, f)


class TestEuRoCLoader:
    def test_load(self, tmp_path):
        root = str(tmp_path / "mav0")
        make_euroc_fixture(root)
        from islam_tpu.data.dataset import TrajFolderDataset

        ds = TrajFolderDataset(root, "euroc")
        assert ds.num_img == 4  # end_frame=-1 drops the last frame (reference semantics)
        assert ds.has_imu
        assert ds.require_undistort  # stereo rectification active
        np.testing.assert_allclose(ds.accel_bias, [0.01, 0.02, 0.03],
                                   atol=1e-6)
        assert abs(ds.rgb_dts[0] - 0.05) < 1e-6
        s = ds[0]
        assert s["img0"][0].shape[-1] == 3


def make_kitti_fixture(root, n=5, h=96, w=128, hz_ratio=2):
    """date_dir/drive_sync layout with calib files + oxts packets."""
    import cv2
    import datetime as dt

    date_dir = os.path.dirname(root)
    os.makedirs(date_dir, exist_ok=True)
    with open(f"{date_dir}/calib_cam_to_cam.txt", "w") as f:
        f.write("R_rect_00: 1 0 0 0 1 0 0 0 1\n")
        f.write(f"P_rect_02: 100 0 {w/2} -10 0 100 {h/2} 0 0 0 1 0\n")
        f.write(f"P_rect_03: 100 0 {w/2} -60 0 100 {h/2} 0 0 0 1 0\n")
    with open(f"{date_dir}/calib_velo_to_cam.txt", "w") as f:
        f.write("R: 1 0 0 0 1 0 0 0 1\nT: 0.1 -0.05 -0.3\n")
    with open(f"{date_dir}/calib_imu_to_velo.txt", "w") as f:
        f.write("R: 1 0 0 0 1 0 0 0 1\nT: -0.8 0.3 0.8\n")

    n_imu = n * hz_ratio

    def write_ts(sub, count, period):
        os.makedirs(f"{root}/{sub}", exist_ok=True)
        with open(f"{root}/{sub}/timestamps.txt", "w") as f:
            base = dt.datetime(2011, 9, 30, 12, 0, 0)
            for i in range(count):
                t = base + dt.timedelta(seconds=i * period)
                f.write(t.strftime("%Y-%m-%d %H:%M:%S.%f") + "000\n")

    write_ts("oxts", n_imu, 0.05)
    write_ts("image_02", n, 0.1)
    write_ts("image_03", n, 0.1)

    os.makedirs(f"{root}/oxts/data", exist_ok=True)
    for i in range(n_imu):
        pkt = np.zeros(30)
        pkt[0] = 49.0 + i * 1e-6   # lat
        pkt[1] = 8.43 + i * 2e-6   # lon
        pkt[2] = 110.0             # alt
        pkt[5] = 0.01 * i          # yaw
        pkt[8:11] = [5.0, 0.1, 0.0]     # vf, vl, vu
        pkt[11:14] = [0.1, 0.2, 9.8]    # ax, ay, az
        pkt[17:20] = [0.01, 0.02, 0.03]  # wx, wy, wz
        np.savetxt(f"{root}/oxts/data/{i:010d}.txt", pkt[None])

    for cam in ("image_02", "image_03"):
        os.makedirs(f"{root}/{cam}/data", exist_ok=True)
        for i in range(n):
            img = RNG.integers(0, 255, (h, w, 3), np.uint8)
            cv2.imwrite(f"{root}/{cam}/data/{i:010d}.png", img)


class TestKITTILoader:
    def test_load(self, tmp_path):
        root = str(tmp_path / "2011_09_30" /
                   "2011_09_30_drive_0018_sync")
        make_kitti_fixture(root)
        from islam_tpu.data.dataset import TrajFolderDataset

        ds = TrajFolderDataset(root, "kitti")
        assert ds.num_img == 4  # end_frame=-1 drops the last frame
        assert ds.has_imu
        # IMU at 2x RGB rate: sync hits every other sample
        np.testing.assert_array_equal(ds.rgb2imu_sync, [0, 2, 4, 6])
        assert ds.accels.shape[1] == 3
        np.testing.assert_allclose(ds.accels[0], [0.1, 0.2, 9.8])
        np.testing.assert_allclose(ds.gyros[0], [0.01, 0.02, 0.03])
        # baseline from P_rect offsets: (-10 - -60)/100 = 0.5 m
        np.testing.assert_allclose(
            np.linalg.norm(ds.right2left_pose[:3]), 0.5, atol=1e-6)
        # velocities rotated to world, magnitude preserved
        np.testing.assert_allclose(
            np.linalg.norm(ds.vels[0]), np.linalg.norm([5.0, 0.1, 0.0]),
            rtol=1e-5)
        s = ds[0]
        assert s["img0"][0].shape == (96, 128, 3)
        assert np.isfinite(s["motion"]).all()


class TestTransforms:
    def test_crop_center_adjusts_intrinsics(self):
        sample = {
            "img0": [RNG.uniform(0, 255, (100, 140, 3)).astype(np.float32)],
            "intrinsic_calib": np.asarray([100.0, 100.0, 70.0, 50.0]),
        }
        out = CropCenter((64, 96))(sample)
        assert out["img0"][0].shape == (64, 96, 3)
        np.testing.assert_allclose(out["intrinsic_calib"][2], 70 - (140 - 96) / 2)
        np.testing.assert_allclose(out["intrinsic_calib"][3], 50 - (100 - 64) / 2)

    def test_crop_resizes_if_small(self):
        sample = {
            "img0": [RNG.uniform(0, 255, (50, 60, 3)).astype(np.float32)],
        }
        out = CropCenter((64, 96), fix_ratio=True)(sample)
        assert out["img0"][0].shape == (64, 96, 3)

    def test_downscale_flow_nearest(self):
        flow = RNG.normal(size=(32, 48, 2)).astype(np.float32)
        sample = {"flow": [flow], "img0": [np.zeros((32, 48, 3), np.float32)]}
        out = DownscaleFlow()(sample)
        assert out["flow"][0].shape == (8, 12, 2)


class TestNativePreproc:
    def test_matches_numpy(self):
        from islam_tpu.data import native

        img = RNG.integers(0, 255, (3, 80, 100, 3), dtype=np.uint8)
        raw, norm = native.preproc_batch(img, (64, 96), MEAN, STD)
        y0, x0 = (80 - 64) // 2, (100 - 96) // 2
        crop = img[:, y0:y0 + 64, x0:x0 + 96].astype(np.float32) / 255.0
        np.testing.assert_allclose(raw, crop, atol=1e-6)
        np.testing.assert_allclose(
            norm, (crop - np.asarray(MEAN, np.float32))
            / np.asarray(STD, np.float32), atol=1e-5)

    def test_normalize_transform_native_path(self, monkeypatch):
        """The PRODUCTION call site (round-4 review item 5): Normalize in
        the trainer's pipeline dispatches uint8 images to the fused native
        kernel, and its output matches the numpy semantic oracle bit-for-
        bit after the f32 cast — for keep_old both ways and mean=None."""
        from islam_tpu.data import native
        from islam_tpu.data.transforms import Normalize

        if not native.available():
            import pytest
            pytest.skip("native preproc unavailable")

        for kwargs in (dict(mean=MEAN, std=STD, keep_old=True),
                       dict(mean=MEAN, std=STD, keep_old=False),
                       dict(keep_old=True)):
            imgs = [RNG.integers(0, 255, (32, 40, 3), dtype=np.uint8)]
            s_nat = {"img0": [imgs[0].copy()], "img1": [imgs[0].copy()]}
            s_np = {"img0": [imgs[0].copy()], "img1": [imgs[0].copy()]}
            monkeypatch.delenv("ISLAM_NO_NATIVE", raising=False)
            out_nat = Normalize(**kwargs)(s_nat)
            monkeypatch.setenv("ISLAM_NO_NATIVE", "1")
            out_np = Normalize(**kwargs)(s_np)
            assert set(out_nat.keys()) == set(out_np.keys())
            for kk in out_np:
                a = np.asarray(out_nat[kk][0], np.float32)
                b = np.asarray(out_np[kk][0], np.float32)
                np.testing.assert_allclose(a, b, atol=1e-6, err_msg=kk)
            assert out_nat["img0"][0].dtype == np.float32
