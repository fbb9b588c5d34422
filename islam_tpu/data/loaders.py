"""Per-dataset trajectory loaders: TartanAir, EuRoC, KITTI.

Host-side I/O layer rebuilding Datasets/TrajFolderDataset.py:17-344.  Each
loader parses one trajectory folder into a ``SequenceData`` record:
timestamps, stereo image paths, calibration, GT poses/velocities, and the
100 Hz IMU stream with RGB<->IMU synchronization indices.
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from os import listdir
from os.path import isdir, isfile
from typing import Optional

import numpy as np


def sync_data(ts_src: np.ndarray, ts_tar: np.ndarray) -> np.ndarray:
    """Nearest-neighbor timestamp sync (TrajFolderDataset.py:17-27):
    res[i] = argmin_j |ts_src[j] - ts_tar[i]| found by a forward sweep."""
    res = []
    j = 0
    for t in ts_tar:
        while j + 1 < len(ts_src) and abs(ts_src[j + 1] - t) <= abs(ts_src[j] - t):
            j += 1
        res.append(j)
    return np.array(res)


def intrinsic2matrix(intrinsic):
    fx, fy, cx, cy = intrinsic
    return np.array([fx, 0, cx, 0, fy, cy, 0, 0, 1],
                    dtype=np.float32).reshape(3, 3)


def matrix2intrinsic(m):
    return np.array([m[0, 0], m[1, 1], m[0, 2], m[1, 2]], dtype=np.float32)


def _se3_from_matrix_np(T: np.ndarray) -> np.ndarray:
    """4x4 -> [t(3), q(xyzw)] numpy."""
    from scipy.spatial.transform import Rotation as R
    q = R.from_matrix(T[:3, :3]).as_quat()
    return np.concatenate([T[:3, 3], q]).astype(np.float32)


def _se3_to_matrix_np(p: np.ndarray) -> np.ndarray:
    from scipy.spatial.transform import Rotation as R
    T = np.eye(4, dtype=np.float64)
    T[:3, :3] = R.from_quat(p[3:]).as_matrix()
    T[:3, 3] = p[:3]
    return T


def stereo_rectify(left_intrinsic, left_distortion, right_intrinsic,
                   right_distortion, width, height, right2left_pose):
    """cv2-based stereo rectification (TrajFolderDataset.py:42-62).

    ``right2left_pose`` is [t, q] numpy; returns new intrinsics, new
    right2left pose, and the undistort-rectify pixel maps.
    """
    import cv2

    left_K = intrinsic2matrix(left_intrinsic).astype(np.float64)
    right_K = intrinsic2matrix(right_intrinsic).astype(np.float64)
    T_rl = _se3_to_matrix_np(right2left_pose)
    T_lr = np.linalg.inv(T_rl)
    R = T_lr[:3, :3]
    T = T_lr[:3, 3]

    R1, R2, P1, P2, Q, roi1, roi2 = cv2.stereoRectify(
        left_K, left_distortion.astype(np.float64),
        right_K, right_distortion.astype(np.float64),
        (width, height), R, T.reshape(3, 1), alpha=0)

    left_map = cv2.initUndistortRectifyMap(
        left_K, left_distortion.astype(np.float64), R1, P1,
        (width, height), cv2.CV_32FC1)
    right_map = cv2.initUndistortRectifyMap(
        right_K, right_distortion.astype(np.float64), R2, P2,
        (width, height), cv2.CV_32FC1)

    new_left = matrix2intrinsic(P1)
    new_right = matrix2intrinsic(P2)
    new_r2l = np.array([-P2[0, 3] / P2[0, 0], 0, 0, 0, 0, 0, 1],
                       dtype=np.float32)
    return new_left, new_right, new_r2l, left_map, right_map


@dataclass
class SequenceData:
    rgbfiles: list
    rgb_dts: np.ndarray
    rgb_ts: np.ndarray
    intrinsic: np.ndarray
    poses: np.ndarray                      # (N, 7) [t, q]
    rgbfiles_right: Optional[list] = None
    intrinsic_right: Optional[np.ndarray] = None
    right2left_pose: Optional[np.ndarray] = None   # (7,)
    flowfiles: Optional[list] = None
    depthfiles: Optional[list] = None
    vels: Optional[np.ndarray] = None
    has_imu: bool = False
    accels: Optional[np.ndarray] = None
    gyros: Optional[np.ndarray] = None
    imu_dts: Optional[np.ndarray] = None
    imu_ts: Optional[np.ndarray] = None
    rgb2imu_sync: Optional[np.ndarray] = None
    rgb2imu_pose: Optional[np.ndarray] = None      # (7,)
    gravity: float = 9.81
    accel_bias: Optional[np.ndarray] = None
    gyro_bias: Optional[np.ndarray] = None
    require_undistort: bool = False
    imgmap: Optional[tuple] = None
    imgmap_right: Optional[tuple] = None


def _list_images(folder, exts=('.png', '.jpg')):
    files = [os.path.join(folder, f) for f in listdir(folder)
             if f.endswith(exts)]
    files.sort()
    return files


def load_tartanair(datadir: str) -> SequenceData:
    """TartanAir folder layout (TrajFolderDataset.py:65-137): image_left/,
    image_right/, flow/, depth_left/, pose_left.txt, imu/ with synthetic
    100 Hz gravity-free IMU."""
    import yaml

    rgbfiles = _list_images(datadir + '/image_left')
    n = len(rgbfiles)
    data = SequenceData(
        rgbfiles=rgbfiles,
        rgb_dts=np.full(n, 0.1, np.float32),
        rgb_ts=np.arange(n, dtype=np.float64) * 0.1,
        intrinsic=np.array([320.0, 320.0, 320.0, 240.0], np.float32),
        poses=np.loadtxt(datadir + '/pose_left.txt').astype(np.float32),
    )
    if isdir(datadir + '/image_right'):
        data.rgbfiles_right = _list_images(datadir + '/image_right')
        data.intrinsic_right = data.intrinsic.copy()
        data.right2left_pose = np.array([0, 0.25, 0, 0, 0, 0, 1], np.float32)
    if isdir(datadir + '/flow'):
        files = [os.path.join(datadir + '/flow', f)
                 for f in listdir(datadir + '/flow') if f.endswith('_flow.npy')]
        files.sort()
        data.flowfiles = files
    if isdir(datadir + '/depth_left'):
        files = [os.path.join(datadir + '/depth_left', f)
                 for f in listdir(datadir + '/depth_left')
                 if f.endswith('_depth.npy')]
        files.sort()
        data.depthfiles = files
    if isdir(datadir + '/imu'):
        imudir = datadir + '/imu'
        data.imu_dts = np.full(n * 10, 0.01, np.float32)
        data.imu_ts = np.arange(n * 10, dtype=np.float64) * 0.01
        data.rgb2imu_sync = np.arange(n) * 10
        data.rgb2imu_pose = np.array([0, 0, 0, 0, 0, 0, 1], np.float32)
        data.gravity = 0.0  # acc_nograv_body is gravity-free
        data.accels = np.load(imudir + '/acc_nograv_body.npy')
        data.gyros = np.load(imudir + '/gyro.npy')
        data.vels = np.load(imudir + '/vel_global.npy')
        with open(imudir + '/parameter.yaml') as f:
            paras = yaml.safe_load(f)
        data.accel_bias = np.array(paras['acc_zero_bias'], np.float32)
        data.gyro_bias = np.array(paras['gyro_zero_bias'], np.float32)
        data.has_imu = True
    return data


def load_euroc(datadir: str) -> SequenceData:
    """EuRoC MAV layout (TrajFolderDataset.py:139-238): cam0/cam1 CSVs with
    rectification, state_groundtruth_estimate0 (poses, vels, biases), imu0."""
    import cv2
    import pandas
    import yaml

    all_ts = []
    df = pandas.read_csv(datadir + '/cam0/data.csv')
    ts_left = df.values[:, 0].astype(int) // int(1e6)
    all_ts.append(ts_left)
    rgbfiles = list(datadir + '/cam0/data/' + df.values[:, 1])

    rgbfiles_right = None
    if isfile(datadir + '/cam1/data.csv'):
        df = pandas.read_csv(datadir + '/cam1/data.csv')
        ts_right = df.values[:, 0].astype(int) // int(1e6)
        all_ts.append(ts_right)
        rgbfiles_right = list(datadir + '/cam1/data/' + df.values[:, 1])

    with open(datadir + '/cam0/sensor.yaml') as f:
        res = yaml.load(f.read(), Loader=yaml.FullLoader)
        intrinsic = np.array(res['intrinsics'], np.float32)
        distortion = np.array(res['distortion_coefficients'], np.float32)
        T_BL = np.array(res['T_BS']['data'], np.float32).reshape(4, 4)

    intrinsic_right = None
    right2left = None
    imgmap = imgmap_right = None
    require_undistort = False
    if rgbfiles_right is not None:
        with open(datadir + '/cam1/sensor.yaml') as f:
            res = yaml.load(f.read(), Loader=yaml.FullLoader)
            intrinsic_right = np.array(res['intrinsics'], np.float32)
            distortion_right = np.array(res['distortion_coefficients'],
                                        np.float32)
            T_BR = np.array(res['T_BS']['data'], np.float32).reshape(4, 4)
        T_LR = np.linalg.inv(T_BL) @ T_BR
        right2left = _se3_from_matrix_np(T_LR)
        img = cv2.imread(rgbfiles_right[0])
        h, w = img.shape[:2]
        intrinsic, intrinsic_right, right2left, imgmap, imgmap_right = (
            stereo_rectify(intrinsic, distortion, intrinsic_right,
                           distortion_right, w, h, right2left))
        require_undistort = True

    df = pandas.read_csv(datadir + '/state_groundtruth_estimate0/data.csv')
    ts_pose = df.values[:, 0].astype(int) // int(1e6)
    all_ts.append(ts_pose)
    poses = df.values[:, (1, 2, 3, 5, 6, 7, 4)].astype(np.float32)
    vels = df.values[:, 8:11].astype(np.float32)
    accel_bias_seq = df.values[:, 14:17].astype(np.float32)
    gyro_bias_seq = df.values[:, 11:14].astype(np.float32)

    # Keep only timestamps present in every stream (TrajFolderDataset.py:193-205)
    common = set(all_ts[0])
    for t in all_ts[1:]:
        common &= set(t)
    rgbfiles = [f for f, t in zip(rgbfiles, ts_left) if t in common]
    if rgbfiles_right is not None:
        rgbfiles_right = [f for f, t in zip(rgbfiles_right, ts_right)
                          if t in common]
    keep_pose = [i for i, t in enumerate(ts_pose) if t in common]
    poses = poses[keep_pose]
    vels = vels[keep_pose]
    timestamps = np.sort(np.array(list(common)))

    data = SequenceData(
        rgbfiles=rgbfiles,
        rgb_dts=np.diff(timestamps).astype(np.float32) * 1e-3,
        rgb_ts=timestamps.astype(np.float64) * 1e-3,
        intrinsic=intrinsic, poses=poses, vels=vels,
        rgbfiles_right=rgbfiles_right, intrinsic_right=intrinsic_right,
        right2left_pose=right2left, require_undistort=require_undistort,
        imgmap=imgmap, imgmap_right=imgmap_right,
    )

    if isfile(datadir + '/imu0/data.csv'):
        df = pandas.read_csv(datadir + '/imu0/data.csv')
        ts_imu = df.values[:, 0].astype(int) // int(1e6)
        data.accels = df.values[:, 4:7].astype(np.float32)
        data.gyros = df.values[:, 1:4].astype(np.float32)
        imu2pose = sync_data(ts_pose, ts_imu)
        data.accel_bias = np.mean(accel_bias_seq[imu2pose], axis=0)
        data.gyro_bias = np.mean(gyro_bias_seq[imu2pose], axis=0)
        data.imu_dts = np.diff(ts_imu).astype(np.float32) * 1e-3
        data.imu_ts = ts_imu.astype(np.float64) * 1e-3
        data.rgb2imu_sync = sync_data(ts_imu, timestamps)
        with open(datadir + '/imu0/sensor.yaml') as f:
            res = yaml.load(f.read(), Loader=yaml.FullLoader)
            T_BI = np.array(res['T_BS']['data'], np.float32).reshape(4, 4)
        data.rgb2imu_pose = _se3_from_matrix_np(np.linalg.inv(T_BI) @ T_BL)
        data.gravity = 9.81
        data.has_imu = True
    return data


def _read_kitti_calib_file(path):
    out = {}
    with open(path) as f:
        for line in f:
            if ':' not in line:
                continue
            k, v = line.split(':', 1)
            try:
                out[k.strip()] = np.array(
                    [float(x) for x in v.split()], np.float64)
            except ValueError:
                pass
    return out


def _kitti_oxts_to_pose(oxts: np.ndarray):
    """OXTS packets (N, >=20) -> T_w_imu (N, 4, 4) via the KITTI devkit's
    Mercator projection (the same math pykitti implements)."""
    from scipy.spatial.transform import Rotation as R

    er = 6378137.0
    lat, lon, alt = oxts[:, 0], oxts[:, 1], oxts[:, 2]
    roll, pitch, yaw = oxts[:, 3], oxts[:, 4], oxts[:, 5]
    scale = np.cos(lat[0] * np.pi / 180.0)
    tx = scale * lon * np.pi * er / 180.0
    ty = scale * er * np.log(np.tan((90.0 + lat) * np.pi / 360.0))
    tz = alt
    # devkit: R = Rz(yaw) Ry(pitch) Rx(roll) = intrinsic ZYX
    rots = R.from_euler('ZYX', np.stack([yaw, pitch, roll], axis=1)
                        ).as_matrix()
    T = np.tile(np.eye(4), (len(oxts), 1, 1))
    T[:, :3, :3] = rots
    T[:, :3, 3] = np.stack([tx, ty, tz], axis=1)
    return T


def load_kitti(datadir: str) -> SequenceData:
    """KITTI raw layout (TrajFolderDataset.py:241-344): cam2/cam3 stereo,
    100 Hz OXTS IMU, world velocities from vf/vl/vu.  Self-contained parser
    (no pykitti dependency): OXTS text packets, devkit Mercator poses, and
    the calib chain T_camN_imu = TN . R_rect_00 . T_velo_cam . T_imu_velo."""
    from scipy.spatial.transform import Rotation as R

    parts = datadir.rstrip('/').split('/')
    date_dir = '/'.join(parts[:-1])

    ts_imu = _load_kitti_timestamps(datadir, 'oxts')
    ts_rgb = _load_kitti_timestamps(datadir, 'image_02')
    rgb2imu_sync = sync_data(ts_imu, ts_rgb)

    # --- calibration ---
    c2c = _read_kitti_calib_file(os.path.join(date_dir,
                                              'calib_cam_to_cam.txt'))
    v2c = _read_kitti_calib_file(os.path.join(date_dir,
                                              'calib_velo_to_cam.txt'))
    i2v = _read_kitti_calib_file(os.path.join(date_dir,
                                              'calib_imu_to_velo.txt'))

    def rt(d):
        T = np.eye(4)
        T[:3, :3] = d['R'].reshape(3, 3)
        T[:3, 3] = d['T']
        return T

    T_velo_imu = rt(i2v)
    T_cam0u_velo = rt(v2c)
    R_rect = np.eye(4)
    R_rect[:3, :3] = c2c['R_rect_00'].reshape(3, 3)

    def cam_transform(n):
        P = c2c[f'P_rect_0{n}'].reshape(3, 4)
        Tn = np.eye(4)
        Tn[0, 3] = P[0, 3] / P[0, 0]
        T_camN_velo = Tn @ R_rect @ T_cam0u_velo
        K = P[:3, :3]
        return T_camN_velo @ T_velo_imu, K

    T_LI, K2 = cam_transform(2)
    T_RI, K3 = cam_transform(3)
    T_LR = T_LI @ np.linalg.inv(T_RI)
    intrinsic = np.array([K2[0, 0], K2[1, 1], K2[0, 2], K2[1, 2]])
    intrinsic_right = np.array([K3[0, 0], K3[1, 1], K3[0, 2], K3[1, 2]])

    # --- OXTS packets ---
    oxts_dir = os.path.join(datadir, 'oxts', 'data')
    oxts_files = sorted(os.listdir(oxts_dir))
    oxts = np.stack([np.loadtxt(os.path.join(oxts_dir, f))
                     for f in oxts_files])

    T_w_imu = _kitti_oxts_to_pose(oxts)[rgb2imu_sync]
    poses = np.stack([_se3_from_matrix_np(T) for T in T_w_imu])
    vels_local = oxts[rgb2imu_sync][:, 8:11].astype(np.float32)  # vf, vl, vu
    vels = R.from_quat(poses[:, 3:]).apply(vels_local).astype(np.float32)

    img_dir = os.path.join(datadir, 'image_02', 'data')
    rgbfiles = [os.path.join(img_dir, f) for f in sorted(os.listdir(img_dir))]
    img_dir_r = os.path.join(datadir, 'image_03', 'data')
    rgbfiles_right = [os.path.join(img_dir_r, f)
                      for f in sorted(os.listdir(img_dir_r))]

    data = SequenceData(
        rgbfiles=rgbfiles,
        rgb_dts=np.diff(ts_rgb).astype(np.float32),
        rgb_ts=np.asarray(ts_rgb, np.float64) - ts_rgb[0],
        intrinsic=intrinsic.astype(np.float32), poses=poses, vels=vels,
        rgbfiles_right=rgbfiles_right,
        intrinsic_right=intrinsic_right.astype(np.float32),
        right2left_pose=_se3_from_matrix_np(T_LR),
    )
    data.accels = oxts[:, 11:14].astype(np.float32)  # ax, ay, az
    data.gyros = oxts[:, 17:20].astype(np.float32)   # wx, wy, wz
    data.accel_bias = np.zeros(3, np.float32)
    data.gyro_bias = np.zeros(3, np.float32)
    data.imu_dts = np.diff(ts_imu).astype(np.float32)
    data.imu_ts = np.asarray(ts_imu, np.float64) - ts_imu[0]
    data.rgb2imu_sync = rgb2imu_sync
    data.rgb2imu_pose = _se3_from_matrix_np(np.linalg.inv(T_LI))
    data.gravity = 9.81
    data.has_imu = True
    return data


def _load_kitti_timestamps(datapath: str, subfolder: str):
    """Nanosecond timestamp parsing (TrajFolderDataset.py:326-344)."""
    import datetime as dt

    path = os.path.join(datapath, subfolder, 'timestamps.txt')
    timestamps = []
    with open(path) as f:
        for line in f.readlines():
            t = dt.datetime.strptime(line[:-4], '%Y-%m-%d %H:%M:%S.%f')
            timestamps.append(t.timestamp())
    timestamps.sort()
    return timestamps


LOADERS = {
    'tartanair': load_tartanair,
    'euroc': load_euroc,
    'kitti': load_kitti,
}
