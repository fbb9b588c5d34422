"""Trajectory dataset: consecutive stereo frame pairs + GT motions.

Rebuild of ``TrajFolderDataset`` (Datasets/TrajFolderDataset.py:347-518)
without the torch DataLoader dependency: plain-python indexable dataset plus
a simple batcher (``iterate_batches``) that collates fixed-size windows of
consecutive frame-pairs -- the access pattern the reference uses
(shuffle=False, drop_last=True, train.py:95-96).
"""

from __future__ import annotations

from typing import Dict, Iterator, List, Optional

import numpy as np

from islam_tpu.data.loaders import LOADERS, SequenceData
from islam_tpu.data.transforms import make_intrinsics_layer
from islam_tpu.transformation import relative_twists


class TrajFolderDataset:
    def __init__(self, datadir: str = None, datatype: str = 'tartanair',
                 transform=None, start_frame: int = 0, end_frame: int = -1,
                 loader: SequenceData = None, links=None,
                 load_flow: bool = False, load_depth: bool = False):
        self.load_flow = load_flow
        self.load_depth = load_depth
        if loader is None:
            loader = LOADERS[datatype](datadir)
        if end_frame <= 0:
            end_frame += len(loader.rgbfiles)

        self.datadir = datadir
        self.datatype = datatype
        self.transform = transform

        self.rgbfiles = loader.rgbfiles[start_frame:end_frame]
        self.rgb_dts = loader.rgb_dts[start_frame:end_frame - 1]
        self.rgb_ts = loader.rgb_ts[start_frame:end_frame]
        self.num_img = len(self.rgbfiles)

        self.rgbfiles_right = (loader.rgbfiles_right[start_frame:end_frame]
                               if loader.rgbfiles_right is not None else None)
        self.flowfiles = (loader.flowfiles[start_frame:end_frame - 1]
                          if loader.flowfiles is not None else None)
        self.depthfiles = (loader.depthfiles[start_frame:end_frame]
                           if loader.depthfiles is not None else None)

        self.intrinsic = loader.intrinsic
        self.intrinsic_right = loader.intrinsic_right
        self.right2left_pose = loader.right2left_pose

        self.poses = np.asarray(loader.poses)[start_frame:end_frame]
        self.vels = (np.asarray(loader.vels)[start_frame:end_frame]
                     if loader.vels is not None else None)

        self.has_imu = loader.has_imu
        if loader.has_imu:
            # IMU window realignment (TrajFolderDataset.py:401-420)
            self.rgb2imu_sync = loader.rgb2imu_sync[start_frame:end_frame].copy()
            start_imu = self.rgb2imu_sync[0]
            end_imu = self.rgb2imu_sync[-1] + 1
            self.rgb2imu_sync -= start_imu
            self.accels = loader.accels[start_imu:end_imu]
            self.gyros = loader.gyros[start_imu:end_imu]
            self.imu_dts = loader.imu_dts[start_imu:end_imu - 1]
            self.imu_ts = loader.imu_ts[start_imu:end_imu]
            self.rgb2imu_pose = loader.rgb2imu_pose
            self.imu_init = {'rot': self.poses[0, 3:],
                             'pos': self.poses[0, :3],
                             'vel': self.vels[0]}
            self.gravity = loader.gravity
            self.accel_bias = loader.accel_bias
            self.gyro_bias = loader.gyro_bias

        self.require_undistort = loader.require_undistort
        self.imgmap = loader.imgmap
        self.imgmap_right = loader.imgmap_right

        if links is None:
            self.links = [[i, i + 1] for i in range(self.num_img - 1)]
        else:
            self.links = links
        self.num_link = len(self.links)
        self.motions = self.calc_motions_by_links(self.links)

    def __len__(self):
        return self.num_link

    def __getitem__(self, idx):
        return self.get_pair(self.links[idx][0], self.links[idx][1])

    def calc_motions_by_links(self, links):
        """GT relative motions in se3 form (TrajFolderDataset.py:459-466)."""
        if self.poses is None:
            return None
        return relative_twists(self.poses, links=links).astype(np.float32)

    def undistort(self, img, is_right=False):
        if not self.require_undistort:
            return img
        import cv2

        imgmap = self.imgmap_right if is_right else self.imgmap
        return cv2.remap(img, imgmap[0], imgmap[1], cv2.INTER_AREA)

    def get_pair(self, i, j) -> Dict:
        """Load one frame pair (TrajFolderDataset.py:475-518)."""
        import cv2

        res = {}
        img0 = self.undistort(cv2.imread(self.rgbfiles[i], cv2.IMREAD_COLOR))
        img1 = self.undistort(cv2.imread(self.rgbfiles[j], cv2.IMREAD_COLOR))
        res['img0'] = [img0]
        res['img1'] = [img1]

        if self.rgbfiles_right is not None:
            res['img0_r'] = [self.undistort(
                cv2.imread(self.rgbfiles_right[i], cv2.IMREAD_COLOR), True)]
            res['img1_r'] = [self.undistort(
                cv2.imread(self.rgbfiles_right[j], cv2.IMREAD_COLOR), True)]

        # Optional precomputed flow/depth (TartanAir ships them; feeds the
        # precalc_flow path of TartanVO.forward, TartanVO.py:104,121-124 --
        # the CPU-runnable minimum slice of BASELINE config 1).
        if self.load_flow and self.flowfiles is not None:
            res['flow'] = [np.load(self.flowfiles[min(i, j)])]
        if self.load_depth and self.depthfiles is not None:
            res['depth0'] = [np.load(self.depthfiles[i])]

        h, w, _ = img0.shape
        res['intrinsic'] = [make_intrinsics_layer(
            w, h, self.intrinsic[0], self.intrinsic[1],
            self.intrinsic[2], self.intrinsic[3])]
        res['intrinsic_calib'] = self.intrinsic.copy()

        if self.transform:
            res = self.transform(res)

        res['link'] = np.array([i, j])
        res['dt'] = np.sum(self.rgb_dts[min(i, j):max(i, j)])
        res['datatype'] = self.datatype
        res['motion'] = self._gt_motion_quat(i, j)
        if self.right2left_pose is not None:
            res['extrinsic'] = np.asarray(self.right2left_pose).copy()
        return res

    def _gt_motion_quat(self, i, j):
        from scipy.spatial.transform import Rotation as R

        Ti = np.eye(4)
        Ti[:3, :3] = R.from_quat(self.poses[i, 3:]).as_matrix()
        Ti[:3, 3] = self.poses[i, :3]
        Tj = np.eye(4)
        Tj[:3, :3] = R.from_quat(self.poses[j, 3:]).as_matrix()
        Tj[:3, 3] = self.poses[j, :3]
        M = np.linalg.inv(Ti) @ Tj
        q = R.from_matrix(M[:3, :3]).as_quat()
        return np.concatenate([M[:3, 3], q]).astype(np.float32)


def collate(samples: List[Dict]) -> Dict:
    """Stack a list of per-pair samples into batched numpy arrays."""
    out = {}
    for k in samples[0].keys():
        vals = [s[k] for s in samples]
        if isinstance(vals[0], np.ndarray):
            out[k] = np.stack(vals)
        elif isinstance(vals[0], (int, float, np.floating)):
            out[k] = np.asarray(vals)
        else:
            out[k] = vals
    return out


def iterate_batches(dataset, batch_size: int, drop_last: bool = True
                    ) -> Iterator[Dict]:
    """Sequential window batcher (the reference's DataLoader access pattern:
    shuffle=False, drop_last=True)."""
    n = len(dataset)
    end = n - (n % batch_size) if drop_last else n
    for start in range(0, end, batch_size):
        yield collate([dataset[i]
                       for i in range(start, min(start + batch_size, n))])
