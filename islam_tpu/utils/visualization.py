"""Flow/depth visualization and warp debugging (Datasets/utils.py:259-371)."""

from __future__ import annotations

import numpy as np


def calculate_angle_distance_from_du_dv(du, dv, flag_degree=False):
    a = np.arctan2(dv, du)
    angle_shift = np.pi
    if flag_degree:
        a = a / np.pi * 180
        angle_shift = 180
    d = np.sqrt(du * du + dv * dv)
    return a, d, angle_shift


def visrgb(img, mean=None, std=None):
    img = np.asarray(img).copy()
    if mean is not None and std is not None:
        for k in range(3):
            img[..., k] = img[..., k] * std[k] + mean[k]
    return (img * 255).astype(np.uint8)


def visflow(flownp, maxF=500.0, n=8, mask=None, hueMax=179, angShift=0.0):
    """KITTI-style HSV flow rendering (Datasets/utils.py:276-296)."""
    import cv2

    ang, mag, _ = calculate_angle_distance_from_du_dv(
        flownp[:, :, 0], flownp[:, :, 1])
    hsv = np.zeros((ang.shape[0], ang.shape[1], 3), dtype=np.float32)
    am = ang < 0
    ang[am] = ang[am] + np.pi * 2
    hsv[:, :, 0] = np.remainder((ang + angShift) / (2 * np.pi), 1)
    hsv[:, :, 1] = mag / maxF * n
    hsv[:, :, 2] = (n - hsv[:, :, 1]) / n
    hsv[:, :, 0] = np.clip(hsv[:, :, 0], 0, 1) * hueMax
    hsv[:, :, 1:3] = np.clip(hsv[:, :, 1:3], 0, 1) * 255
    hsv = hsv.astype(np.uint8)
    bgr = cv2.cvtColor(hsv, cv2.COLOR_HSV2BGR)
    if mask is not None:
        bgr[mask != 255] = np.array([0, 0, 0], dtype=np.uint8)
    return bgr


def visdepth(disp, scale=3):
    disp = np.asarray(disp, np.float32)
    min_val = np.min(disp)
    max_val = np.max(disp)
    res = (disp - min_val) / max(max_val - min_val, 1e-12) * 255
    return res.astype(np.uint8)


def save_images(directory, data, prefix='', suffix='', mean=None, std=None,
                fx=1, fy=1):
    """(B, H, W, C) NHWC float arrays -> pngs (Datasets/utils.py:307-332)."""
    import cv2

    data = np.asarray(data)
    if data.ndim == 4 and data.shape[1] in (1, 2, 3) and data.shape[-1] not in (1, 2, 3):
        data = data.transpose(0, 2, 3, 1)  # accept NCHW too
    imgs = []
    for i in range(data.shape[0]):
        if data.shape[-1] == 3:
            img = visrgb(data[i], mean=mean, std=std)
        elif data.shape[-1] == 2:
            img = visflow(data[i].copy())
        else:
            img = visdepth(data[i][..., 0])
        imgs.append(cv2.resize(img, None, fx=fx, fy=fy))
    for i, img in enumerate(imgs):
        cv2.imwrite(f'{directory}/{prefix}{i}{suffix}.png', img)


def warp_images(directory, data, flow, mean=None, std=None):
    """Backward-warp debug renders (Datasets/utils.py:335-371)."""
    import cv2

    data = np.asarray(data)
    if data.ndim == 4 and data.shape[-1] not in (1, 2, 3):
        data = data.transpose(0, 2, 3, 1)
    flow = np.asarray(flow)
    if flow.ndim == 4 and flow.shape[-1] != 2:
        flow = flow.transpose(0, 2, 3, 1)
    res = []
    for i in range(flow.shape[0]):
        rgb = visrgb(data[i], mean=mean, std=std)
        rgb = cv2.resize(rgb, None, fx=0.25, fy=0.25)
        f = flow[i]
        h, w = f.shape[:2]
        gx, gy = np.meshgrid(np.linspace(0, w - 1, w), np.linspace(0, h - 1, h))
        uv = np.stack((gx, gy), axis=-1)
        warp = cv2.remap(rgb, (f + uv).astype(np.float32), None,
                         cv2.INTER_LINEAR)
        res.append(warp)
        cv2.imwrite(f'{directory}/{i}_warp.png', warp)
    return np.stack(res)
