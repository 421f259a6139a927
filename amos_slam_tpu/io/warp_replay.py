"""Real-imagery RGB-D replay: synthesize a tracked sequence from ONE real
photograph with exactly known geometry.

The environment vendors no full TUM sequence (BASELINE.md eval configs),
but the reference ships real 640x480 TUM office frames
(/root/reference/src/python/input/*.png). This module turns such a frame
into a geometrically consistent RGB-D sequence: the photo becomes the
texture of a (slightly tilted) plane in space, and each output frame
renders that plane from a camera pose -- image by homography warp, depth
analytically. Ground truth is exact by construction, so a full System run
over the sequence yields a real-imagery end-to-end ATE (the role of the
reference's rgbd_tum main + offline ATE tooling,
/root/reference/Examples/RGB-D/rgbd_tum.cc:58-176).

The texture is real (real gradients, real corner statistics, real
descriptor aliasing); only the scene geometry is synthetic. This is the
strongest e2e statement the vendored assets support.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import numpy as np


def plane_replay_frame(
    tex: np.ndarray,          # (H, W) float gray texture, seen from identity
    cam,                      # geometry.camera.Camera (fx, fy, cx, cy)
    Tcw: np.ndarray,          # (4, 4) camera-from-world pose to render from
    plane_n: Tuple[float, float, float] = (0.06, -0.04, 1.0),
    plane_d: float = 2.0,
) -> Tuple[np.ndarray, np.ndarray]:
    """Render (gray, depth) of the textured plane ``plane_n . X = plane_d``
    (world frame = the identity base camera that sees ``tex``) from pose
    ``Tcw``. Depth is the analytic ray-plane distance; pixels whose ray
    misses the plane or whose texture lookup leaves the base frame come
    back as 0 (invalid), exactly like a real sensor dropout."""
    h, w = tex.shape
    n = np.asarray(plane_n, np.float64)
    n = n / np.linalg.norm(n)
    d = float(plane_d)

    R = np.asarray(Tcw, np.float64)[:3, :3]
    t = np.asarray(Tcw, np.float64)[:3, 3]
    Rwc = R.T
    twc = -R.T @ t

    ys, xs = np.mgrid[0:h, 0:w].astype(np.float64)
    rx = (xs - cam.cx) / cam.fx
    ry = (ys - cam.cy) / cam.fy
    rays = np.stack([rx, ry, np.ones_like(rx)], -1)          # camera rays
    rw = rays @ Rwc.T                                         # world dirs
    denom = rw @ n
    num = d - twc @ n
    with np.errstate(divide="ignore", invalid="ignore"):
        z = num / denom                                       # ray depth
    valid = (denom != 0) & (z > 0.05) & (z < 50.0)
    z = np.where(valid, z, 0.0)
    Xw = twc[None, None, :] + rw * z[..., None]

    # texture lookup in the base (identity) camera
    with np.errstate(divide="ignore", invalid="ignore"):
        u = cam.fx * Xw[..., 0] / Xw[..., 2] + cam.cx
        v = cam.fy * Xw[..., 1] / Xw[..., 2] + cam.cy
    valid &= (Xw[..., 2] > 0.05) & (u >= 0) & (u <= w - 1.001) & \
        (v >= 0) & (v <= h - 1.001)
    u = np.where(valid, u, 0.0)
    v = np.where(valid, v, 0.0)
    x0 = np.floor(u).astype(int)
    y0 = np.floor(v).astype(int)
    fx, fy = u - x0, v - y0
    g = (
        tex[y0, x0] * (1 - fx) * (1 - fy)
        + tex[y0, np.minimum(x0 + 1, w - 1)] * fx * (1 - fy)
        + tex[np.minimum(y0 + 1, h - 1), x0] * (1 - fx) * fy
        + tex[np.minimum(y0 + 1, h - 1), np.minimum(x0 + 1, w - 1)] * fx * fy
    )
    gray = np.where(valid, g, 0.0).astype(np.float32)
    depth = np.where(valid, z, 0.0).astype(np.float32)
    return gray, depth


def plane_replay_sequence(
    tex: np.ndarray, cam, poses: Sequence[np.ndarray], **kw
) -> List[Tuple[np.ndarray, np.ndarray]]:
    """[(gray, depth)] for each pose (ground truth = ``poses``)."""
    return [plane_replay_frame(tex, cam, T, **kw) for T in poses]


REF_INPUT_DIR = "/root/reference/src/python/input"


def load_reference_frame(path: str = None) -> np.ndarray:
    """Load one of the reference's shipped real TUM frames as float gray
    (returns None when the asset is absent -- callers skip)."""
    import os

    if path is None:
        path = os.path.join(REF_INPUT_DIR, "1341846313.553992.png")
    if not os.path.exists(path):
        return None
    from PIL import Image

    return np.asarray(Image.open(path).convert("L"), np.float32)
