import numpy as np
import jax
import jax.numpy as jnp

from amos_slam_tpu.ops.lk import lk_flow
from amos_slam_tpu.solvers.fundamental import (
    ransac_fundamental, epipolar_distance
)
from amos_slam_tpu.io import synthetic
from amos_slam_tpu.geometry import se3


def test_lk_tracks_pure_translation(rng):
    from scipy.ndimage import zoom
    base = zoom(rng.uniform(0, 255, (70, 90)), 8, order=1)[:480, :640]
    img0 = base.astype(np.float32)
    shift = (6.0, -4.0)  # (dx, dy)
    img1 = np.roll(np.roll(img0, int(shift[1]), axis=0), int(shift[0]), axis=1)
    pts = rng.uniform(100, 380, (128, 2)).astype(np.float32)
    res = lk_flow(
        jnp.asarray(img0), jnp.asarray(img1),
        jnp.asarray(pts), jnp.ones(128, bool),
    )
    v = np.asarray(res.valid)
    assert v.sum() > 100, v.sum()
    d = np.asarray(res.pts1)[v] - pts[v]
    err = np.abs(d - np.array(shift)).max(axis=1)
    assert np.median(err) < 0.3, np.median(err)


def test_lk_on_rendered_motion(rng):
    planes = synthetic.default_room(seed=3)
    poses = synthetic.orbit_trajectory(8, radius=0.1, advance=0.15)
    g0, d0 = synthetic.render(planes, poses[3])
    g1, d1 = synthetic.render(planes, poses[4])
    pts = np.stack(
        [rng.uniform(60, 580, 256), rng.uniform(60, 420, 256)], axis=-1
    ).astype(np.float32)
    res = lk_flow(jnp.asarray(g0), jnp.asarray(g1), jnp.asarray(pts),
                  jnp.ones(256, bool))
    v = np.asarray(res.valid)
    assert v.sum() > 150
    # verify flow against ground-truth reprojection (via rendered depth)
    fx, fy, cx, cy = 535.4, 539.2, 320.1, 247.6
    xi = np.clip(pts[:, 0].round().astype(int), 0, 639)
    yi = np.clip(pts[:, 1].round().astype(int), 0, 479)
    z = d0[yi, xi]
    pc0 = np.stack([(pts[:, 0] - cx) / fx * z, (pts[:, 1] - cy) / fy * z, z], -1)
    T_rel = poses[4] @ np.linalg.inv(poses[3])
    pc1 = (T_rel[:3, :3] @ pc0.T).T + T_rel[:3, 3]
    gt = np.stack(
        [fx * pc1[:, 0] / pc1[:, 2] + cx, fy * pc1[:, 1] / pc1[:, 2] + cy], -1
    )
    ok = v & (z > 0)
    err = np.linalg.norm(np.asarray(res.pts1)[ok] - gt[ok], axis=1)
    assert np.median(err) < 0.5, np.median(err)


def _two_view_points(rng, n=300, outliers=60):
    fx, fy, cx, cy = 535.4, 539.2, 320.1, 247.6
    K = np.array([[fx, 0, cx], [0, fy, cy], [0, 0, 1]])
    pts = rng.uniform(-2, 2, (n, 3))
    pts[:, 2] = rng.uniform(2, 8, n)
    T = np.asarray(se3.se3_exp(jnp.asarray(
        np.array([0.3, 0.05, 0.02, 0.02, -0.04, 0.01], np.float32))))
    x1 = (K @ pts.T).T
    x1 = x1[:, :2] / x1[:, 2:]
    pc2 = (T[:3, :3] @ pts.T).T + T[:3, 3]
    x2 = (K @ pc2.T).T
    x2 = x2[:, :2] / x2[:, 2:]
    x1 += rng.normal(0, 0.3, x1.shape)
    x2 += rng.normal(0, 0.3, x2.shape)
    out_idx = rng.choice(n, outliers, replace=False)
    x2[out_idx] += rng.uniform(10, 60, (outliers, 2)) * np.sign(rng.normal(size=(outliers, 2)))
    # ground-truth F = K^-T [t]x R K^-1
    R, t = T[:3, :3], T[:3, 3]
    tx = np.array([[0, -t[2], t[1]], [t[2], 0, -t[0]], [-t[1], t[0], 0]])
    F_gt = np.linalg.inv(K).T @ tx @ R @ np.linalg.inv(K)
    return x1.astype(np.float32), x2.astype(np.float32), out_idx, F_gt


def test_ransac_fundamental(rng):
    x1, x2, out_idx, F_gt = _two_view_points(rng)
    res = jax.jit(
        lambda a, b, v, k: ransac_fundamental(a, b, v, k)
    )(jnp.asarray(x1), jnp.asarray(x2), jnp.ones(len(x1), bool),
      jax.random.PRNGKey(0))
    inl = np.asarray(res.inliers)
    assert res.num_inliers > 180
    # outliers rejected
    assert inl[out_idx].sum() <= 6
    # recovered F agrees with ground truth on inlier epipolar constraint
    d_gt = np.asarray(
        epipolar_distance(jnp.asarray(F_gt.astype(np.float32) / F_gt[2, 2]),
                          jnp.asarray(x1), jnp.asarray(x2))
    )
    true_in = d_gt < 1.5
    agree = (inl & true_in).sum() / max(inl.sum(), 1)
    assert agree > 0.9, agree


def test_ransac_fundamental_padding(rng):
    x1, x2, _, _ = _two_view_points(rng, n=100, outliers=10)
    pad = 56
    x1p = np.concatenate([x1, np.zeros((pad, 2), np.float32)])
    x2p = np.concatenate([x2, np.zeros((pad, 2), np.float32)])
    valid = np.concatenate([np.ones(100, bool), np.zeros(pad, bool)])
    res = ransac_fundamental(
        jnp.asarray(x1p), jnp.asarray(x2p), jnp.asarray(valid),
        jax.random.PRNGKey(1),
    )
    inl = np.asarray(res.inliers)
    assert not inl[100:].any()
    assert res.num_inliers > 60
