import numpy as np
import jax
import jax.numpy as jnp

from amos_slam_tpu.geometry import se3
from amos_slam_tpu.geometry.camera import Camera
from amos_slam_tpu.solvers.pnp import ransac_pnp
from amos_slam_tpu.ops.slic import slic_kmeans, dilate_mask
from amos_slam_tpu.io import synthetic


def test_ransac_pnp_with_outliers(rng):
    cam = Camera.create(535.4, 539.2, 320.1, 247.6)
    n = 400
    pts = rng.uniform(-2, 2, (n, 3)).astype(np.float32)
    pts[:, 2] = rng.uniform(2, 7, n)
    xi = np.array([0.2, -0.1, 0.3, 0.05, -0.04, 0.08], np.float32)
    T = np.asarray(se3.se3_exp(jnp.asarray(xi)))
    pc = (T[:3, :3] @ pts.T).T + T[:3, 3]
    uv = np.stack(
        [535.4 * pc[:, 0] / pc[:, 2] + 320.1,
         539.2 * pc[:, 1] / pc[:, 2] + 247.6], -1
    ).astype(np.float32)
    uv += rng.normal(0, 0.3, uv.shape)
    out_idx = rng.choice(n, 120, replace=False)  # 30% outliers
    uv[out_idx] += rng.uniform(15, 60, (120, 2)) * np.sign(rng.normal(size=(120, 2)))

    res = jax.jit(lambda p, u, v, k: ransac_pnp(cam, p, u, v, k))(
        jnp.asarray(pts), jnp.asarray(uv), jnp.ones(n, bool),
        jax.random.PRNGKey(0),
    )
    assert bool(res.ok)
    d = np.asarray(res.Tcw) @ np.linalg.inv(T)
    dxi = np.asarray(se3.se3_log(jnp.asarray(d.astype(np.float32))))
    assert np.linalg.norm(dxi[:3]) < 5e-3, dxi
    assert np.linalg.norm(dxi[3:]) < 2e-3, dxi
    inl = np.asarray(res.inliers)
    assert inl[out_idx].sum() <= 5
    assert res.num_inliers > 220


def test_slic_kmeans_separates_depths(rng):
    # two flat regions at different depths + texture
    H, W = 240, 320
    gray = rng.uniform(0, 255, (H, W)).astype(np.float32)
    depth = np.full((H, W), 4.0, np.float32)
    depth[60:180, 80:200] = 1.5  # near object
    res = slic_kmeans(jnp.asarray(gray), jnp.asarray(depth), cell=16, k=8)
    pc = np.asarray(res.pixel_cluster)
    # clusters inside vs outside the near block should differ
    inside = pc[80:160, 100:180]
    outside = pc[:40, :40]
    in_ids = set(np.unique(inside).tolist())
    out_ids = set(np.unique(outside).tolist())
    assert in_ids.isdisjoint(out_ids), (in_ids, out_ids)


def test_dilate_mask():
    m = np.zeros((32, 32), bool)
    m[16, 16] = True
    out = np.asarray(dilate_mask(jnp.asarray(m), radius=3))
    assert out[13:20, 13:20].all()
    assert not out[16, 20]
