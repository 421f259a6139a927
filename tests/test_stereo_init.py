import numpy as np
import jax
import jax.numpy as jnp

from amos_slam_tpu.geometry import se3
from amos_slam_tpu.geometry.camera import Camera
from amos_slam_tpu.solvers.initializer import initialize_two_view
from amos_slam_tpu.ops.stereo import match_stereo
from amos_slam_tpu.config import ORBConfig, CameraConfig
from amos_slam_tpu.frontend.features import ORBPipeline
from amos_slam_tpu.io import synthetic


def project_np(cam_k, T, pts):
    pc = (T[:3, :3] @ pts.T).T + T[:3, 3]
    return np.stack(
        [
            cam_k[0] * pc[:, 0] / pc[:, 2] + cam_k[2],
            cam_k[1] * pc[:, 1] / pc[:, 2] + cam_k[3],
        ],
        -1,
    ), pc[:, 2]


def _angle(a, b):
    c = np.dot(a, b) / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-12)
    return np.degrees(np.arccos(np.clip(abs(c), -1, 1)))


def test_initializer_general_scene_uses_f(rng):
    cam = Camera.create(500.0, 500.0, 320.0, 240.0)
    n, pad = 300, 100
    pts = rng.uniform(-2, 2, (n, 3)).astype(np.float32)
    pts[:, 2] = rng.uniform(3, 9, n)
    xi = np.array([0.4, 0.1, 0.05, 0.02, -0.05, 0.01], np.float32)
    T2 = np.asarray(se3.se3_exp(jnp.asarray(xi)))
    k = (500.0, 500.0, 320.0, 240.0)
    x1, z1 = project_np(k, np.eye(4), pts)
    x2, z2 = project_np(k, T2, pts)
    x1 += rng.normal(0, 0.4, x1.shape)
    x2 += rng.normal(0, 0.4, x2.shape)
    # gross mismatches
    bad = rng.choice(n, 40, replace=False)
    x2[bad] += rng.uniform(20, 80, (40, 2))
    x1p = np.concatenate([x1, np.zeros((pad, 2))]).astype(np.float32)
    x2p = np.concatenate([x2, np.zeros((pad, 2))]).astype(np.float32)
    v = np.concatenate([np.ones(n, bool), np.zeros(pad, bool)])

    res = initialize_two_view(
        cam, jnp.asarray(x1p), jnp.asarray(x2p), jnp.asarray(v),
        jax.random.PRNGKey(0),
    )
    assert bool(res.ok)
    assert not bool(res.used_h)
    T_est = np.asarray(res.Tcw2)
    # rotation exact, translation up to scale
    dR = T_est[:3, :3] @ T2[:3, :3].T
    ang = np.degrees(np.arccos(np.clip((np.trace(dR) - 1) / 2, -1, 1)))
    assert ang < 1.0, ang
    assert _angle(T_est[:3, 3], T2[:3, 3]) < 3.0
    # triangulated points match gt up to the scale factor
    scale = np.linalg.norm(T2[:3, 3]) / np.linalg.norm(T_est[:3, 3])
    X = np.asarray(res.points) * scale
    ok = np.asarray(res.point_ok)[:n]
    assert ok.sum() > 150
    err = np.linalg.norm(X[:n][ok] - pts[ok], axis=1)
    assert np.median(err) < 0.5, np.median(err)  # sigma_z ~ z^2/(fB)*sigma_px at z up to 9 m


def test_initializer_planar_scene_uses_h(rng):
    cam = Camera.create(500.0, 500.0, 320.0, 240.0)
    n = 300
    pts = rng.uniform(-2, 2, (n, 3)).astype(np.float32)
    pts[:, 2] = 5.0 + 0.3 * pts[:, 0] + 0.1 * pts[:, 1]   # a plane
    xi = np.array([0.4, 0.05, 0.02, 0.01, -0.06, 0.02], np.float32)
    T2 = np.asarray(se3.se3_exp(jnp.asarray(xi)))
    k = (500.0, 500.0, 320.0, 240.0)
    x1, _ = project_np(k, np.eye(4), pts)
    x2, _ = project_np(k, T2, pts)
    x1 += rng.normal(0, 0.3, x1.shape)
    x2 += rng.normal(0, 0.3, x2.shape)
    res = initialize_two_view(
        cam, jnp.asarray(x1.astype(np.float32)),
        jnp.asarray(x2.astype(np.float32)),
        jnp.ones(n, bool), jax.random.PRNGKey(1),
    )
    assert bool(res.used_h)
    assert bool(res.ok)
    T_est = np.asarray(res.Tcw2)
    dR = T_est[:3, :3] @ T2[:3, :3].T
    ang = np.degrees(np.arccos(np.clip((np.trace(dR) - 1) / 2, -1, 1)))
    assert ang < 2.0, ang
    assert _angle(T_est[:3, 3], T2[:3, 3]) < 5.0


def test_stereo_matching_on_rendered_pair():
    """Render a stereo pair from the synthetic room and verify recovered
    depth against the renderer's depth."""
    cfg = CameraConfig()
    baseline = 0.075  # bf = 40.0 = 535.4 * 0.0747
    planes = synthetic.default_room(seed=4)
    T_l = np.eye(4)
    T_r = np.eye(4)
    T_r[0, 3] = -baseline  # right camera: world shifts -b in camera x
    gl, dl = synthetic.render(planes, T_l)
    gr, _ = synthetic.render(planes, T_r)

    pipe = ORBPipeline(ORBConfig(), cfg)
    fl = pipe.extract(jnp.asarray(gl))
    fr = pipe.extract(jnp.asarray(gr))
    _, pyr_l, bl, _ = pipe.detect_keypoints(jnp.asarray(gl))
    _, pyr_r, br, _ = pipe.detect_keypoints(jnp.asarray(gr))

    res = match_stereo(
        fl.desc, fl.kp.xy, fl.kp.level, fl.valid,
        fr.desc, fr.kp.xy, fr.kp.level, fr.valid,
        bl[0], br[0],
        jnp.asarray(cfg.bf), jnp.asarray(0.5),
    )
    v = np.asarray(res.valid)
    assert v.sum() > 200, v.sum()
    xy = np.asarray(fl.kp.xy)
    xi = np.clip(xy[:, 0].round().astype(int), 0, 639)
    yi = np.clip(xy[:, 1].round().astype(int), 0, 479)
    gt = dl[yi, xi]
    est = np.asarray(res.depth)
    ok = v & (gt > 0)
    rel = np.abs(est[ok] - gt[ok]) / gt[ok]
    assert np.median(rel) < 0.03, np.median(rel)
