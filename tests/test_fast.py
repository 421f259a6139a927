import numpy as np
import jax.numpy as jnp

from amos_slam_tpu.ops import fast as fast_ops


def numpy_fast_margin(img):
    """Reference FAST-9 margin, straightforward O(HW*16*9) loops."""
    H, W = img.shape
    out = np.zeros((H, W), np.float32)
    offs = fast_ops.CIRCLE16
    for y in range(3, H - 3):
        for x in range(3, W - 3):
            c = img[y, x]
            d = np.array([img[y + dy, x + dx] - c for dy, dx in offs])
            best = 0.0
            for sign in (1, -1):
                dd = d * sign
                for s in range(16):
                    m = min(dd[(s + i) % 16] for i in range(9))
                    best = max(best, m)
            out[y, x] = max(best, 0.0)
    return out


def test_fast_margin_matches_numpy(rng):
    img = rng.uniform(0, 255, (24, 24)).astype(np.float32)
    got = np.asarray(fast_ops.fast_margin(jnp.asarray(img)))
    want = numpy_fast_margin(img)
    # interior only (roll wraps at borders; detection masks them anyway)
    np.testing.assert_allclose(got[4:-4, 4:-4], want[4:-4, 4:-4], atol=1e-4)


def test_fast_finds_synthetic_corner():
    img = np.zeros((64, 64), np.float32)
    img[30:, 30:] = 200.0  # a bright square corner at (30,30)
    m = np.asarray(fast_ops.fast_margin(jnp.asarray(img)))
    # strongest response should be near the square's corner
    y, x = np.unravel_index(np.argmax(m), m.shape)
    assert abs(y - 30) <= 3 and abs(x - 30) <= 3


def test_nms_keeps_single_peak():
    s = np.zeros((16, 16), np.float32)
    s[5, 5] = 10.0
    s[5, 6] = 8.0  # neighbor should be suppressed
    out = np.asarray(fast_ops.nms3x3(jnp.asarray(s)))
    assert out[5, 5] == 10.0 and out[5, 6] == 0.0


def test_detect_level_budget_and_spacing(rng):
    img = rng.uniform(0, 255, (480, 640)).astype(np.float32)
    lk = fast_ops.detect_level(
        jnp.asarray(img), (480, 640), budget=200, min_th=7.0, border=19, cell=16
    )
    assert lk.yx.shape == (200, 2)
    v = np.asarray(lk.valid)
    yx = np.asarray(lk.yx)[v]
    assert v.sum() > 50  # random noise has plenty of corners
    # one per cell -> no two keypoints share a 16x16 cell
    cells = {(int(y) // 16, int(x) // 16) for y, x in yx}
    assert len(cells) == len(yx)
    # border respected
    assert (yx[:, 0] >= 19).all() and (yx[:, 1] >= 19).all()
    assert (yx[:, 0] < 480 - 19).all() and (yx[:, 1] < 640 - 19).all()
