import numpy as np
import jax.numpy as jnp
import pytest

from amos_slam_tpu.config import ORBConfig, CameraConfig
from amos_slam_tpu.frontend.features import ORBPipeline
from amos_slam_tpu.ops import hamming


def make_texture(rng, h=480, w=640):
    """Blocky random texture: lots of corners, scale structure."""
    base = rng.uniform(0, 255, (h // 8, w // 8)).astype(np.float32)
    img = np.kron(base, np.ones((8, 8), np.float32))
    img += rng.uniform(0, 10, (h, w)).astype(np.float32)
    return np.clip(img, 0, 255)


@pytest.fixture(scope="module")
def pipeline():
    return ORBPipeline(ORBConfig(), CameraConfig())


@pytest.fixture(scope="module")
def texture():
    return make_texture(np.random.default_rng(3))


def test_extract_shapes_and_validity(pipeline, texture):
    feats = pipeline.extract(jnp.asarray(texture))
    K = pipeline.capacity
    assert feats.desc.shape == (K, 256)
    assert feats.desc.dtype == jnp.int8
    v = np.asarray(feats.valid)
    assert v.sum() > 400, v.sum()
    # descriptors are bits
    d = np.asarray(feats.desc)
    assert set(np.unique(d)).issubset({0, 1})
    # multiple pyramid levels fire
    assert len(np.unique(np.asarray(feats.kp.level)[v])) >= 3


def test_descriptors_deterministic(pipeline, texture):
    f1 = pipeline.extract(jnp.asarray(texture))
    f2 = pipeline.extract(jnp.asarray(texture))
    np.testing.assert_array_equal(np.asarray(f1.desc), np.asarray(f2.desc))
    np.testing.assert_array_equal(np.asarray(f1.kp.xy), np.asarray(f2.kp.xy))


def test_matching_identical_images(pipeline, texture):
    f = pipeline.extract(jnp.asarray(texture))
    dist = hamming.hamming_matrix(f.desc, f.desc)
    dist = hamming.apply_mask(dist, f.valid[:, None] & f.valid[None, :])
    res = hamming.match(dist, max_dist=50, mutual=False)
    v = np.asarray(f.valid)
    idx = np.asarray(res.idx)
    # each valid keypoint should match itself at distance 0
    self_match = idx[v] == np.arange(len(v))[v]
    assert self_match.mean() > 0.95


def test_matching_translated_image(pipeline, texture):
    shift = 12
    img2 = np.roll(texture, shift, axis=1)
    f1 = pipeline.extract(jnp.asarray(texture))
    f2 = pipeline.extract(jnp.asarray(img2))
    dist = hamming.hamming_matrix(f1.desc, f2.desc)
    mask = hamming.window_mask(
        # predicted location: shifted by `shift`
        np.asarray(f1.kp.xy) + np.array([shift, 0.0], np.float32),
        f2.kp.xy, 8.0, f1.valid, f2.valid,
    )
    res = hamming.match(hamming.apply_mask(dist, mask), max_dist=60, mutual=True)
    matched = np.asarray(res.valid)
    assert matched.sum() > 200, matched.sum()
    # matched pairs should mostly differ by the known shift
    xy1 = np.asarray(f1.kp.xy)[matched]
    xy2 = np.asarray(f2.kp.xy)[np.asarray(res.idx)[matched]]
    dx = xy2[:, 0] - xy1[:, 0]
    good = np.abs(dx - shift) < 2.0
    assert good.mean() > 0.9


def test_suppress_mask_drops_keypoints(pipeline, texture):
    kp, pyr, blurred, patches = pipeline.detect_keypoints(jnp.asarray(texture))
    mask = np.zeros((480, 640), np.uint8)
    mask[:, :320] = 1  # left half "dynamic"
    f = pipeline.describe(kp, patches, None, jnp.asarray(mask))
    v = np.asarray(f.valid)
    xy = np.asarray(f.kp.xy)
    assert (xy[v][:, 0] >= 319).all()
    # and some keypoints survived on the right
    assert v.sum() > 100


def test_rgbd_depth_channels(pipeline, texture, rng):
    depth = rng.uniform(0.5, 4.0, (480, 640)).astype(np.float32)
    depth[:, :100] = 0.0  # invalid region
    f = pipeline.extract(jnp.asarray(texture), depth_image=jnp.asarray(depth))
    v = np.asarray(f.valid)
    d = np.asarray(f.depth)
    ur = np.asarray(f.u_right)
    xy = np.asarray(f.xy_un)
    has = v & (d > 0)
    assert has.sum() > 200
    np.testing.assert_allclose(
        ur[has], xy[has][:, 0] - 40.0 / d[has], atol=1e-3
    )


def test_patch_descriptor_parity_bounds_bit_flips(texture):
    """descriptors_from_patches (bf16 MXU path, quantized rotation) vs
    compute_descriptors (float32 exact-rotation oracle): the docstring
    promises a bounded bit-flip rate between the two. At exact bin-center
    angles the only divergences are bf16 intensity quantization near
    comparator ties; at arbitrary angles the +-5.6 deg rotation
    quantization adds a few more. Both must stay far under the matcher's
    accept threshold (TH_LOW=50 of 256)."""
    import jax
    from amos_slam_tpu.ops import orb_descriptor as od

    pyr = jnp.asarray(texture)[None]          # single-level "pyramid"
    rng = np.random.default_rng(7)
    N = 256
    yx = rng.uniform(40, 400, (N, 2)).round().astype(np.float32)
    level = jnp.zeros(N, jnp.int32)
    pattern_np = od.make_brief_pattern(0)
    pattern = jnp.asarray(pattern_np)
    M = od.make_bin_sampling_matrix(pattern_np)

    step = 2 * np.pi / od.N_ROT_BINS
    for angles, max_flip in [
        # exact bin centers: isolates the bf16 quantization
        (-np.pi + step * rng.integers(0, od.N_ROT_BINS, N), 8.0),
        # arbitrary angles: adds rotation quantization
        (rng.uniform(-np.pi, np.pi, N), 40.0),
    ]:
        ang = jnp.asarray(angles.astype(np.float32))
        d_exact = np.asarray(
            od.compute_descriptors(pyr, level, jnp.asarray(yx), ang, pattern)
        )
        patches = od.gather_patches(pyr, level, jnp.asarray(yx))
        d_fast = np.asarray(od.descriptors_from_patches(patches, ang, M))
        flips = np.abs(d_exact - d_fast).sum(axis=1)
        assert flips.mean() < max_flip, (flips.mean(), max_flip)


def test_gather_patches_dense_parity(rng):
    """The TPU one-hot-matmul patch sampler must reproduce the block-gather
    sampler to bf16 intensity quantization (the dense path's only loss)."""
    import amos_slam_tpu.ops.orb_descriptor as od

    L, H, W = 3, 96, 128
    sizes = [(96, 128), (64, 96), (48, 64)]
    budgets = [6, 4, 2]
    pyr = jnp.zeros((L, H, W), jnp.float32)
    for lvl, (h, w) in enumerate(sizes):
        pyr = pyr.at[lvl, :h, :w].set(
            jnp.asarray(rng.uniform(0, 255, (h, w)).astype(np.float32))
        )
    yx_parts, lv_parts = [], []
    for lvl, ((h, w), b) in enumerate(zip(sizes, budgets)):
        m = od.PATCH_RAD + 1
        yx_parts.append(
            np.stack([rng.uniform(m, h - m, b), rng.uniform(m, w - m, b)], -1)
        )
        lv_parts.append(np.full(b, lvl))
    yx = jnp.asarray(np.concatenate(yx_parts).astype(np.float32))
    level = jnp.asarray(np.concatenate(lv_parts).astype(np.int32))
    # pad rows at the end, like detect_keypoints
    yx = jnp.concatenate([yx, jnp.zeros((3, 2), jnp.float32)])
    level = jnp.concatenate([level, jnp.zeros(3, jnp.int32)])

    ref = np.asarray(od.gather_patches(pyr, level, yx))
    dense = np.asarray(od.gather_patches_dense(pyr, sizes, budgets, yx))
    n = sum(budgets)
    assert dense.shape == ref.shape
    # bf16 quantization of [0, 255] intensities: absolute step <= 1
    assert np.abs(dense[:n] - ref[:n]).max() <= 1.0
    assert (dense[n:] == 0).all()
