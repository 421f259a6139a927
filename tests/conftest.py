"""Test harness configuration.

Forces the JAX CPU backend with 8 virtual devices so the entire suite --
including multi-chip sharding tests -- runs on any machine without TPUs.
Mirrors the reference's "tests are the dataset mains" gap (SURVEY.md section 4)
by replacing it with a real unit/integration pyramid.
"""

import os

# Must run before the first backend initialisation. Note: a sitecustomize on
# this machine may import jax and register a TPU plugin before conftest runs,
# so setting os.environ["JAX_PLATFORMS"] alone is not enough -- we also update
# jax.config, which takes effect as long as no backend has been *used* yet.
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")

from amos_slam_tpu.utils.jit_cache import enable_persistent_cache

enable_persistent_cache()

import numpy as np
import pytest

# ---------------------------------------------------------------------------
# Test tiers. `pytest -m quick` = smoke tier, <5 min cold on CPU: unit-level
# kernels/solvers/IO on tiny shapes. Everything else (e2e System runs, chunk
# scans, training loops) is `slow`. Files not listed here default to slow, so
# a new expensive test can never silently bloat the smoke tier.
# ---------------------------------------------------------------------------
_QUICK_FILES = {
    "test_se3.py",
    "test_sim3_camera.py",
    "test_pose_opt.py",
    "test_vocabulary.py",
    "test_map_eval.py",
    "test_dataset_loaders.py",
    "test_native_loader.py",
    "test_fast.py",
    "test_fast_pallas_interpret.py",
    "test_pnp_slic.py",
    "test_yolact_data.py",
}


def pytest_collection_modifyitems(config, items):
    import os

    for item in items:
        base = os.path.basename(str(item.fspath))
        if base in _QUICK_FILES:
            item.add_marker(pytest.mark.quick)
        else:
            item.add_marker(pytest.mark.slow)


@pytest.fixture()
def rng():
    """Fresh deterministic generator per test: a session-scoped rng makes
    every consumer's data depend on which tests ran before it (real
    order-dependent failures happened)."""
    return np.random.default_rng(0)
