"""Test harness config: run everything on a virtual 8-device CPU mesh.

Per the build environment rules, multi-chip hardware is unavailable; sharding
is validated on `xla_force_host_platform_device_count=8` CPU devices. This
must run before jax initializes, hence the env mutation at import time.
"""

import os

# force CPU: the driver environment presets JAX_PLATFORMS=axon (the real
# TPU tunnel), which would make every eager test op a remote RPC and break
# float64 tests (TPU compile rejects f64 linalg)
os.environ["JAX_PLATFORMS"] = "cpu"
# persistent compilation cache: this box pays ~0.5-1s XLA compile per unique
# op shape; the cache makes repeat test runs compile-free.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.1")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# The axon sitecustomize imports jax at interpreter startup (with
# JAX_PLATFORMS=axon already captured), so the env mutations above are too
# late for the config snapshot — but backends are created lazily, so a
# config.update before first device use still wins.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture()
def rng():
    # function-scoped: every test sees the same deterministic stream
    # regardless of execution order
    return np.random.default_rng(42)


@pytest.fixture(scope="session")
def synthetic_tum(tmp_path_factory):
    """A small rendered TUM-format RGB-D sequence with exact ground truth."""
    from orbslam_mapsave_tpu.io import synthetic

    out = tmp_path_factory.mktemp("tumseq")
    K = np.array([[320.0, 0, 320.0], [0, 320.0, 240.0], [0, 0, 1.0]])
    poses = synthetic.orbit_trajectory(12)
    synthetic.write_tum_sequence(out, K, poses, width=640, height=480, seed=3)
    return {"root": out, "K": K, "poses": poses}
