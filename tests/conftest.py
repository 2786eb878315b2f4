"""Test configuration: run everything on a faked 8-device CPU backend.

Multi-chip hardware is not available in CI; per SURVEY.md section 4.3 the
distributed paths are validated on `--xla_force_host_platform_device_count=8`
so collectives (psum, ppermute rings, Schur reductions) execute for real in
one process. Must run before the first `import jax` anywhere.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The image's sitecustomize registers the TPU backend at interpreter startup,
# which overrides JAX_PLATFORMS from the environment — force CPU via config.
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def eight_devices():
    import jax

    devs = jax.devices()
    assert len(devs) == 8, f"expected 8 faked CPU devices, got {devs}"
    return devs


@pytest.fixture
def rng():
    return np.random.default_rng(1234)
