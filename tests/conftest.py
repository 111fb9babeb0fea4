"""Test configuration: run everything on a virtual 8-device CPU mesh.

Multi-chip TPU hardware is unavailable in CI, so all sharding/collective
behavior is exercised on XLA's host platform with 8 virtual devices (the
test strategy the reference lacks entirely; see SURVEY.md section 4).
Must run before the first ``import jax`` anywhere in the test session.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    import jax

    return jax.random.PRNGKey(0)
