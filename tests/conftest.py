"""Test configuration: run everything on a virtual 8-device CPU mesh.

Multi-chip TPU hardware is unavailable in CI, so all sharding/collective
behavior is exercised on XLA's host platform with 8 virtual devices (the
test strategy the reference lacks entirely; see SURVEY.md section 4).

NOTE: the ambient environment (sitecustomize) imports JAX at interpreter
startup with JAX_PLATFORMS=axon, so env vars are too late here — we must
override through jax.config before any backend is initialized.
"""

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return jax.random.PRNGKey(0)
