"""Test configuration: run everything on a virtual 8-device CPU mesh.

Multi-chip TPU hardware is unavailable in CI, so all sharding/collective
behavior is exercised on XLA's host platform with 8 virtual devices (the
test strategy the reference lacks entirely; see SURVEY.md section 4).

NOTE: the ambient environment (sitecustomize) imports JAX at interpreter
startup with JAX_PLATFORMS=axon, so env vars are too late here — we must
override through jax.config before any backend is initialized.

Set CLIP_LITE_TPU_TESTS=1 to keep the ambient (real TPU) backend instead:
this enables the backend-gated on-chip tests (tests/test_attention_tpu.py
— the fused kernel's on-core PRNG dropout path, which only exists
compiled on TPU) and skips everything that needs the 8-device CPU mesh.
Run those as:  CLIP_LITE_TPU_TESTS=1 pytest tests/test_attention_tpu.py
"""

import os

import jax

ON_TPU = bool(os.environ.get("CLIP_LITE_TPU_TESTS"))
if not ON_TPU:
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 8)

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return jax.random.PRNGKey(0)
