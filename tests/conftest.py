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

Smoke tier:  pytest -m smoke  selects the pure-math gate (config / loss /
optimizer / checkpoint serialization) and runs it on ONE cpu device — no
8-device mesh, < 2 min on a single core — so CI always has a cheap
always-run gate.  Everything smoke-marked must stay mesh-free.
"""

import os
import sys

import jax

ON_TPU = bool(os.environ.get("CLIP_LITE_TPU_TESTS"))
def _smoke_only() -> bool:
    """True iff the run selects exactly `-m smoke`.  Decided from argv
    because the platform must be fixed before ANY backend touch, which
    can happen at test-module import — earlier than pytest_configure
    guarantees relative to our jax.config writes."""
    argv = sys.argv
    for i, a in enumerate(argv):
        expr = None
        if a in ("-m", "--markexpr") and i + 1 < len(argv):
            expr = argv[i + 1]
        elif a.startswith("-m") and a != "-m":
            expr = a[2:]
        elif a.startswith("--markexpr="):
            expr = a.split("=", 1)[1]
        if expr is not None:
            return expr.strip() == "smoke"
    return False


if not ON_TPU:
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 1 if _smoke_only() else 8)

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return jax.random.PRNGKey(0)
