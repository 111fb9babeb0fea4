"""On-chip checks of the fused attention kernel's TPU-only dropout path.

The CPU/interpret tests (tests/test_attention.py) substitute an
externally generated keep mask because ``pltpu.prng_random_bits`` only
exists compiled on TPU (ops/attention.py:90-92,255-260).  These tests run
the REAL on-core PRNG path — per-program seeding + threshold compare —
and must execute on actual TPU hardware:

    CLIP_LITE_TPU_TESTS=1 python -m pytest tests/test_attention_tpu.py

Covered where it runs:
  * realized keep rate ~= 1 - rate, and the mask is genuinely random
    (per-row keep counts have the right binomial spread);
  * same seed => bit-identical outputs (per-program seeding is
    deterministic);
  * forward/backward mask agreement via the v-linearity identity
    <g, J e> == <J^T g, e> — out is linear in v for a FIXED mask, so the
    identity holds iff the recompute-backward drew the same mask.
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from clip_lite_tpu.ops.attention import fused_short_attention

pytestmark = [
    pytest.mark.skipif(
        not os.environ.get("CLIP_LITE_TPU_TESTS"),
        reason="on-chip PRNG path; run with CLIP_LITE_TPU_TESTS=1 on TPU"),
    pytest.mark.slow,
]

B, S, NH, HD = 8, 16, 2, 32
H = NH * HD
RATE = 0.5


def _skip_unless_tpu():
    if jax.default_backend() != "tpu":
        pytest.skip("requires a TPU backend")


def _uniform_probs_qkv(v_fill: float = 1.0):
    """q = k = 0 -> uniform attention probs; v constant => the kernel
    output per (b, i, h-dim) is inv_keep/S * (#kept keys)."""
    qkv = np.zeros((B, S, 3 * H), np.float32)
    qkv[:, :, 2 * H:] = v_fill
    return jnp.asarray(qkv)


def test_realized_keep_rate_and_spread():
    _skip_unless_tpu()
    qkv = _uniform_probs_qkv()
    bias = jnp.zeros((B, S), jnp.float32)
    out = jax.jit(lambda x: fused_short_attention(
        x, bias, NH, dropout_rate=RATE,
        dropout_rng=jax.random.PRNGKey(3), deterministic=False))(qkv)
    out = np.asarray(out)
    # Every lane of a head carries the same value: count/ (S * (1-rate)).
    counts = out[..., ::HD] * S * (1.0 - RATE)   # (B, S, NH) kept-key counts
    np.testing.assert_allclose(counts, np.round(counts), atol=1e-3)
    # Realized keep rate over B*S*NH*S = 4096 Bernoulli draws: binomial
    # std of the mean ~ 0.0078, so +-4 sigma ~ 0.032.
    realized = counts.mean() / S
    assert abs(realized - (1.0 - RATE)) < 0.04, realized
    # And it IS random: per-row counts must spread like Binomial(S, 1/2)
    # (std 2.0), not collapse to keep-all/drop-all.
    assert 1.0 < counts.std() < 3.0, counts.std()


def test_same_seed_is_deterministic():
    _skip_unless_tpu()
    qkv = jax.random.normal(jax.random.PRNGKey(0), (B, S, 3 * H),
                            jnp.float32)
    bias = jnp.zeros((B, S), jnp.float32)

    def f(x):
        return fused_short_attention(
            x, bias, NH, dropout_rate=RATE,
            dropout_rng=jax.random.PRNGKey(7), deterministic=False)

    a = np.asarray(jax.jit(f)(qkv))
    b = np.asarray(jax.jit(f)(qkv))
    np.testing.assert_array_equal(a, b)
    # A different rng key must give a different mask.
    c = np.asarray(jax.jit(lambda x: fused_short_attention(
        x, bias, NH, dropout_rate=RATE,
        dropout_rng=jax.random.PRNGKey(8), deterministic=False))(qkv))
    assert np.abs(a - c).max() > 1e-3


def test_fwd_bwd_mask_agreement_via_v_linearity():
    _skip_unless_tpu()
    key = jax.random.PRNGKey(1)
    k_qkv, k_g, k_e = jax.random.split(key, 3)
    qkv = jax.random.normal(k_qkv, (B, S, 3 * H), jnp.float32)
    g = jax.random.normal(k_g, (B, S, H), jnp.float32)
    e = jax.random.normal(k_e, (B, S, H), jnp.float32)
    bias = jnp.zeros((B, S), jnp.float32)
    rng = jax.random.PRNGKey(11)

    def f(x):
        return fused_short_attention(x, bias, NH, dropout_rate=RATE,
                                     dropout_rng=rng, deterministic=False)

    def loss(x):
        return jnp.sum(f(x) * g)

    # J^T g restricted to the v third (out is linear in v given the mask).
    grad_v = jax.jit(jax.grad(loss))(qkv)[:, :, 2 * H:]
    lhs = float(jnp.sum(grad_v * e))

    # <g, J e>: perturb ONLY v by e; linearity makes the difference exact
    # up to float round-off — IF the two forward calls and the backward
    # all drew the same mask from the same seed.
    pert = qkv.at[:, :, 2 * H:].add(e)
    jf = jax.jit(f)
    rhs = float(jnp.sum((jf(pert) - jf(qkv)) * g))
    # Both sides are sums of ~B*S*H random-sign products, so compare
    # against the magnitude of the summands (the sums themselves can
    # cancel toward zero).
    scale = float(jnp.sum(jnp.abs(grad_v * e)))
    assert abs(lhs - rhs) < 5e-3 * scale, (lhs, rhs, scale)
