"""Sharded negative-pairing and collective tests on a virtual 8-device mesh.

This coverage has no reference analog: the reference never simulates
multi-device behavior (SURVEY.md section 4)."""

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from clip_lite_tpu.parallel.collectives import (
    pmean_if_bound,
    roll_shifted_left,
)
from clip_lite_tpu.parallel.mesh import create_mesh
from clip_lite_tpu.ops.loss import JSDInfoMaxLoss


def test_local_roll_no_axis():
    x = jnp.arange(8.0).reshape(8, 1)
    out = roll_shifted_left(x, None, "local")
    np.testing.assert_array_equal(
        np.asarray(out)[:, 0], [1, 2, 3, 4, 5, 6, 7, 0])


def test_global_roll_matches_full_batch_roll():
    """Under shard_map, scope='global' must equal a roll of the global
    batch: out[i] = x[(i+1) % B]."""
    mesh = create_mesh()
    assert mesh.devices.size == 8
    x = jnp.arange(32.0).reshape(32, 1)

    def f(xs):
        return roll_shifted_left(xs, "data", "global")

    out = jax.jit(
        shard_map(f, mesh=mesh, in_specs=P("data"), out_specs=P("data"))
    )(x)
    expected = np.roll(np.arange(32.0), -1).reshape(32, 1)
    np.testing.assert_array_equal(np.asarray(out), expected)


def test_local_roll_under_shard_map_stays_in_shard():
    mesh = create_mesh()
    x = jnp.arange(16.0).reshape(16, 1)

    def f(xs):
        return roll_shifted_left(xs, "data", "local")

    out = jax.jit(
        shard_map(f, mesh=mesh, in_specs=P("data"), out_specs=P("data"))
    )(x)
    # 8 shards of 2: each shard [a, b] -> [b, a]
    expected = np.arange(16.0).reshape(8, 2)[:, ::-1].reshape(16, 1)
    np.testing.assert_array_equal(np.asarray(out), expected)


def test_pmean_if_bound():
    mesh = create_mesh()
    x = jnp.arange(8.0)

    def f(xs):
        return pmean_if_bound(xs.sum(), "data")

    out = jax.jit(
        shard_map(f, mesh=mesh, in_specs=P("data"), out_specs=P())
    )(x)
    assert float(out) == np.arange(8.0).mean() * 1  # each shard=1 elem; pmean of elems
    # identity outside any axis
    assert float(pmean_if_bound(jnp.float32(3.0), "data")) == 3.0


def test_sharded_global_loss_equals_single_device():
    """With global negatives and eval-mode norms, the pmean'd sharded loss
    must match the single-device loss on the full batch exactly."""
    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.randn(32, 64), jnp.float32)
    txt = jnp.asarray(rng.randn(32, 48), jnp.float32)

    loss = JSDInfoMaxLoss(image_dim=64, text_dim=48, image_prior=False,
                          text_prior=False, negatives="global")
    variables = loss.init({"params": jax.random.PRNGKey(0)}, img, txt,
                          train=False)

    single = loss.apply(variables, img, txt, train=False)

    mesh = create_mesh()

    def sharded_step(i, t):
        out = loss.apply(variables, i, t, train=False)
        return pmean_if_bound(out["total_loss"], "data")

    total = jax.jit(
        shard_map(sharded_step, mesh=mesh,
                  in_specs=(P("data"), P("data")), out_specs=P())
    )(img, txt)
    np.testing.assert_allclose(
        float(total), float(single["total_loss"]), rtol=2e-5)
