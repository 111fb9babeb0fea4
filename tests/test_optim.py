"""Optimizer stack tests: schedules vs reference formulas, SGD/AdamW
trajectories vs torch.optim, Lookahead vs the published rule, clipping."""

import math

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from clip_lite_tpu.config import Config
from clip_lite_tpu.optim import (
    build_optimizer,
    lookahead,
    slow_params_from_state,
)
from clip_lite_tpu.optim import schedules as S

# Always-run smoke gate: pure math, single device, no mesh (pytest -m smoke).
pytestmark = pytest.mark.smoke


torch = pytest.importorskip("torch")


# ---------------------------------------------------------------------------
# Schedules
# ---------------------------------------------------------------------------

def test_cosine_schedule_values():
    fn = S.linear_warmup_cosine(total_steps=100, warmup_steps=10, min_mult=0.1)
    assert float(fn(0)) == 0.0
    assert float(fn(5)) == pytest.approx(0.5)
    assert float(fn(10)) == pytest.approx(0.1 + 1.0)
    mid = 0.1 + math.cos((45 / 90) * math.pi / 2) ** 2
    assert float(fn(55)) == pytest.approx(mid, rel=1e-6)
    assert float(fn(100)) == pytest.approx(0.1, abs=1e-6)


def test_linear_schedule_values():
    fn = S.linear_warmup_linear_decay(total_steps=100, warmup_steps=10)
    assert float(fn(5)) == pytest.approx(0.5)
    assert float(fn(55)) == pytest.approx(45 / 90)
    assert float(fn(100)) == pytest.approx(0.0)


def test_multistep_schedule_values():
    fn = S.linear_warmup_multistep(100, 10, milestones=[30, 60], gamma=0.1)
    assert float(fn(20)) == pytest.approx(1.0)
    assert float(fn(30)) == pytest.approx(0.1)
    assert float(fn(59)) == pytest.approx(0.1)
    assert float(fn(60)) == pytest.approx(0.01, rel=1e-5)


def test_nodecay_schedule_values():
    fn = S.linear_warmup_no_decay(100, 10)
    assert float(fn(50)) == 1.0
    assert float(fn(0)) == 0.0


def test_schedule_guards():
    with pytest.raises(AssertionError):
        S.linear_warmup_cosine(10, 20)
    with pytest.raises(AssertionError):
        S.linear_warmup_multistep(100, 10, milestones=[5])


# ---------------------------------------------------------------------------
# torch trajectory parity
# ---------------------------------------------------------------------------

def _run_pair(optimizer_name, steps=8, lookahead_on=False):
    """Run our chain and torch side by side on fixed params/grads."""
    rng = np.random.RandomState(0)
    init = {
        "image_encoder": {"w": rng.randn(4, 3).astype(np.float32)},
        "text_encoder": {"w": rng.randn(5).astype(np.float32)},
        "loss": {"w": rng.randn(2, 2).astype(np.float32)},
    }
    grads_per_step = [
        {
            "image_encoder": {"w": rng.randn(4, 3).astype(np.float32)},
            "text_encoder": {"w": rng.randn(5).astype(np.float32)},
            "loss": {"w": rng.randn(2, 2).astype(np.float32)},
        }
        for _ in range(steps)
    ]

    cfg = Config(override_list=[
        "OPTIM.OPTIMIZER_NAME", optimizer_name,
        "OPTIM.LOOKAHEAD.USE", lookahead_on,
        "OPTIM.LR_DECAY_NAME", "cosine",
        "OPTIM.NUM_ITERATIONS", 100,
        "OPTIM.WARMUP_STEPS", 4,
        "OPTIM.CLIP_GRAD_NORM", 10.0,
    ])
    tx = build_optimizer(cfg)
    params = jax.tree.map(jnp.asarray, init)
    state = tx.init(params)
    for g in grads_per_step:
        updates, state = tx.update(jax.tree.map(jnp.asarray, g), state, params)
        params = optax.apply_updates(params, updates)

    # torch side
    tparams = {
        "image_encoder.w": torch.tensor(init["image_encoder"]["w"],
                                        requires_grad=True),
        "text_encoder.w": torch.tensor(init["text_encoder"]["w"],
                                       requires_grad=True),
        "loss.w": torch.tensor(init["loss"]["w"], requires_grad=True),
    }
    groups = []
    for name, p in tparams.items():
        lr = 0.2 if "image_encoder" in name else 0.001
        groups.append({"params": [p], "lr": lr, "weight_decay": 1e-4})
    if optimizer_name == "sgd":
        topt = torch.optim.SGD(groups, momentum=0.9)
    else:
        topt = torch.optim.AdamW(groups)
    sched = torch.optim.lr_scheduler.LambdaLR(
        topt, lambda step: (step / 4 if step < 4
                            else math.cos((step - 4) / 96 * math.pi / 2) ** 2))
    slow = {k: p.detach().clone() for k, p in tparams.items()}
    for i, g in enumerate(grads_per_step):
        topt.zero_grad()
        tparams["image_encoder.w"].grad = torch.tensor(g["image_encoder"]["w"])
        tparams["text_encoder.w"].grad = torch.tensor(g["text_encoder"]["w"])
        tparams["loss.w"].grad = torch.tensor(g["loss"]["w"])
        torch.nn.utils.clip_grad_norm_(list(tparams.values()), 10.0)
        topt.step()
        sched.step()
        if lookahead_on and (i + 1) % 5 == 0:
            # Published Lookahead rule: fast <- slow + alpha*(fast - slow)
            with torch.no_grad():
                for k, p in tparams.items():
                    p.mul_(0.5).add_(slow[k], alpha=0.5)
                    slow[k] = p.detach().clone()

    ours = {
        "image_encoder.w": np.asarray(params["image_encoder"]["w"]),
        "text_encoder.w": np.asarray(params["text_encoder"]["w"]),
        "loss.w": np.asarray(params["loss"]["w"]),
    }
    theirs = {k: p.detach().numpy() for k, p in tparams.items()}
    return ours, theirs


@pytest.mark.parametrize("name", ["sgd", "adamw"])
def test_trajectory_matches_torch(name):
    ours, theirs = _run_pair(name, steps=8, lookahead_on=False)
    for k in ours:
        np.testing.assert_allclose(ours[k], theirs[k], rtol=2e-5, atol=2e-6)


def test_lookahead_trajectory_matches_torch_sgd():
    ours, theirs = _run_pair("sgd", steps=11, lookahead_on=True)
    for k in ours:
        np.testing.assert_allclose(ours[k], theirs[k], rtol=2e-5, atol=2e-6)


def test_lookahead_slow_params_accessible():
    cfg = Config(override_list=["OPTIM.LOOKAHEAD.USE", True])
    tx = build_optimizer(cfg)
    params = {"loss": {"w": jnp.ones(3)}}
    state = tx.init(params)
    slow = slow_params_from_state(state)
    np.testing.assert_array_equal(np.asarray(slow["loss"]["w"]), np.ones(3))


def test_clip_global_norm_matches_torch():
    cfg = Config(override_list=[
        "OPTIM.CLIP_GRAD_NORM", 1.0, "OPTIM.LOOKAHEAD.USE", False,
        "OPTIM.SGD_MOMENTUM", 0.0, "OPTIM.WEIGHT_DECAY", 0.0,
        "OPTIM.LR_DECAY_NAME", "none", "OPTIM.WARMUP_STEPS", 1,
        "OPTIM.NUM_ITERATIONS", 10,
    ])
    tx = build_optimizer(cfg)
    g = {"loss": {"w": jnp.asarray([3.0, 4.0])}}  # norm 5 -> clip to 1
    params = {"loss": {"w": jnp.zeros(2)}}
    state = tx.init(params)
    # step 0 has multiplier 0 (warmup); advance to multiplier 1
    updates, state = tx.update(g, state, params)
    updates, state = tx.update(g, state, params)
    got = np.asarray(updates["loss"]["w"])
    np.testing.assert_allclose(got, -0.001 * np.asarray([0.6, 0.8]), rtol=1e-5)


def test_unknown_optimizer_rejected():
    cfg = Config(override_list=["OPTIM.OPTIMIZER_NAME", "rmsprop"])
    with pytest.raises(KeyError):
        build_optimizer(cfg)


# ---------------------------------------------------------------------------
# Fused single-pass optimizer vs the composable optax chain
# ---------------------------------------------------------------------------

def _fused_case(opt_name, lookahead_on, steps=7):
    from clip_lite_tpu.optim.fused import build_fused_optimizer

    cfg = Config(override_list=[
        "OPTIM.OPTIMIZER_NAME", opt_name,
        "OPTIM.LOOKAHEAD.USE", lookahead_on,
        "OPTIM.LOOKAHEAD.STEPS", 3,
        "OPTIM.WARMUP_STEPS", 2, "OPTIM.NUM_ITERATIONS", 50,
        "OPTIM.CLIP_GRAD_NORM", 1.0,
        "OPTIM.WEIGHT_DECAY", 1e-4,
    ])
    rng = np.random.RandomState(0)
    params = {
        "image_encoder": {"w": jnp.asarray(rng.randn(8, 16), jnp.float32)},
        "text_encoder": {"w": jnp.asarray(rng.randn(4, 4), jnp.float32)},
        "loss": {"temperature": jnp.asarray(2.65926, jnp.float32)},
    }
    chain = build_optimizer(cfg)
    fused = build_fused_optimizer(cfg)
    cs, fs = chain.init(params), fused.init(params)
    cp, fp = params, params
    for i in range(steps):
        grads = jax.tree.map(
            lambda p: jnp.asarray(
                np.random.RandomState(100 + i).randn(*p.shape) *
                (3.0 if i == 0 else 0.1), jnp.float32), cp)
        updates, cs = chain.update(grads, cs, cp)
        cp = jax.tree.map(lambda p, u: p + u, cp, updates)
        fp, fs, gnorm = fused.apply(grads, fs, fp)
        assert np.isfinite(float(gnorm)) and float(gnorm) > 0
        for a, b in zip(jax.tree.leaves(cp), jax.tree.leaves(fp)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-6, atol=1e-7)
    return cp, fp, fs


@pytest.mark.parametrize("opt_name", ["sgd", "adamw"])
def test_fused_matches_chain(opt_name):
    """Fused single-pass update is step-exact vs the optax chain,
    including a Lookahead sync step (k=3 inside 7 steps) and a
    clip-active first step (grad scale 3x with clip 1.0)."""
    _fused_case(opt_name, lookahead_on=True)


def test_fused_matches_chain_no_lookahead():
    _fused_case("sgd", lookahead_on=False)


def test_hoisted_lookahead_matches_inline():
    """Hoisted mode (sync out of apply, run by the caller every k-th
    step — the TPU train-loop form) walks the exact same trajectory as
    the in-step Lookahead, including slow weights."""
    from clip_lite_tpu.optim.fused import (
        build_fused_optimizer,
        build_lookahead_sync,
    )

    k = 3
    cfg = Config(override_list=[
        "OPTIM.OPTIMIZER_NAME", "sgd",
        "OPTIM.LOOKAHEAD.USE", True, "OPTIM.LOOKAHEAD.STEPS", k,
        "OPTIM.WARMUP_STEPS", 2, "OPTIM.NUM_ITERATIONS", 50,
        "OPTIM.CLIP_GRAD_NORM", 1.0, "OPTIM.WEIGHT_DECAY", 1e-4,
    ])
    rng = np.random.RandomState(0)
    params = {
        "image_encoder": {"w": jnp.asarray(rng.randn(8, 16), jnp.float32)},
        "loss": {"temperature": jnp.asarray(2.65926, jnp.float32)},
    }
    inline = build_fused_optimizer(cfg)
    hoisted = build_fused_optimizer(cfg, hoist_lookahead=True)
    sync = build_lookahead_sync(cfg)
    i_s, h_s = inline.init(params), hoisted.init(params)
    i_p, h_p = params, params
    for i in range(1, 8):
        grads = jax.tree.map(
            lambda p: jnp.asarray(
                np.random.RandomState(100 + i).randn(*p.shape) * 0.1,
                jnp.float32), i_p)
        i_p, i_s, _ = inline.apply(grads, i_s, i_p)
        h_p, h_s, _ = hoisted.apply(grads, h_s, h_p)
        if i % k == 0:
            new_p, new_slow = sync(h_p, h_s.slow_params)
            h_p, h_s = new_p, h_s._replace(slow_params=new_slow)
        for a, b in zip(jax.tree.leaves(i_p), jax.tree.leaves(h_p)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-6, atol=1e-7,
                                       err_msg=f"params step {i}")
        for a, b in zip(jax.tree.leaves(i_s.slow_params),
                        jax.tree.leaves(h_s.slow_params)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-6, atol=1e-7,
                                       err_msg=f"slow step {i}")


def test_fused_slow_params_accessible():
    cp, _, fs = _fused_case("sgd", lookahead_on=True)
    slow = slow_params_from_state(fs, params=cp)
    assert slow is not None
    assert "image_encoder" in slow
    assert slow["image_encoder"]["w"].shape == (8, 16)
