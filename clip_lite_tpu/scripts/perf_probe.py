"""On-chip performance attribution probe (round-2 perf campaign).

Runs a sequence of bounded measurements on the real TPU and prints one
JSON line per measurement (also appended to /tmp/perf_probe.jsonl so a
wedged tunnel doesn't eat partial results):

  1. dispatch          — per-call overhead of a trivial jitted op
  2. conv_stack_bn     — 6x [ConvBN 3x3 c256 + relu] fwd, bs128 @ 56x56
  3. conv_stack_nobn   — same without BatchNorm (isolates BN cost)
  4. rn50_fwd / rn50_fwdbwd — image tower alone, bs128 @ 224
  5. bert_fwdbwd       — text tower alone, bs128 @ 30 tokens
  6. flagship_step     — full compiled train step (the bench.py program)
  7. profiler_trace    — attempts jax.profiler through the tunnel

Sync discipline (axon tunnel): block_until_ready does NOT synchronize;
every timing loop ends by fetching a scalar that data-depends on the
last call in the chain.  The ~30 ms fetch cost is amortized over N calls
and the dispatch baseline is reported separately.
"""

from __future__ import annotations

import json
import time

import numpy as np

OUT = "/tmp/perf_probe.jsonl"


def report(name, **kw):
    rec = {"name": name, **kw}
    print(json.dumps(rec), flush=True)
    with open(OUT, "a") as f:
        f.write(json.dumps(rec) + "\n")


def timed_calls(fn, args, n_calls, scalarize):
    """Median-free simple timing: N sequential dispatches, one scalar
    fetch off the last result. Returns seconds per call."""
    out = None
    for _ in range(2):  # warmup (ensures compile done)
        out = fn(*args)
    _ = float(scalarize(out))
    t0 = time.perf_counter()
    for _ in range(n_calls):
        out = fn(*args)
    _ = float(scalarize(out))
    return (time.perf_counter() - t0) / n_calls


def main():
    import jax
    import jax.numpy as jnp

    dev = jax.devices()[0]
    report("env", platform=dev.platform, kind=getattr(dev, "device_kind", "?"))

    # 1. dispatch overhead ---------------------------------------------------
    @jax.jit
    def tiny(x):
        return x + 1.0

    x = jnp.zeros((8, 128), jnp.float32)
    dt = timed_calls(tiny, (x,), 40, lambda o: o[0, 0])
    report("dispatch", ms_per_call=round(dt * 1e3, 3))

    # 2/3. conv stacks -------------------------------------------------------
    from flax import linen as nn

    class Stack(nn.Module):
        use_bn: bool = True

        @nn.compact
        def __call__(self, x):
            for i in range(6):
                x = nn.Conv(256, (3, 3), use_bias=False, dtype=jnp.bfloat16,
                            param_dtype=jnp.float32, name=f"c{i}")(x)
                if self.use_bn:
                    x = nn.BatchNorm(use_running_average=False, momentum=0.9,
                                     dtype=jnp.bfloat16,
                                     param_dtype=jnp.float32,
                                     name=f"b{i}")(x)
                x = nn.relu(x)
            return jnp.sum(x.astype(jnp.float32))

    rng = np.random.RandomState(0)
    xin = jnp.asarray(rng.randn(128, 56, 56, 256), jnp.bfloat16)
    # 6 convs * 2*(3*3*256)*256 MACs * 56*56*128 = FLOPs
    stack_gflops = 6 * 2 * 9 * 256 * 256 * 56 * 56 * 128 / 1e9
    for use_bn, name in ((True, "conv_stack_bn"), (False, "conv_stack_nobn")):
        m = Stack(use_bn=use_bn)
        v = m.init(jax.random.PRNGKey(0), xin)

        f = jax.jit(lambda v, x: m.apply(v, x, mutable=["batch_stats"])[0])
        dt = timed_calls(f, (v, xin), 20, lambda o: o)
        report(name, ms_per_call=round(dt * 1e3, 3),
               tflops=round(stack_gflops / dt / 1e3, 1))

    # 4. resnet50 alone ------------------------------------------------------
    from clip_lite_tpu.models.resnet import resnet50

    model = resnet50(dtype_name="bfloat16")
    img = jnp.asarray(rng.randn(128, 224, 224, 3), jnp.bfloat16)
    variables = model.init(jax.random.PRNGKey(0), img, train=False)
    params, stats = variables["params"], variables["batch_stats"]

    fwd = jax.jit(lambda p, s, x: jnp.sum(model.apply(
        {"params": p, "batch_stats": s}, x, train=True,
        mutable=["batch_stats"])[0]))
    dt = timed_calls(fwd, (params, stats, img), 15, lambda o: o)
    report("rn50_fwd_bs128", ms_per_call=round(dt * 1e3, 2),
           img_per_s=round(128 / dt, 1))

    def loss_fn(p, s, x):
        out, mut = model.apply({"params": p, "batch_stats": s}, x,
                               train=True, mutable=["batch_stats"])
        return jnp.sum(out.astype(jnp.float32) ** 2)

    gfn = jax.jit(lambda p, s, x: sum(
        jnp.sum(jnp.square(g.astype(jnp.float32)))
        for g in jax.tree.leaves(jax.grad(loss_fn)(p, s, x))))
    dt = timed_calls(gfn, (params, stats, img), 12, lambda o: o)
    report("rn50_fwdbwd_bs128", ms_per_call=round(dt * 1e3, 2),
           img_per_s=round(128 / dt, 1),
           mfu_pct=round(100 * 128 * 3 * 8.2e9 / dt / 197e12, 1))

    # 5. bert12 alone --------------------------------------------------------
    from clip_lite_tpu.models.bert import BertModel

    bert = BertModel(num_hidden_layers=12, dtype_name="bfloat16")
    ids = jnp.asarray(rng.randint(0, 30522, (128, 30)), jnp.int32)
    mask = jnp.ones((128, 30), jnp.int32)
    bvars = bert.init(jax.random.PRNGKey(0), ids, mask)

    def bloss(p, ids, mask):
        seq, pooled = bert.apply({"params": p}, ids, mask)
        return jnp.sum(pooled.astype(jnp.float32) ** 2)

    bg = jax.jit(lambda p, i, m: sum(
        jnp.sum(jnp.square(g.astype(jnp.float32)))
        for g in jax.tree.leaves(jax.grad(bloss)(p, i, m))))
    dt = timed_calls(bg, (bvars["params"], ids, mask), 12, lambda o: o)
    report("bert12_fwdbwd_bs128", ms_per_call=round(dt * 1e3, 2),
           img_per_s=round(128 / dt, 1))

    # 6. flagship full step --------------------------------------------------
    from clip_lite_tpu.config import Config
    from clip_lite_tpu.engine import compile_train_step, create_train_state
    from clip_lite_tpu.factories import (
        OptimizerFactory,
        PretrainingModelFactory,
    )
    from clip_lite_tpu.parallel import create_mesh, shard_batch

    cfg = Config(override_list=[
        "MODEL.VISUAL.NETWORK_NAME", "resnet50",
        "MODEL.VISUAL.FEATURE_SIZE", 2048,
        "MODEL.TEXTUAL.NUM_HIDDEN_LAYERS", 12,
        "OPTIM.BATCH_SIZE", 128,
        "OPTIM.WARMUP_STEPS", 10, "OPTIM.NUM_ITERATIONS", 1000,
        "MODEL.LOSS.NEGATIVES", "global",
    ])
    vl = PretrainingModelFactory.from_config(cfg)
    tx = OptimizerFactory.from_config(cfg)
    batch = {
        "image": np.asarray(rng.randn(128, 224, 224, 3), np.float32),
        "input_ids": np.asarray(rng.randint(0, 30522, (128, 30)), np.int32),
        "attention_mask": np.ones((128, 30), np.int32),
    }
    state = create_train_state(vl, tx, batch)
    mesh = create_mesh(data_axis="data")
    step = compile_train_step(vl, tx, mesh, "data", donate=True)
    dbatch = shard_batch(batch, mesh, "data")
    key = jax.random.PRNGKey(0)

    for _ in range(2):
        state, metrics = step(state, dbatch, key)
    _ = float(metrics["total_loss"])
    t0 = time.perf_counter()
    n = 20
    for _ in range(n):
        state, metrics = step(state, dbatch, key)
    _ = float(metrics["total_loss"])
    dt = (time.perf_counter() - t0) / n
    report("flagship_step_bs128", ms_per_call=round(dt * 1e3, 2),
           img_per_s=round(128 / dt, 1),
           mfu_pct=round(100 * 128 * 3 * 14.9e9 / dt / 197e12, 1))

    # 7. profiler attempt ----------------------------------------------------
    import glob
    import os

    try:
        jax.profiler.start_trace("/tmp/probe_trace")
        for _ in range(3):
            state, metrics = step(state, dbatch, key)
        _ = float(metrics["total_loss"])
        jax.profiler.stop_trace()
        files = glob.glob("/tmp/probe_trace/**/*", recursive=True)
        sz = sum(os.path.getsize(f) for f in files if os.path.isfile(f))
        report("profiler_trace", ok=True, n_files=len(files), bytes=sz)
    except Exception as e:
        report("profiler_trace", ok=False, error=f"{type(e).__name__}: {e}"[:200])

    report("done")


if __name__ == "__main__":
    main()
