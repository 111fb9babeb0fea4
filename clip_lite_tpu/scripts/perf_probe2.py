"""Perf probe round 2: post-fix deltas + same-process trace/HLO capture.

Measures (JSON lines to stdout + /tmp/perf_probe2.jsonl):
  1. bert12_fwdbwd_bs128   — after the bf16 LayerNorm/gelu change
  2. optimizer_only        — the optax chain (clip+SGD+Lookahead+schedule)
                             over the full flagship param tree
  3. flagship_step_bs128   — full train step after all round-2 changes
  4. flagship_step_bs256   — batch scaling check
  5. trace + HLO dump from THIS process (names align for attribution):
     /tmp/probe2_trace + /tmp/probe2_hlo.txt
"""

from __future__ import annotations

import json
import time

import numpy as np

OUT = "/tmp/perf_probe2.jsonl"


def report(name, **kw):
    rec = {"name": name, **kw}
    print(json.dumps(rec), flush=True)
    with open(OUT, "a") as f:
        f.write(json.dumps(rec) + "\n")


def timed_calls(fn, args, n_calls, scalarize):
    out = None
    for _ in range(2):
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
    rng = np.random.RandomState(0)

    # (bert12 after bf16 LN/gelu measured 25.67 ms — within noise of the
    # round-1 25.02; kept out of the re-run to save a compile.)

    # Shared flagship setup ----------------------------------------------------
    from clip_lite_tpu.config import Config
    from clip_lite_tpu.engine import compile_train_step, create_train_state
    from clip_lite_tpu.factories import (
        OptimizerFactory,
        PretrainingModelFactory,
    )
    from clip_lite_tpu.parallel import create_mesh, shard_batch

    def flagship(bs):
        cfg = Config(override_list=[
            "MODEL.VISUAL.NETWORK_NAME", "resnet50",
            "MODEL.VISUAL.FEATURE_SIZE", 2048,
            "MODEL.TEXTUAL.NUM_HIDDEN_LAYERS", 12,
            "OPTIM.BATCH_SIZE", bs,
            "OPTIM.WARMUP_STEPS", 10, "OPTIM.NUM_ITERATIONS", 1000,
            "MODEL.LOSS.NEGATIVES", "global",
        ])
        vl = PretrainingModelFactory.from_config(cfg)
        tx = OptimizerFactory.from_config(cfg)
        batch = {
            "image": np.asarray(rng.randn(bs, 224, 224, 3), np.float32),
            "input_ids": np.asarray(
                rng.randint(0, 30522, (bs, 30)), np.int32),
            "attention_mask": np.ones((bs, 30), np.int32),
        }
        state = create_train_state(vl, tx, batch)
        mesh = create_mesh(data_axis="data")
        step = compile_train_step(vl, tx, mesh, "data", donate=True)
        dbatch = shard_batch(batch, mesh, "data")
        return cfg, tx, state, step, dbatch

    cfg, tx, state, step, dbatch = flagship(128)
    key = jax.random.PRNGKey(0)

    # 2. optimizer-only --------------------------------------------------------
    fake_grads = jax.tree.map(lambda p: p * 1e-3, state.params)

    @jax.jit
    def opt_only(params, opt_state, grads):
        updates, new_opt = tx.update(grads, opt_state, params)
        new_params = jax.tree.map(lambda p, u: p + u, params, updates)
        probe = sum(x.ravel()[0].astype(jnp.float32)
                    for x in jax.tree.leaves(new_params))
        return new_params, new_opt, probe

    dt = timed_calls(opt_only, (state.params, state.opt_state, fake_grads),
                     15, lambda o: o[2])
    report("optimizer_only", ms_per_call=round(dt * 1e3, 2))

    # 3. flagship bs128 --------------------------------------------------------
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
           img_per_s=round(128 / dt, 1))

    # 5a. trace from THIS process ---------------------------------------------
    try:
        jax.profiler.start_trace("/tmp/probe2_trace")
        for _ in range(3):
            state, metrics = step(state, dbatch, key)
        _ = float(metrics["total_loss"])
        jax.profiler.stop_trace()
        report("trace", ok=True)
    except Exception as e:
        report("trace", ok=False, error=str(e)[:150])

    # 5b. HLO text (cached compile, same process => names align) ---------------
    try:
        txt = step.lower(state, dbatch, key).compile().as_text()
        with open("/tmp/probe2_hlo.txt", "w") as f:
            f.write(txt)
        report("hlo", bytes=len(txt))
    except Exception as e:
        report("hlo", error=str(e)[:150])

    del state, step, dbatch

    # 4. flagship bs256 --------------------------------------------------------
    try:
        _, _, state2, step2, dbatch2 = flagship(256)
        for _ in range(2):
            state2, metrics = step2(state2, dbatch2, key)
        _ = float(metrics["total_loss"])
        t0 = time.perf_counter()
        n = 10
        for _ in range(n):
            state2, metrics = step2(state2, dbatch2, key)
        _ = float(metrics["total_loss"])
        dt = (time.perf_counter() - t0) / n
        report("flagship_step_bs256", ms_per_call=round(dt * 1e3, 2),
               img_per_s=round(256 / dt, 1))
    except Exception as e:
        report("flagship_step_bs256", error=f"{type(e).__name__}: {e}"[:150])

    report("done")


if __name__ == "__main__":
    main()
