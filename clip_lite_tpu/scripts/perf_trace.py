"""Per-op trace attribution for a training step — the profiling CLI.

Companion of ``train.py --profile-dir``: compiles the train step for a
given config, times it, captures a ``jax.profiler`` trace, and prints
the per-component / per-category device-time and HBM-bytes tables plus
the bandwidth-aware roofline (utils/trace.py).  Replaces the round-2
``perf_probe*.py`` scratch family (their conclusions live in
docs/PERF_NOTES.md).

Usage (flagship, bs128):
    python -m clip_lite_tpu.scripts.perf_trace
    python -m clip_lite_tpu.scripts.perf_trace --batch 256 \
        --override MODEL.TEXTUAL.NUM_HIDDEN_LAYERS 6
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--config", default=None, help="YAML config path")
    p.add_argument("--override", nargs="*", default=[],
                   help="dotted config overrides (KEY VALUE ...)")
    p.add_argument("--batch", type=int, default=128)
    p.add_argument("--seq", type=int, default=30)
    p.add_argument("--steps", type=int, default=10,
                   help="timed steps (trace uses 3)")
    p.add_argument("--trace-dir", default="/tmp/clip_lite_perf_trace")
    p.add_argument("--json", action="store_true",
                   help="print ONE JSON line instead of tables")
    p.add_argument("--hoist-la", action="store_true",
                   help="trace the hoisted-Lookahead step (what bench.py "
                        "and train.py run on TPU); the k-th-step sync is "
                        "a separate program and NOT in this trace")
    args = p.parse_args()

    import jax

    from clip_lite_tpu.config import Config
    from clip_lite_tpu.engine import compile_train_step, create_train_state
    from clip_lite_tpu.factories import (
        OptimizerFactory,
        PretrainingModelFactory,
    )
    from clip_lite_tpu.parallel import create_mesh, shard_batch
    from clip_lite_tpu.utils.common import apply_rng_impl
    from clip_lite_tpu.utils.trace import trace_step_roofline

    jax.config.update("jax_compilation_cache_dir", "/tmp/clip_lite_jaxcache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    overrides = [
        "MODEL.VISUAL.NETWORK_NAME", "resnet50",
        "MODEL.VISUAL.FEATURE_SIZE", 2048,
        "MODEL.TEXTUAL.NUM_HIDDEN_LAYERS", 12,
        "OPTIM.BATCH_SIZE", args.batch,
        "OPTIM.WARMUP_STEPS", 10, "OPTIM.NUM_ITERATIONS", 1000,
        "MODEL.LOSS.NEGATIVES", "global",
    ] + list(args.override)
    cfg = Config(args.config, override_list=overrides)
    apply_rng_impl(cfg)

    model = PretrainingModelFactory.from_config(cfg)
    tx = OptimizerFactory.from_config(cfg, hoist_lookahead=args.hoist_la)
    rng = np.random.RandomState(0)
    b, s = args.batch, args.seq
    batch = {
        "image": np.asarray(rng.randn(b, 224, 224, 3), np.float32),
        "input_ids": np.asarray(
            rng.randint(0, cfg.MODEL.TEXTUAL.VOCAB_SIZE, (b, s)), np.int32),
        "attention_mask": np.ones((b, s), np.int32),
    }
    state = create_train_state(model, tx, batch)
    mesh = create_mesh(data_axis=cfg.PARALLEL.DATA_AXIS)
    step = compile_train_step(model, tx, mesh, cfg.PARALLEL.DATA_AXIS,
                              donate=True)
    db = shard_batch(batch, mesh, cfg.PARALLEL.DATA_AXIS)
    key = jax.random.PRNGKey(0)

    for _ in range(3):  # compile + steady
        state, m = step(state, db, key)
    _ = float(m["total_loss"])  # tunnel-safe sync

    t0 = time.perf_counter()
    for _ in range(args.steps):
        state, m = step(state, db, key)
    _ = float(m["total_loss"])
    step_ms = (time.perf_counter() - t0) / args.steps * 1e3

    n_trace = 3

    def run():
        nonlocal state
        for _ in range(n_trace):
            state, mm = step(state, db, key)
        _ = float(mm["total_loss"])

    summary = trace_step_roofline(run, n_trace, args.trace_dir)
    out = {"step_ms": round(step_ms, 2),
           "img_per_sec": round(b / step_ms * 1e3, 1)}
    if summary:
        out.update(summary)
    if args.json:
        print(json.dumps(out))
        return
    print(f"step: {out['step_ms']} ms = {out['img_per_sec']} img/s")
    if not summary:
        print("(no trace available on this backend)")
        return
    print(f"device time/step: {summary['measured_ms']} ms | rooflines: "
          f"flops {summary['flops_roofline_ms']} ms, "
          f"bytes {summary['bytes_roofline_ms']} ms, "
          f"per-op max {summary['per_op_roofline_ms']} ms")
    print(f"HBM traffic/step: {summary['total_gbytes_per_step']} GB, "
          f"{summary['total_gflops_per_step']} GFLOP")
    for title, table in (("component", summary["by_component"]),
                         ("category", summary["by_category"])):
        print(f"\nby {title}:")
        for k, v in table.items():
            print(f"  {k:<28} {v['ms']:>8.3f} ms  {v['gbytes']:>8.3f} GB"
                  f"  x{v['n']}")


if __name__ == "__main__":
    main()
