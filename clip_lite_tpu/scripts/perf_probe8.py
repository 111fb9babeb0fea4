"""Perf probe 8: full-step trace attribution after the round-2 kernels
(fused attention + s2d stem).  Groups device time by model component."""
from __future__ import annotations

import glob, gzip, json, os, re, shutil, time
from collections import defaultdict

import numpy as np

OUT = "/tmp/perf_probe8.jsonl"


def report(name, **kw):
    rec = {"name": name, **kw}
    print(json.dumps(rec), flush=True)
    with open(OUT, "a") as f:
        f.write(json.dumps(rec) + "\n")


def main():
    import jax

    from clip_lite_tpu.config import Config
    from clip_lite_tpu.engine import compile_train_step, create_train_state
    from clip_lite_tpu.factories import (OptimizerFactory,
                                         PretrainingModelFactory)
    from clip_lite_tpu.parallel import create_mesh, shard_batch
    from clip_lite_tpu.utils.common import apply_rng_impl

    jax.config.update("jax_compilation_cache_dir", "/tmp/clip_lite_jaxcache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    rng = np.random.RandomState(0)
    cfg = Config(override_list=[
        "MODEL.VISUAL.NETWORK_NAME", "resnet50",
        "MODEL.VISUAL.FEATURE_SIZE", 2048,
        "MODEL.TEXTUAL.NUM_HIDDEN_LAYERS", 12,
        "OPTIM.BATCH_SIZE", 128,
        "OPTIM.WARMUP_STEPS", 10, "OPTIM.NUM_ITERATIONS", 1000,
        "MODEL.LOSS.NEGATIVES", "global",
    ])
    apply_rng_impl(cfg)
    model = PretrainingModelFactory.from_config(cfg)
    tx = OptimizerFactory.from_config(cfg)
    batch = {
        "image": np.asarray(rng.randn(128, 224, 224, 3), np.float32),
        "input_ids": np.asarray(rng.randint(0, 30522, (128, 30)), np.int32),
        "attention_mask": np.ones((128, 30), np.int32),
    }
    state = create_train_state(model, tx, batch)
    mesh = create_mesh(data_axis="data")
    step = compile_train_step(model, tx, mesh, "data", donate=True)
    db = shard_batch(batch, mesh, "data")
    key = jax.random.PRNGKey(0)
    for _ in range(3):
        state, m = step(state, db, key)
    _ = float(m["total_loss"])
    t0 = time.perf_counter()
    for _ in range(10):
        state, m = step(state, db, key)
    _ = float(m["total_loss"])
    report("step_ms", ms=round((time.perf_counter() - t0) / 10 * 1e3, 2))

    tdir = "/tmp/probe8_step_trace"
    shutil.rmtree(tdir, ignore_errors=True)
    N = 3
    jax.profiler.start_trace(tdir)
    for _ in range(N):
        state, m = step(state, db, key)
    _ = float(m["total_loss"])
    jax.profiler.stop_trace()

    path = max(glob.glob(tdir + "/plugins/profile/*/*.trace.json.gz"),
               key=os.path.getmtime)
    with gzip.open(path, "rt") as f:
        data = json.load(f)
    events = [e for e in data["traceEvents"]
              if e.get("ph") == "X" and e.get("args")
              and "hlo_category" in e["args"]]

    def component(tf_op: str) -> str:
        if "BertModel" in tf_op or "TextEncoder" in tf_op:
            m2 = re.search(r"(intermediate|output|qkv|attn_out|pallas)", tf_op)
            return "bert/" + (m2.group(1) if m2 else "other")
        if "ResNet" in tf_op or "ImageEncoder" in tf_op:
            m2 = re.search(r"(stem|layer\d)", tf_op)
            return "resnet/" + (m2.group(1) if m2 else "other")
        if "lookahead" in tf_op or "sgd" in tf_op or "fused_update" in tf_op:
            return "optimizer"
        if "loss" in tf_op.lower() or "critic" in tf_op.lower():
            return "loss"
        return "untagged"

    agg = defaultdict(lambda: [0.0, 0])
    bycat = defaultdict(float)
    for e in events:
        a = e["args"]
        c = component(a.get("tf_op", ""))
        agg[c][0] += e["dur"] / 1e3
        agg[c][1] += 1
        bycat[a["hlo_category"]] += e["dur"] / 1e3
    rows = sorted(agg.items(), key=lambda kv: -kv[1][0])
    report("by_component", rows=[
        {"c": c, "ms": round(ms / N, 3), "n": n // N} for c, (ms, n) in rows])
    report("by_category", rows=[
        {"c": c, "ms": round(ms / N, 3)}
        for c, ms in sorted(bycat.items(), key=lambda kv: -kv[1])[:12]])
    report("done")


if __name__ == "__main__":
    main()
