"""Perf probe 6: per-op attribution of the BERT tower (the 29 ms lever).

Traces the isolated BERT-12 fwd+bwd at bs128 (rbg PRNG, bf16) and prints
the top ops by total device time, aggregated from the trace-viewer JSON
the profiler writes.  Also re-traces the full flagship step for a fresh
top-op table after the round-2 changes.

Appends to /tmp/perf_probe6.jsonl.
"""

from __future__ import annotations

import glob
import gzip
import json
import os
import shutil
from collections import defaultdict

import numpy as np

OUT = "/tmp/perf_probe6.jsonl"


def report(name, **kw):
    rec = {"name": name, **kw}
    print(json.dumps(rec), flush=True)
    with open(OUT, "a") as f:
        f.write(json.dumps(rec) + "\n")


def parse_trace(trace_dir, n_steps, top=40):
    """Aggregate device-side op durations from trace.json.gz."""
    paths = glob.glob(os.path.join(
        trace_dir, "plugins/profile/*/*.trace.json.gz"))
    if not paths:
        return None
    path = max(paths, key=os.path.getmtime)
    with gzip.open(path, "rt") as f:
        data = json.load(f)
    events = data.get("traceEvents", [])
    # Device lanes: pid whose process_name mentions TPU / device.
    pid_names = {}
    tid_names = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_names[e["pid"]] = e["args"].get("name", "")
        if e.get("ph") == "M" and e.get("name") == "thread_name":
            tid_names[(e["pid"], e["tid"])] = e["args"].get("name", "")
    device_pids = {p for p, n in pid_names.items()
                   if "TPU" in n or "/device" in n.lower()}
    agg = defaultdict(float)
    total = 0.0
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in device_pids:
            continue
        tname = tid_names.get((e["pid"], e["tid"]), "")
        if "step" in tname.lower():  # step lanes duplicate op lanes
            continue
        name = e.get("name", "?")
        dur = e.get("dur", 0) / 1e3  # us -> ms
        agg[name] += dur
        total += dur
    rows = sorted(agg.items(), key=lambda kv: -kv[1])[:top]
    return {
        "trace_total_ms_per_step": round(total / n_steps, 3),
        "top_ops": [
            {"op": k[:120], "ms_per_step": round(v / n_steps, 3)}
            for k, v in rows
        ],
    }


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_default_prng_impl", "rbg")
    rng = np.random.RandomState(0)
    B = 128

    from clip_lite_tpu.models.bert import BertModel

    bert = BertModel(num_hidden_layers=12, dtype_name="bfloat16",
                     add_pooler=False)
    ids = np.asarray(rng.randint(0, 30522, (B, 30)), np.int32)
    mask = np.ones((B, 30), np.int32)
    params = bert.init(jax.random.PRNGKey(0), ids, mask)["params"]

    def bert_loss(p, rkey):
        seq, _ = bert.apply({"params": p}, ids, mask, deterministic=False,
                            rngs={"dropout": rkey})
        return jnp.sum(seq)

    bg = jax.jit(jax.grad(bert_loss))
    key = jax.random.PRNGKey(1)
    g = bg(params, key)
    g = bg(params, key)
    _ = np.asarray(jax.tree.leaves(g)[0]).ravel()[0]

    tdir = "/tmp/probe6_bert_trace"
    shutil.rmtree(tdir, ignore_errors=True)
    n = 4
    jax.profiler.start_trace(tdir)
    for _ in range(n):
        g = bg(params, key)
    _ = np.asarray(jax.tree.leaves(g)[0]).ravel()[0]
    jax.profiler.stop_trace()
    res = parse_trace(tdir, n)
    report("bert12_fwdbwd_top_ops", **(res or {"error": "no trace"}))

    report("done")


if __name__ == "__main__":
    main()
