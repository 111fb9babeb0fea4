"""Perf probe 4: buffer donation retry + XLA compiler-option experiments.

Round-1 found donation fails on the tunneled backend (INVALID_ARGUMENT
at execution) — retry now, and test whether per-jit compiler_options
reach the remote compiler (latency-hiding scheduler).  Each variant runs
in a subprocess with the rbg PRNG.
"""

from __future__ import annotations

import json
import subprocess
import sys

CHILD = """
import json, time
import numpy as np
import jax

jax.config.update("jax_default_prng_impl", "rbg")

from clip_lite_tpu.config import Config
from clip_lite_tpu.engine import create_train_state, make_train_step
from clip_lite_tpu.factories import OptimizerFactory, PretrainingModelFactory
from clip_lite_tpu.parallel import create_mesh, shard_batch

rng = np.random.RandomState(0)
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
batch = {{
    "image": np.asarray(rng.randn(128, 224, 224, 3), np.float32),
    "input_ids": np.asarray(rng.randint(0, 30522, (128, 30)), np.int32),
    "attention_mask": np.ones((128, 30), np.int32),
}}
state = create_train_state(vl, tx, batch)
mesh = create_mesh(data_axis="data")
raw = make_train_step(vl, tx, "data")
donate = (0,) if {donate} else ()
jitted = jax.jit(raw, donate_argnums=donate)
opts = {opts}
if opts:
    dbatch = shard_batch(batch, mesh, "data")
    key = jax.random.PRNGKey(0)
    step = jitted.lower(state, dbatch, key).compile(compiler_options=opts)
else:
    step = jitted
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
print(json.dumps({{"name": {name!r}, "ms_per_call": round(dt * 1e3, 2),
                  "img_per_s": round(128 / dt, 1)}}), flush=True)
"""


def run(name, donate=False, opts=None):
    code = CHILD.format(donate=donate, opts=opts or {}, name=name)
    try:
        p = subprocess.run([sys.executable, "-u", "-c", code],
                           capture_output=True, text=True, timeout=1200)
        out = None
        for line in p.stdout.splitlines():
            if line.startswith("{"):
                out = line
        rec = out or json.dumps(
            {"name": name, "error": (p.stderr or p.stdout)[-300:]})
    except subprocess.TimeoutExpired:
        rec = json.dumps({"name": name, "error": "timeout"})
    print(rec, flush=True)
    with open("/tmp/perf_probe4.jsonl", "a") as f:
        f.write(rec + "\n")


if __name__ == "__main__":
    run("donate_retry", donate=True)
    run("latency_hiding", donate=False,
        opts={"xla_tpu_enable_latency_hiding_scheduler": "true"})
    print("done")
