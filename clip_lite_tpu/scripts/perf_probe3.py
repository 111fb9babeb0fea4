"""Perf probe 3: PRNG implementation, fused optimizer in-step, XLA flags.

Variants of the flagship step (all bs128):
  1. baseline          — threefry PRNG, fused optimizer (new default)
  2. rbg PRNG          — jax_default_prng_impl=rbg (fast TPU-native bits
                         for the ~40 dropout masks/step)
  3. latency-hiding scheduler flag via compiler_options (if supported)

Run each in a SUBPROCESS so the PRNG impl (a startup config) is clean.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

CHILD = """
import json, time
import numpy as np
import jax

impl = {impl!r}
if impl:
    jax.config.update("jax_default_prng_impl", impl)

from clip_lite_tpu.config import Config
from clip_lite_tpu.engine import compile_train_step, create_train_state
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
    "OPTIM.FUSED", {fused},
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
step = compile_train_step(vl, tx, mesh, "data", donate=True)
dbatch = shard_batch(batch, mesh, "data")
key = jax.random.PRNGKey(0)
for _ in range(2):
    state, metrics = step(state, dbatch, key)
loss0 = float(metrics["total_loss"])
t0 = time.perf_counter()
n = 20
for _ in range(n):
    state, metrics = step(state, dbatch, key)
_ = float(metrics["total_loss"])
dt = (time.perf_counter() - t0) / n
print(json.dumps({{"name": {name!r}, "ms_per_call": round(dt * 1e3, 2),
                  "img_per_s": round(128 / dt, 1),
                  "loss0": round(loss0, 4)}}), flush=True)
"""


def run(name, impl="", fused=True):
    code = CHILD.format(impl=impl, fused=fused, name=name)
    p = subprocess.run([sys.executable, "-u", "-c", code],
                       capture_output=True, text=True, timeout=1200)
    for line in p.stdout.splitlines():
        if line.startswith("{"):
            print(line, flush=True)
            with open("/tmp/perf_probe3.jsonl", "a") as f:
                f.write(line + "\n")
            return
    print(json.dumps({"name": name,
                      "error": (p.stderr or p.stdout)[-300:]}), flush=True)
    with open("/tmp/perf_probe3.jsonl", "a") as f:
        f.write(json.dumps({"name": name,
                            "error": (p.stderr or p.stdout)[-300:]}) + "\n")


if __name__ == "__main__":
    run("flagship_fused_threefry", impl="", fused=True)
    run("flagship_fused_rbg", impl="rbg", fused=True)
    run("flagship_chain_threefry", impl="", fused=False)
    print("done")
