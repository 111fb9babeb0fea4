import time, numpy as np, jax
jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
from clip_lite_tpu.config import Config
from clip_lite_tpu.engine import compile_train_step, create_train_state
from clip_lite_tpu.factories import OptimizerFactory, PretrainingModelFactory
from clip_lite_tpu.parallel import create_mesh, shard_batch
from clip_lite_tpu.utils.common import apply_rng_impl

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
    "image": np.asarray(rng.randn(128,224,224,3), np.float32),
    "input_ids": np.asarray(rng.randint(0,30522,(128,30)), np.int32),
    "attention_mask": np.ones((128,30), np.int32),
}
state = create_train_state(model, tx, batch)
print("state created", flush=True)
mesh = create_mesh(data_axis="data")
step = compile_train_step(model, tx, mesh, "data", donate=True)
db = shard_batch(batch, mesh, "data")
key = jax.random.PRNGKey(0)
for i in range(3):
    t0 = time.perf_counter()
    state, m = step(state, db, key)
    _ = float(m["total_loss"])
    print(f"step {i}: {time.perf_counter()-t0:.2f}s loss={float(m['total_loss']):.4f}", flush=True)
t0=time.perf_counter(); n=20
for _ in range(n): state, m = step(state, db, key)
_ = float(m["total_loss"])
dt=(time.perf_counter()-t0)/n
print(f"flagship step: {dt*1e3:.2f} ms  {128/dt:.1f} img/s  (prev 77.7 ms / 1647)", flush=True)
