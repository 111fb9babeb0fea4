"""Headline benchmark: flagship pretrain throughput, images/sec/chip.

Measures the steady-state compiled training step of the flagship
configuration (ResNet-50 + BERT-12 + JSD dot critic, reference
configs/done/fs_bs1024_ni250k.yaml) on the available TPU chip(s) with
on-device synthetic data (the compute path, excluding host input — the
input pipeline is benchmarked separately and overlapped in training).

The headline runs the TPU-tuned flagship semantics
(configs/fs_tpu_tuned.yaml): sequence-bucketed captions at S=12, the
dominant COCO bucket (captions average ~12 of MAX_CAPTION_LENGTH=30
wordpiece tokens; DATA.SEQ_BUCKETS trims each batch to its bucket and
padding is attention-masked, so outputs are exactly unchanged — pinned
by test_data::test_seq_bucketing_trims_and_is_exact).  The fixed-shape
S=30 step (the reference's training shape) is reported alongside as
``s30_img_per_sec``.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "images/sec/chip", "vs_baseline": N,
   "vs_bandwidth_roofline": N, ...}

vs_baseline is measured / (0.9 x bf16 FLOPs roofline) per BASELINE.md's
north star (the roofline is the analytic FLOPs estimate for the S=30
model — kept fixed so numbers stay comparable across rounds).
vs_bandwidth_roofline is measured against the bandwidth-aware per-op
roofline sum(max(bytes/HBM_BW, flops/peak)) machine-computed from a
jax.profiler trace of the very step being measured (utils/trace.py) —
ResNet-50 training is HBM-bound, so this is the reachable ceiling.
"""

from __future__ import annotations

import json
import time

import numpy as np


# Analytic per-image training FLOPs for the flagship model @ 224x224, 30
# tokens: ResNet-50 fwd ~8.2 GFLOP (4.09 GMACs), BERT-base fwd
# 2*110e6*30 tokens ~6.6 GFLOP, critics/projections ~0.1 GFLOP; x3 for
# fwd+bwd.
FLAGSHIP_TRAIN_GFLOPS_PER_IMAGE = 3 * (8.2 + 6.6 + 0.1)

PEAK_BF16_TFLOPS = {
    "TPU v5 lite": 197.0,  # v5e
    "TPU v5e": 197.0,
    "TPU v4": 275.0,
    "TPU v6 lite": 918.0,
}


def peak_tflops(device) -> float:
    kind = getattr(device, "device_kind", "")
    for name, peak in PEAK_BF16_TFLOPS.items():
        if kind.startswith(name):
            return peak
    return 197.0  # assume v5e


def _progress(msg: str) -> None:
    """Timestamped stage marker on stderr (stdout carries only the JSON
    result line): a killed/stalled run shows WHERE it was — through the
    remote-compile tunnel a single cold Mosaic kernel can take minutes,
    which is indistinguishable from a hang without these."""
    import sys

    print(f"bench[{time.strftime('%H:%M:%S')}]: {msg}",
          file=sys.stderr, flush=True)


def _enable_compile_cache() -> None:
    """Persistent XLA compilation cache: the flagship step now contains
    Pallas (Mosaic) kernels whose first compile through the tunnel costs
    ~1-3 min; cached recompiles are sub-second."""
    import os

    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        os.environ.get("JAX_COMPILATION_CACHE_DIR",
                       "/tmp/clip_lite_jaxcache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def _wall_stats(walls) -> dict:
    """p50/max of per-call wall times in ms (stall diagnosis)."""
    if not walls:
        return {}
    s = sorted(walls)
    return {"p50": round(s[len(s) // 2] * 1e3, 2),
            "max": round(s[-1] * 1e3, 2)}


def _measure(per_chip_batch: int, steps_per_call: int = 1,
             seq: int = 12, trace_audit: bool = True) -> dict:
    # steps_per_call>1 (device-side scan) measured within noise of
    # single-step here (1427 vs 1460 img/s): dispatch is async so host
    # overhead already overlaps; keep the simpler single-step benchmark.
    import jax

    _enable_compile_cache()

    from clip_lite_tpu.config import Config
    from clip_lite_tpu.engine import (
        compile_train_step,
        create_train_state,
        stack_batches,
    )
    from clip_lite_tpu.factories import (
        OptimizerFactory,
        PretrainingModelFactory,
    )
    from clip_lite_tpu.parallel import create_mesh, shard_batch

    devices = jax.devices()
    n_chips = len(devices)
    batch_size = per_chip_batch * n_chips

    cfg = Config(override_list=[
        "MODEL.VISUAL.NETWORK_NAME", "resnet50",
        "MODEL.VISUAL.FEATURE_SIZE", 2048,
        "MODEL.TEXTUAL.NUM_HIDDEN_LAYERS", 12,
        "OPTIM.BATCH_SIZE", batch_size,
        "OPTIM.WARMUP_STEPS", 10, "OPTIM.NUM_ITERATIONS", 1000,
        "MODEL.LOSS.NEGATIVES", "global",
    ])
    from clip_lite_tpu.utils.common import apply_rng_impl

    apply_rng_impl(cfg)  # rbg bit generation (config default)
    model = PretrainingModelFactory.from_config(cfg)
    # Hoisted Lookahead, as train.py runs it on TPU: the sync is a
    # separate compiled call every k-th step (its cost is INCLUDED in the
    # timed loop below at the true cadence).
    hoist_la = devices[0].platform == "tpu" and steps_per_call <= 1
    tx = OptimizerFactory.from_config(cfg, hoist_lookahead=hoist_la)
    la_k = cfg.OPTIM.LOOKAHEAD.STEPS
    mesh = create_mesh(data_axis=cfg.PARALLEL.DATA_AXIS)
    if hoist_la:
        from clip_lite_tpu.optim.fused import build_lookahead_sync
        from clip_lite_tpu.parallel.mesh import donation_supported

        la_sync = build_lookahead_sync(cfg, donate=donation_supported(mesh))

    def make_batch(s):
        rng = np.random.RandomState(0)
        return {
            "image": np.asarray(rng.randn(batch_size, 224, 224, 3),
                                np.float32),
            "input_ids": np.asarray(
                rng.randint(0, 30522, (batch_size, s)), np.int32),
            "attention_mask": np.ones((batch_size, s), np.int32),
        }

    batch = make_batch(seq)
    _progress(f"building state (bs={batch_size}, seq={seq})")
    state = create_train_state(model, tx, batch)
    step = compile_train_step(model, tx, mesh, cfg.PARALLEL.DATA_AXIS,
                              donate=True, steps_per_call=steps_per_call)
    if steps_per_call > 1:
        batch = stack_batches([batch] * steps_per_call)

    def put(b):
        return shard_batch(b, mesh, cfg.PARALLEL.DATA_AXIS) \
            if steps_per_call <= 1 else jax.device_put(b)

    device_batch = put(batch)
    key = jax.random.PRNGKey(0)

    # Warmup (compile + steady calls). NOTE: on the axon tunnel backend
    # block_until_ready does not synchronize; fetching a scalar that
    # data-depends on the full step chain does.
    it = 0

    def one_step():
        nonlocal state, it
        state, m = step(state, device_batch, key)
        it += 1
        if hoist_la and it % la_k == 0:
            p, s = la_sync(state.params, state.opt_state.slow_params)
            state = state.replace(
                params=p, opt_state=state.opt_state._replace(slow_params=s))
        return m

    # Warmup must cover EVERY program the timed loop dispatches: the step
    # itself AND the hoisted Lookahead sync, which first fires at
    # it == la_k.  Round 3's 2-step warmup let la_sync compile INSIDE the
    # timed loop (~8.5 s of remote compile over 20 steps), reporting
    # 261 img/s for a 64 ms step — the BENCH_r03 headline collapse.
    n_warm = max(3, la_k + 2) if hoist_la else 3
    _progress(f"compiling + warming the step ({n_warm} iters; cold Mosaic "
              "compiles can take minutes through the tunnel)")
    for _ in range(n_warm):
        metrics = one_step()
    _ = float(metrics["total_loss"])

    # Ramp to the backend's steady dispatch path before timing: the
    # tunnel's per-call overhead decays over the first ~40 calls of a
    # program (measured: 15.5 -> 5.0 -> 1.6 ms/call across consecutive
    # 20-call windows on an idle relay).  Timing inside the ramp
    # understates throughput by up to 3x on a cold relay — ramp until
    # two consecutive 10-call windows agree within 10% (or 6 windows).
    _progress("ramping to steady dispatch")
    prev = None
    for _ in range(6):
        t0 = time.perf_counter()
        for _ in range(10):
            m = one_step()
        _ = float(m["total_loss"])
        cur = time.perf_counter() - t0
        if prev is not None and abs(cur - prev) / max(cur, prev) < 0.10:
            break
        prev = cur

    last_walls = []  # per-call wall times of the most recent timed loop

    def timed(n_calls):
        # Per-call wall times instrument the intermittent host-side stall
        # the round-4 remeasure rescued (BENCH_r04 postmortem): dispatch
        # is async, so a backpressured/stalled call surfaces as ONE long
        # wall sample rather than a uniform slowdown — the distribution
        # tells tunnel hiccup (one spike) from cold program (every call).
        #
        # GC is frozen + disabled for the loop: a cyclic collection of
        # the warmup's tracing garbage (jaxprs hold cycles) can cost tens
        # of ms mid-loop — one of the stall candidates behind the r4
        # remeasure.  Collect once up front so the pause happens HERE.
        import gc

        gc.collect()
        gc.freeze()
        gc.disable()
        try:
            last_walls.clear()
            t0 = time.perf_counter()
            for _ in range(n_calls):
                t1 = time.perf_counter()
                m = one_step()
                last_walls.append(time.perf_counter() - t1)
            _ = float(m["total_loss"])  # sync: depends on the whole chain
            return batch_size * steps_per_call * n_calls / (
                time.perf_counter() - t0) / n_chips
        finally:
            gc.enable()
            gc.unfreeze()

    n_calls = max(3, 20 // steps_per_call)
    _progress("warm; timing")
    per_chip = timed(n_calls)
    _progress(f"headline {per_chip:.1f} img/s/chip")

    roofline = peak_tflops(devices[0]) * 1e3 / FLAGSHIP_TRAIN_GFLOPS_PER_IMAGE
    target = 0.9 * roofline
    result = {
        "metric": "flagship_pretrain_throughput",
        "value": round(per_chip, 2),
        "unit": "images/sec/chip",
        "vs_baseline": round(per_chip / target, 4),
        "per_chip_batch": per_chip_batch,
        "steps_per_call": steps_per_call,
        "seq_bucket": seq,
    }

    if trace_audit:
        # Machine-checked bandwidth-aware roofline of THIS step: per-op
        # sum(max(bytes/HBM_BW, flops/peak)) from a profiler trace.
        from clip_lite_tpu.utils.trace import trace_step_roofline

        n_trace = 3

        def run():
            for _ in range(n_trace):
                m = one_step()
            _ = float(m["total_loss"])

        _progress("trace audit (jax.profiler capture + parse)")
        summary = trace_step_roofline(run, n_trace,
                                      "/tmp/clip_lite_bench_trace")
        if summary:
            bw_img_s = batch_size * 1e3 / summary["per_op_roofline_ms"] \
                / n_chips
            result["device_ms_per_step"] = summary["measured_ms"]
            result["gbytes_per_step"] = summary["total_gbytes_per_step"]
            result["opaque_ms"] = summary.get("opaque_ms", 0.0)

            # Self-check: the wall-clock headline must agree with the
            # device trace it claims to describe.  A >30% gap means a
            # measurement artifact (cold program in the timed loop, host
            # stall) — re-measure now that everything is provably warm,
            # and if STILL inconsistent flag the run instead of letting a
            # silently-16x-low number become the number of record
            # (BENCH_r03 postmortem).
            dev_rate = batch_size * steps_per_call * 1e3 \
                / summary["measured_ms"] / n_chips
            result["device_rate_img_s"] = round(dev_rate, 1)
            if abs(per_chip - dev_rate) / dev_rate > 0.30:
                # Keep the bad loop's distribution as evidence of WHERE
                # the wall-clock went (tunnel stall vs uniform slowdown).
                result["first_wall_ms"] = _wall_stats(last_walls)
                per_chip = timed(n_calls)
                result["value"] = round(per_chip, 2)
                result["vs_baseline"] = round(per_chip / target, 4)
                result["remeasured"] = True
                if abs(per_chip - dev_rate) / dev_rate > 0.30:
                    result["wallclock_inconsistent"] = True
            result["wall_ms"] = _wall_stats(last_walls)
            result["vs_bandwidth_roofline"] = round(per_chip / bw_img_s, 4)
            result["bandwidth_roofline_img_s"] = round(bw_img_s, 1)

    # Secondary: the reference's fixed S=30 shape (no trace).
    if seq != 30:
        _progress("S=30 secondary (new program: compile + time)")
        batch30 = make_batch(30)
        if steps_per_call > 1:
            batch30 = stack_batches([batch30] * steps_per_call)
        device_batch = put(batch30)
        for _ in range(2):
            metrics = one_step()
        _ = float(metrics["total_loss"])
        result["s30_img_per_sec"] = round(timed(n_calls), 2)

    return result


def _make_bench_clrec(root: str, n: int = 1024, w: int = 640,
                      h: int = 480) -> None:
    """Write a COCO-shaped CLRec of JPEG-encoded synthetic photos
    (realistic decode cost) for the end-to-end input-pipeline bench."""
    import os

    import cv2
    import numpy as np

    from clip_lite_tpu.data.readers import ClRecWriter

    os.makedirs(root, exist_ok=True)
    path = os.path.join(root, "coco_train_train_sbert2017.clrec")
    if os.path.exists(path):
        return
    rng = np.random.RandomState(0)
    yy, xx = np.mgrid[0:h, 0:w]
    with ClRecWriter(path) as wtr:
        for i in range(n):
            # Smooth structured content (JPEG-typical entropy, not noise).
            a, b, c = rng.randint(2, 9, 3)
            img = np.stack([
                (127 + 120 * np.sin(xx / (20.0 * a) + i)).astype(np.uint8),
                (127 + 120 * np.sin(yy / (15.0 * b))).astype(np.uint8),
                (127 + 120 * np.sin((xx + yy) / (25.0 * c))).astype(np.uint8),
            ], axis=-1)
            ok, buf = cv2.imencode(".jpg", img,
                                   [int(cv2.IMWRITE_JPEG_QUALITY), 90])
            assert ok
            wtr.append({"image_id": i, "image": buf.tobytes(),
                        "captions": [f"a photo of pattern {i}",
                                     f"synthetic scene number {i}"]})


def _measure_real_data(per_chip_batch: int = 128,
                       steps: int = 40) -> dict:
    """End-to-end throughput with the host input pipeline in the loop:
    CLRec JPEG records -> (native or Python) decode/crop -> uint8 batches
    -> device augment+normalize -> full train step.  Quantifies the
    input-bound gap vs the device-resident compute benchmark
    (round-1 VERDICT weak #5)."""
    import os
    import time

    import jax

    _enable_compile_cache()

    from clip_lite_tpu.config import Config
    from clip_lite_tpu.data.pipeline import DataLoader, infinite_batches
    from clip_lite_tpu.engine import compile_train_step, create_train_state
    from clip_lite_tpu.factories import (
        OptimizerFactory,
        PretrainingDatasetFactory,
        PretrainingModelFactory,
    )
    from clip_lite_tpu.parallel import create_mesh, shard_batch
    from clip_lite_tpu.utils.common import apply_rng_impl

    devices = jax.devices()
    batch_size = per_chip_batch * len(devices)
    root = "/tmp/clip_lite_bench_data"
    _make_bench_clrec(root)

    cfg = Config(override_list=[
        "MODEL.NAME", "captions", "DATA.NAME", "train_sbert",
        "DATA.ROOT", root, "DATA.NATIVE_PIPELINE", True,
        "DATA.SEQ_BUCKETS", [12, 20],  # real-data path: short captions
        "MODEL.VISUAL.NETWORK_NAME", "resnet50",
        "MODEL.VISUAL.FEATURE_SIZE", 2048,
        "MODEL.TEXTUAL.NUM_HIDDEN_LAYERS", 12,
        "OPTIM.BATCH_SIZE", batch_size,
        "OPTIM.WARMUP_STEPS", 10, "OPTIM.NUM_ITERATIONS", 1000,
        "MODEL.LOSS.NEGATIVES", "global",
    ])
    apply_rng_impl(cfg)
    dataset = PretrainingDatasetFactory.from_config(cfg, split="train")
    mesh = create_mesh(data_axis="data")
    put = lambda b: shard_batch(b, mesh, "data")
    n_workers = os.cpu_count() or 1
    loader = DataLoader(dataset, batch_size, shuffle=True, drop_last=True,
                        num_workers=n_workers, seed=0, prefetch=2,
                        device_put_fn=put, background=True)
    batches = infinite_batches(loader, 0)

    # Host-only rate first (no device work): attributes the bottleneck.
    next(batches)
    t0 = time.perf_counter()
    for _ in range(10):
        next(batches)
    host_rate = 10 * batch_size / (time.perf_counter() - t0)

    model = PretrainingModelFactory.from_config(cfg)
    tx = OptimizerFactory.from_config(cfg)
    first = next(batches)
    state = create_train_state(model, tx, jax.device_get(first))
    step = compile_train_step(model, tx, mesh, "data", donate=True)
    key = jax.random.PRNGKey(0)

    batch = first
    for _ in range(3):  # warmup/compile
        state, metrics = step(state, batch, key)
        batch = next(batches)
    _ = float(metrics["total_loss"])
    t0 = time.perf_counter()
    for _ in range(steps):
        state, metrics = step(state, batch, key)
        batch = next(batches)  # overlaps with the device step
    _ = float(metrics["total_loss"])
    dt = time.perf_counter() - t0
    e2e = steps * batch_size / dt
    return {
        "metric": "flagship_real_data_throughput",
        "value": round(e2e / len(devices), 2),
        "unit": "images/sec/chip",
        "vs_baseline": round(e2e / len(devices) / (0.9 * peak_tflops(
            devices[0]) * 1e3 / FLAGSHIP_TRAIN_GFLOPS_PER_IMAGE), 4),
        "host_pipeline_rate": round(host_rate, 1),
        "host_workers": n_workers,
        "per_chip_batch": per_chip_batch,
    }


def _measure_train_path(per_chip_batch: int = 128, steps: int = 30) -> dict:
    """Training-configuration throughput: the uint8-input step (device
    augment tail) driven by (a) the HBM-resident DeviceDataCache — the
    configuration the quality campaigns actually train with — and (b)
    the real-data host pipeline (CLRec JPEG decode in the loop).  Both
    share ONE compiled program (identical batch pytrees), so the extra
    cost over the synthetic compute bench is a single compile.

    Returns fields merged into the headline JSON line (round-4 verdict:
    "make end-to-end training throughput a driver-captured number")."""
    import os

    import jax

    _enable_compile_cache()

    from clip_lite_tpu.config import Config
    from clip_lite_tpu.data.device_cache import DeviceDataCache
    from clip_lite_tpu.data.pipeline import DataLoader, infinite_batches
    from clip_lite_tpu.engine import compile_train_step, create_train_state
    from clip_lite_tpu.factories import (
        OptimizerFactory,
        PretrainingDatasetFactory,
        PretrainingModelFactory,
    )
    from clip_lite_tpu.parallel import create_mesh, shard_batch
    from clip_lite_tpu.utils.common import apply_rng_impl

    devices = jax.devices()
    n_chips = len(devices)
    batch_size = per_chip_batch * n_chips
    root = "/tmp/clip_lite_bench_data"
    _make_bench_clrec(root)

    cfg = Config(override_list=[
        "MODEL.NAME", "captions", "DATA.NAME", "train_sbert",
        "DATA.ROOT", root, "DATA.NATIVE_PIPELINE", True,
        "DATA.SEQ_BUCKETS", [12, 20],
        "MODEL.VISUAL.NETWORK_NAME", "resnet50",
        "MODEL.VISUAL.FEATURE_SIZE", 2048,
        "MODEL.TEXTUAL.NUM_HIDDEN_LAYERS", 12,
        "OPTIM.BATCH_SIZE", batch_size,
        "OPTIM.WARMUP_STEPS", 10, "OPTIM.NUM_ITERATIONS", 1000,
        "MODEL.LOSS.NEGATIVES", "global",
    ])
    apply_rng_impl(cfg)
    mesh = create_mesh(data_axis="data")
    dataset = PretrainingDatasetFactory.from_config(cfg, split="train")
    _progress("train-path: building device cache (host decode pass)")
    cache = DeviceDataCache(dataset, mesh, batch_size=batch_size,
                            cache_size=256, crop_size=224,
                            seq_buckets=[12, 20], seed=0)

    model = PretrainingModelFactory.from_config(cfg)
    # In-step Lookahead (cond form): with donation the identity branch
    # aliases its inputs, so non-sync steps pay no slow-tree traffic and
    # no separate sync program is needed.
    tx = OptimizerFactory.from_config(cfg)
    first = {k: v for k, v in cache.batch_at(0).items()}
    state = create_train_state(model, tx, jax.device_get(first))
    step = compile_train_step(model, tx, mesh, "data", donate=True)
    key = jax.random.PRNGKey(0)

    _progress("train-path: compiling + warming the uint8-input step")
    for i in range(3):
        state, m = step(state, cache.batch_at(i), key)
    _ = float(m["total_loss"])

    _progress("train-path: timing device-cache steady state")
    t0 = time.perf_counter()
    for i in range(3, 3 + steps):
        state, m = step(state, cache.batch_at(i), key)
    _ = float(m["total_loss"])
    cache_rate = steps * batch_size / (time.perf_counter() - t0) / n_chips

    out = {
        "device_cache_img_per_sec": round(cache_rate, 2),
        "device_cache_hbm_mb_per_chip": round(
            cache.memory_bytes_per_device() / 1e6, 1),
    }

    # Real-data leg: host pipeline in the loop, same compiled program.
    _progress("train-path: real-data host pipeline leg")
    n_workers = os.cpu_count() or 1
    put = lambda b: shard_batch(b, mesh, "data")
    loader = DataLoader(dataset, batch_size, shuffle=True, drop_last=True,
                        num_workers=n_workers, seed=0, prefetch=2,
                        device_put_fn=put, background=True)
    batches = infinite_batches(loader, 0)
    next(batches)
    t0 = time.perf_counter()
    for _ in range(10):
        next(batches)
    host_rate = 10 * batch_size / (time.perf_counter() - t0)

    batch = next(batches)
    state, m = step(state, batch, key)  # possible bucket-20 variant etc.
    _ = float(m["total_loss"])
    t0 = time.perf_counter()
    for _ in range(steps):
        state, m = step(state, batch, key)
        batch = next(batches)  # overlaps the device step
    _ = float(m["total_loss"])
    e2e = steps * batch_size / (time.perf_counter() - t0) / n_chips
    out.update({
        "real_data_img_per_sec": round(e2e, 2),
        "host_pipeline_rate": round(host_rate, 1),
        "host_workers": n_workers,
    })
    return out


def main() -> None:
    import sys

    if "--real-data" in sys.argv:
        try:
            print(json.dumps(_measure_real_data()))
        except Exception as e:
            print(json.dumps({
                "metric": "flagship_real_data_throughput", "value": 0.0,
                "unit": "images/sec/chip", "vs_baseline": 0.0,
                "error": f"{type(e).__name__}: {e}"[:200]}))
        return

    last_err = None
    for per_chip_batch in (128, 64):
        try:
            result = _measure(per_chip_batch)
            if "--no-train-path" not in sys.argv:
                # Training-configuration legs (device cache + real data):
                # fail-soft so a data-path issue can't cost the headline.
                try:
                    result.update(_measure_train_path(per_chip_batch))
                except Exception as e:
                    result["train_path_error"] = \
                        f"{type(e).__name__}: {e}"[:160]
            print(json.dumps(result))
            return
        except Exception as e:  # device OOM / backend flake: try smaller
            last_err = e
            print(f"bench: batch {per_chip_batch} failed "
                  f"({type(e).__name__}: {str(e)[:300]}); retrying smaller",
                  file=sys.stderr)
    print(json.dumps({
        "metric": "flagship_pretrain_throughput", "value": 0.0,
        "unit": "images/sec/chip", "vs_baseline": 0.0,
        "error": f"{type(last_err).__name__}: {last_err}"[:200],
    }))


if __name__ == "__main__":
    main()
