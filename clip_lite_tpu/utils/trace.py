"""jax.profiler trace capture + per-op analysis (TPU).

The round-2 perf campaign established that trusting per-op
microbenchmarks through the tunneled backend is treacherous (dispatch
~0.85 ms/call, XLA DCE/CSE, transfer costs); the reliable instrument is
an in-model ``jax.profiler`` trace parsed per-op.  This module is that
instrument as a library:

  * ``capture_trace(run_fn, outdir)`` — trace a callable and return the
    trace.json.gz path;
  * ``parse_trace_ops(path)`` — device-side HLO op events with duration,
    ``model_flops`` and ``raw_bytes_accessed`` from XLA's cost analysis;
  * ``roofline_summary(ops, n_steps, ...)`` — measured device time vs
    two analytic floors: the pure-FLOPs roofline (matmul peak) and the
    **per-op roofline** max(bytes/HBM_BW, flops/peak) summed over ops —
    the machine-checked version of the hand-derived bandwidth ceiling in
    docs/PERF_NOTES.md (round-2 VERDICT weak #2).

Used by ``bench.py`` (emits ``vs_bandwidth_roofline`` next to
``vs_baseline``) and by the ``clip_lite_tpu.scripts.perf_trace`` CLI
(the companion of ``train.py --profile-dir``).
"""

from __future__ import annotations

import glob
import gzip
import json
import os
import re
import shutil
from collections import defaultdict
from typing import Callable, Dict, List, Optional

# TPU v5e nominal specs; other chips via the PEAKS table.
HBM_GBPS = {
    "TPU v5 lite": 819.0,
    "TPU v5e": 819.0,
    "TPU v4": 1228.0,
    "TPU v6 lite": 1640.0,
}
PEAK_BF16_TFLOPS = {
    "TPU v5 lite": 197.0,
    "TPU v5e": 197.0,
    "TPU v4": 275.0,
    "TPU v6 lite": 918.0,
}


def device_specs(device) -> tuple:
    """(peak_bf16_tflops, hbm_gbps) for a jax device."""
    kind = getattr(device, "device_kind", "")
    for name in PEAK_BF16_TFLOPS:
        if kind.startswith(name):
            return PEAK_BF16_TFLOPS[name], HBM_GBPS[name]
    return 197.0, 819.0  # assume v5e


def capture_trace(run_fn: Callable[[], None], outdir: str) -> str:
    """Run ``run_fn`` under the profiler; return the trace.json.gz path."""
    import jax

    shutil.rmtree(outdir, ignore_errors=True)
    jax.profiler.start_trace(outdir)
    try:
        run_fn()
    finally:
        jax.profiler.stop_trace()
    paths = glob.glob(outdir + "/plugins/profile/*/*.trace.json.gz")
    if not paths:
        raise FileNotFoundError(f"no trace written under {outdir}")
    return max(paths, key=os.path.getmtime)


def parse_trace_ops(path: str) -> List[Dict]:
    """Device-side HLO op events: [{name, tf_op, category, dur_us, flops,
    bytes}].  Only events carrying XLA cost-analysis args are returned
    (host/runtime rows are skipped)."""
    with gzip.open(path, "rt") as f:
        data = json.load(f)
    ops = []
    for e in data.get("traceEvents", []):
        if e.get("ph") != "X" or not e.get("args"):
            continue
        a = e["args"]
        if "hlo_category" not in a:
            continue
        cat = a["hlo_category"]
        ops.append({
            "name": e.get("name", ""),
            "tf_op": a.get("tf_op", ""),
            "category": cat,
            "dur_us": float(e.get("dur", 0.0)),
            "flops": float(a.get("model_flops", 0.0) or 0.0),
            # Async pairs report the SAME transfer on both halves; keep
            # the bytes on the ...-done event only (the -start halves are
            # ~0-duration bookkeeping rows) so totals aren't double
            # counted.
            "bytes": (0.0 if cat.endswith("-start")
                      else float(a.get("raw_bytes_accessed", 0.0) or 0.0)),
        })
    return ops


_COMPONENT_RULES = (
    # Matched against jax tf_op scope strings, e.g.
    # "jit(train_step)/transpose(jvp(VLInfoModel))/image_encoder/backbone/
    #  layer1_2/block1/...".
    ("bert", re.compile(r"text_encoder|transformer|BertModel|MPNet")),
    ("resnet", re.compile(r"image_encoder|backbone|ResNet|VGG")),
    ("loss", re.compile(r"/loss/|critic|discriminator|global_d")),
    ("optimizer", re.compile(r"lookahead|sgd|adam|fused|zero1|leaf")),
    ("unattributed", re.compile(r"^$")),
)


def component_of(tf_op: str) -> str:
    for name, rx in _COMPONENT_RULES:
        if rx.search(tf_op):
            return name
    return "other"


def roofline_summary(ops: List[Dict], n_steps: int,
                     peak_tflops: float, hbm_gbps: float) -> Dict:
    """Aggregate a trace into measured-vs-roofline per step.

    Per-op floor = max(flops / peak, min(bytes / HBM_BW, dur)): an op
    can't run faster than its slower wall.  The bytes leg is clamped at
    the op's measured duration because XLA's ``raw_bytes_accessed``
    counts every operand access including VMEM-resident re-reads —
    round-2 traces showed hot convs "moving" 814-1022 GB/s against the
    819 GB/s nominal HBM, i.e. the byte counts overshoot true HBM
    traffic by up to ~25%, and an unclamped sum can exceed the measured
    step (a roofline must be a floor).  With the clamp, an op already at
    the wall claims no slack and a launch-bound op claims its full gap.
    Summed over ops this is the program's bandwidth-aware roofline —
    reachable only with perfect overlap and zero launch overhead, so
    treat it as the floor, not a target.
    """
    measured_us = sum(o["dur_us"] for o in ops)
    flops_us = sum(o["flops"] / (peak_tflops * 1e6) for o in ops)
    bytes_us = sum(min(o["bytes"] / (hbm_gbps * 1e3), o["dur_us"])
                   for o in ops)
    # Ops with NO cost model at all (hand-written Mosaic/Pallas kernels
    # and other custom calls report neither flops nor bytes) would claim
    # a floor of ZERO — i.e. the roofline would assert they could run in
    # no time, which no kernel can.  They are priced at their measured
    # duration instead (assumed at floor), and their total is reported
    # as ``opaque_ms`` so the share of the roofline that rests on that
    # assumption is visible and auditable.
    opaque_us = 0.0
    bound_us = 0.0
    for o in ops:
        if o["flops"] == 0.0 and o["bytes"] == 0.0:
            opaque_us += o["dur_us"]
            bound_us += o["dur_us"]
        else:
            bound_us += max(o["flops"] / (peak_tflops * 1e6),
                            min(o["bytes"] / (hbm_gbps * 1e3), o["dur_us"]))

    by_cat = defaultdict(lambda: {"ms": 0.0, "gbytes": 0.0, "n": 0})
    by_comp = defaultdict(lambda: {"ms": 0.0, "gbytes": 0.0, "n": 0})
    for o in ops:
        for key, table in ((o["category"], by_cat),
                           (component_of(o["tf_op"]), by_comp)):
            table[key]["ms"] += o["dur_us"] / 1e3 / n_steps
            table[key]["gbytes"] += o["bytes"] / 1e9 / n_steps
            table[key]["n"] += 1

    def _round(table):
        return {k: {"ms": round(v["ms"], 3), "gbytes": round(v["gbytes"], 3),
                    "n": v["n"] // n_steps}
                for k, v in sorted(table.items(), key=lambda kv: -kv[1]["ms"])}

    return {
        "n_steps": n_steps,
        "measured_ms": round(measured_us / 1e3 / n_steps, 3),
        "flops_roofline_ms": round(flops_us / 1e3 / n_steps, 3),
        "bytes_roofline_ms": round(bytes_us / 1e3 / n_steps, 3),
        "per_op_roofline_ms": round(bound_us / 1e3 / n_steps, 3),
        "opaque_ms": round(opaque_us / 1e3 / n_steps, 3),
        "total_gbytes_per_step": round(
            sum(o["bytes"] for o in ops) / 1e9 / n_steps, 3),
        "total_gflops_per_step": round(
            sum(o["flops"] for o in ops) / 1e9 / n_steps, 3),
        "by_category": _round(by_cat),
        "by_component": _round(by_comp),
    }


def trace_step_roofline(step_fn: Callable[[], None], n_steps: int,
                        outdir: str = "/tmp/clip_lite_trace",
                        device=None) -> Optional[Dict]:
    """Convenience: trace ``step_fn`` (which must run ``n_steps`` steps
    and synchronize) and return the roofline summary, or None when the
    backend produces no usable trace."""
    import jax

    if device is None:
        device = jax.devices()[0]
    peak, bw = device_specs(device)
    try:
        path = capture_trace(step_fn, outdir)
        ops = parse_trace_ops(path)
    except Exception as e:
        import sys

        # Visible failure: a silently-absent trace also silently drops
        # the benchmark's roofline fields AND its wall-vs-device
        # self-check (bench.py) — say why instead.
        print(f"trace capture failed: {type(e).__name__}: {e}",
              file=sys.stderr, flush=True)
        return None
    if not ops:
        print("trace parsed but contained no device ops "
              f"(profiler plugin produced an empty capture at {path})",
              file=__import__("sys").stderr, flush=True)
        return None
    return roofline_summary(ops, n_steps, peak, bw)
