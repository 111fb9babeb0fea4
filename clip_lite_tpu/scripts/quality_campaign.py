"""Trained-checkpoint quality campaign: every eval family, one JSON.

Runs the PRODUCTION eval CLIs against a finished pretraining run on the
synthetic learnable corpus (scripts/make_synth_data.py) and collects the
numbers the reference validates with empirically (SURVEY.md §4):

  retrieval   R@1/5/10 both directions      (reference retrieval.py:152-209)
  zero-shot   top-1 over 64 classes         (reference zero_shot.py:155-159)
  linear probe frozen-tower top-1, plus a   (reference linear_clf.py:272-307)
              random-init control probe
  VOC07 SVM   16-class mAP                  (reference voc_clf.py:252-254)
  bias_eda    color-attribute bias gap,     (reference bias_eda.py:256-414)
              biased vs debiased

Each eval is a subprocess of the real CLI module — nothing is re-implemented
here; this script only sequences them and scrapes their JSON stdout.

Run (one TPU chip, ~30-45 min):
    python -m clip_lite_tpu.scripts.quality_campaign \
        --run-dir /tmp/acc_run_r4 --synth-root /tmp/synth \
        --output QUALITY_r04.json
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import subprocess
import sys
import tempfile

parser = argparse.ArgumentParser(
    description="Run the full eval suite against a trained checkpoint.")
parser.add_argument("--run-dir", required=True,
                    help="Pretraining --serialization-dir (holds "
                         "pretrain_config.yaml + <RUN_ID>/checkpoint_*.msgpack)")
parser.add_argument("--synth-root", default="/tmp/synth")
parser.add_argument("--output", default="QUALITY.json")
parser.add_argument("--work-dir", default=None,
                    help="Scratch dir for eval logs (default: tmp).")
parser.add_argument("--probe-iters", type=int, default=800)
parser.add_argument("--retrieval-checkpoints", type=int, default=4,
                    help="How many step checkpoints to sweep for "
                         "retrieval/zero-shot (latest N).")
parser.add_argument("--families", default="sweep,probe,voc,bias",
                    help="Comma list of eval families to run "
                         "(sweep=retrieval+zero_shot over checkpoints).")
parser.add_argument("--sweep-platform", default=None,
                    help="Run the retrieval/zero-shot sweep CLIs on this "
                         "jax platform (e.g. 'cpu': ~2 TFLOP of RN50 "
                         "inference per call — minutes on a host core, "
                         "and it frees the TPU for the next training "
                         "run).  Heavy families (probe/voc) keep the "
                         "default device.")

# The synthetic analog of the reference's gender direction: the protected
# attribute in make_synth_data's coco_gender split is shape COLOR
# (red population <-> "man", blue <-> "woman").
DEFINITIONAL_PAIRS = [
    ["a photo of a blue circle", "a photo of a red circle"],
    ["a blue square", "a red square"],
    ["a small blue triangle in the center", "a small red triangle in the center"],
    ["a picture showing a blue star", "a picture showing a red star"],
]
LOADED_PROMPT = "a photo of a red diamond"     # red-loaded: big biased gap
NEUTRAL_PROMPT = "a photo of a green circle"   # color-neutral wrt red/blue


def run_cli(module: str, args: list, log_path: str) -> dict:
    """Run a production CLI; return the last JSON line of its stdout."""
    cmd = [sys.executable, "-m", f"clip_lite_tpu.{module}"] + args
    print("+", " ".join(cmd), flush=True)
    r = subprocess.run(cmd, capture_output=True, text=True)
    with open(log_path, "w") as f:
        f.write(r.stdout + "\n--- stderr ---\n" + r.stderr)
    if r.returncode != 0:
        raise RuntimeError(f"{module} failed rc={r.returncode}; "
                           f"log: {log_path}\n{r.stderr[-2000:]}")
    for line in reversed(r.stdout.strip().splitlines()):
        line = line.strip()
        if line.startswith("{"):
            return json.loads(line)
    raise RuntimeError(f"{module} printed no JSON; log: {log_path}")


def main(_A) -> dict:
    run_dir = _A.run_dir
    synth = _A.synth_root
    families = set(_A.families.split(","))
    failures = {}

    def attempt(name: str, fn):
        """One eval family crashing must not lose the rest of the run."""
        try:
            return fn()
        except Exception as e:  # noqa: BLE001 — recorded, not swallowed
            print(f"!! {name} FAILED: {e}", flush=True)
            failures[name] = str(e)
            return None

    work = _A.work_dir or tempfile.mkdtemp(prefix="quality_")
    os.makedirs(work, exist_ok=True)
    pre_cfg = os.path.join(run_dir, "pretrain_config.yaml")
    # One RUN_ID directory only: a reused run_dir can hold several
    # <RUN_ID> subdirs (e.g. a crashed run plus its re-run); globbing
    # across them would interleave checkpoints from different models
    # under the same step keys.  Pick the most recently written run.
    all_ckpts = glob.glob(
        os.path.join(run_dir, "*", "checkpoint_[0-9]*.msgpack"))
    if not all_ckpts:
        raise SystemExit(f"no checkpoints under {run_dir}")
    by_run = {}
    for p in all_ckpts:
        by_run.setdefault(os.path.dirname(p), []).append(p)
    if len(by_run) > 1:
        print(f"!! {len(by_run)} RUN_ID dirs under {run_dir}; "
              "using the most recent", flush=True)
    run_subdir = max(by_run, key=lambda d: max(os.path.getmtime(p)
                                               for p in by_run[d]))
    ckpts = sorted(by_run[run_subdir],
                   key=lambda p: int(p.rsplit("_", 1)[1].split(".")[0]))
    final = ckpts[-1]
    n_sweep = _A.retrieval_checkpoints
    sweep = ckpts[-n_sweep:] if n_sweep > 0 else []
    step_of = lambda p: int(p.rsplit("_", 1)[1].split(".")[0])

    out = {"run_dir": run_dir, "final_checkpoint": final,
           "checkpoints": {}, "final": {}}

    # Val losses straight from the training run's metrics stream.
    metrics_path = os.path.join(run_dir, "metrics.jsonl")
    if os.path.exists(metrics_path):
        val_losses = {}
        with open(metrics_path) as f:
            for line in f:
                rec = json.loads(line)
                if rec.get("split") == "val":
                    val_losses[str(rec["iteration"])] = rec["total_loss"]
        out["val_loss"] = val_losses

    sweep_plat = (["--platform", _A.sweep_platform]
                  if _A.sweep_platform else [])
    if "sweep" in families:
        for ckpt in sweep:
            step = step_of(ckpt)
            entry = out["checkpoints"].setdefault(str(step), {})
            entry["retrieval"] = attempt("retrieval", lambda: run_cli(
                "retrieval", sweep_plat + [
                    "--config-override", "DATA.ROOT", f"{synth}/coco",
                    "--pretrain-config", pre_cfg, "--checkpoint-path", ckpt,
                    "--serialization-dir", work,
                ], f"{work}/retrieval_{step}.log"))
            entry["zero_shot"] = attempt("zero_shot", lambda: run_cli(
                "zero_shot", sweep_plat + [
                    "--config-override", "DATA.ROOT", f"{synth}/imagenet",
                    "--pretrain-config", pre_cfg, "--checkpoint-path", ckpt,
                    "--serialization-dir", work,
                ], f"{work}/zero_shot_{step}.log"))
            print(f"[{step}] retrieval+zero_shot done: {entry}", flush=True)

    probe_overrides = [
        "DATA.ROOT", f"{synth}/imagenet",
        # color is label-bearing: no jitter, no flip needed for shapes
        "DATA.IMAGE_TRANSFORM_TRAIN", "['random_resized_crop','normalize']",
        "OPTIM.BATCH_SIZE", "64", "OPTIM.NUM_ITERATIONS",
        str(_A.probe_iters), "OPTIM.WARMUP_STEPS", "50",
        "OPTIM.LR", "0.03", "OPTIM.CNN_LR", "0.03",
        "OPTIM.LR_DECAY_NAME", "cosine",
    ]
    if "probe" in families:
        out["final"]["linear_probe"] = attempt("linear_probe", lambda: run_cli(
            "linear_clf", [
                "--config-override", *probe_overrides,
                "--pretrain-config", pre_cfg, "--checkpoint-path", final,
                "--frozen", "--serialization-dir", f"{work}/probe",
            ], f"{work}/linear_probe.log"))
        # Control: identical probe on a RANDOM-INIT tower — the pretrained
        # number is only meaningful relative to this.
        out["final"]["linear_probe_random_init"] = attempt(
            "linear_probe_random_init", lambda: run_cli("linear_clf", [
                "--config-override", *probe_overrides,
                "--pretrain-config", pre_cfg,
                "--frozen", "--serialization-dir", f"{work}/probe_rand",
            ], f"{work}/linear_probe_rand.log"))

    if "voc" in families:
        out["final"]["voc07_svm"] = attempt("voc07_svm", lambda: run_cli(
            "voc_clf", [
                "--config-override", "DATA.ROOT", f"{synth}/VOC2007",
                "--pretrain-config", pre_cfg, "--checkpoint-path", final,
                "--serialization-dir", work,
            ], f"{work}/voc_clf.log"))

    if "bias" in families:
        pairs_path = os.path.join(work, "definitional_pairs.json")
        with open(pairs_path, "w") as f:
            json.dump(DEFINITIONAL_PAIRS, f)
        for name, prompt in (("loaded", LOADED_PROMPT),
                             ("neutral", NEUTRAL_PROMPT)):
            out["final"][f"bias_{name}"] = attempt(f"bias_{name}", lambda: run_cli(
                "bias_eda", [
                    "--config-override", "DATA.ROOT", f"{synth}/coco_gender",
                    "--pretrain-config", pre_cfg, "--checkpoint-path", final,
                    "--definitional-pairs", pairs_path, "--prompt", prompt,
                    "--cache-dir", f"{work}/gender_cache",
                    "--serialization-dir", work,
                ], f"{work}/bias_{name}.log"))

    if failures:
        out["failures"] = failures
    with open(_A.output, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out["final"], indent=1))
    print(f"wrote {_A.output}; logs in {work}")
    return out


if __name__ == "__main__":
    main(parser.parse_args())
