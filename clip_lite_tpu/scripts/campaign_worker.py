"""Single-process TPU worker for the round-5 quality campaign.

The tunneled backend pays a multi-minute client init per PROCESS, so the
subprocess-per-run layout of run_quality_r5.sh multiplies dead time.
This worker drives every TPU stage of the campaign IN ONE PROCESS by
calling the production CLIs' ``main(parser.parse_args(argv))`` entry
points directly (the same surfaces, same configs — nothing
re-implemented):

  1. seed 0/1/2 pretraining (r4 protocol, 10k iters each)
  2. caption clustering with the seed-0 7500-iter text tower
     (scripts/cluster.py in-process) + the 7500->10000 clustered
     hard-negative resume (reference train.py:151-163 semantics)
  3. the visual-SSL leg (DeviceDataCache ssl_aug)
  4. seed-0 heavy eval families (linear probe + random-init control,
     VOC07 SVM, bias_eda) with their JSON lines captured in-process
     -> QUALITY_r05_seed0_heavy.json

Progress markers land in /tmp/quality_r5/<stage>.done; the shell
orchestrator (run_quality_r5.sh) watches them and runs the cheap
retrieval/zero-shot sweeps on the host CPU in parallel.

Every stage is resumable: finished markers are skipped, so rerunning the
worker after a crash continues where it stopped.
"""

from __future__ import annotations

import contextlib
import io
import json
import os
import traceback

OUT = os.environ.get("CAMPAIGN_OUT", "/tmp/quality_r5")
SYNTH = os.environ.get("CAMPAIGN_SYNTH", "/tmp/synth")
HOST_CACHE = os.path.join(SYNTH, "host_cache")


def log(msg: str) -> None:
    import time

    line = f"[worker {time.strftime('%H:%M:%S')}] {msg}"
    print(line, flush=True)
    with open(os.path.join(OUT, "campaign.log"), "a") as f:
        f.write(line + "\n")


def marker(name: str) -> str:
    return os.path.join(OUT, name + ".done")


def stage(name: str):
    """Run ``fn`` unless its marker exists; mark on success."""
    def deco(fn):
        def run(*a, **k):
            if os.path.exists(marker(name)):
                log(f"{name}: already done")
                return True
            log(f"{name}: starting")
            try:
                fn(*a, **k)
            except BaseException as e:  # noqa: BLE001 — keep the chain going
                log(f"{name}: FAILED {type(e).__name__}: {e}")
                traceback.print_exc()
                return False
            open(marker(name), "w").close()
            log(f"{name}: done")
            return True
        return run
    return deco


def train_args(extra_overrides, serialization_dir, resume=None):
    from clip_lite_tpu import train

    argv = ["--config", "configs/fs_tpu_tuned.yaml",
            "--config-override",
            "DATA.ROOT", f"{SYNTH}/serialized",
            "DATA.CACHE_HOST_DIR", HOST_CACHE,
            "OPTIM.BATCH_SIZE", "128",
            "OPTIM.CNN_LR", "0.025", "OPTIM.TRANS_LR", "0.000125",
            "OPTIM.LR", "0.000125", "OPTIM.NUM_ITERATIONS", "10000",
            "OPTIM.WARMUP_STEPS", "500", *map(str, extra_overrides),
            "--checkpoint-every", "2500",
            "--serialization-dir", serialization_dir]
    if resume:
        argv += ["--resume-from", resume]
    return train.parser.parse_args(argv)


def run_train(overrides, outdir, resume=None):
    import glob

    from clip_lite_tpu import train

    if resume is None:
        # Crash/wedge recovery: resume from the newest checkpoint this
        # stage already wrote (the tunnel occasionally loses an RPC
        # mid-run; the worker is restartable, and resume replays the
        # exact batch stream by construction).
        ckpts = glob.glob(os.path.join(outdir, "*", "checkpoint_[0-9]*.msgpack"))
        if ckpts:
            resume = max(ckpts, key=lambda p: int(
                p.rsplit("_", 1)[1].split(".")[0]))
            log(f"resuming {outdir} from {os.path.basename(resume)}")
    train.main(train_args(overrides, outdir, resume))


def capture_cli(module, argv):
    """Run a CLI main in-process; return its last printed JSON line."""
    buf = io.StringIO()

    class Tee(io.TextIOBase):
        def write(self, s):
            buf.write(s)
            return __import__("sys").__stdout__.write(s)

        def flush(self):
            __import__("sys").__stdout__.flush()

    with contextlib.redirect_stdout(Tee()):
        module.main(module.parser.parse_args(argv))
    for line in reversed(buf.getvalue().strip().splitlines()):
        line = line.strip()
        if line.startswith("{"):
            return json.loads(line)
    raise RuntimeError(f"{module.__name__} printed no JSON")


def main() -> None:
    os.makedirs(OUT, exist_ok=True)

    @stage("train_s0")
    def s0():
        run_train(["RANDOM_SEED", 0, "DATA.DEVICE_CACHE", True],
                  "/tmp/acc_r5_s0")

    @stage("train_s1")
    def s1():
        run_train(["RANDOM_SEED", 1, "DATA.DEVICE_CACHE", True],
                  "/tmp/acc_r5_s1")

    @stage("train_s2")
    def s2():
        run_train(["RANDOM_SEED", 2, "DATA.DEVICE_CACHE", True],
                  "/tmp/acc_r5_s2")

    @stage("cluster")
    def cluster_leg():
        import glob

        from clip_lite_tpu.scripts import cluster as cluster_mod

        ckpt = sorted(glob.glob(
            "/tmp/acc_r5_s0/*/checkpoint_7500.msgpack"))[-1]
        for split in ("train", "val"):
            cluster_mod.main(cluster_mod.parser.parse_args([
                "--coco-root", f"{SYNTH}/coco", "--split", split,
                "--output-dir", f"{SYNTH}/clusters",
                "--min-clusters", "2", "--max-clusters", "10",
                "--pretrain-config", "/tmp/acc_r5_s0/pretrain_config.yaml",
                "--checkpoint-path", ckpt]))
        run_train(["RANDOM_SEED", 0,
                   "DATA.NEGATIVE_SAMPLING", "clusters",
                   "DATA.NEGATIVE_SAMPLING_START_ITERATION", 7500,
                   "DATA.CLUSTER_PATH", f"{SYNTH}/clusters",
                   "DATA.COCO_ROOT", f"{SYNTH}/coco"],
                  "/tmp/acc_r5_clusters", resume=ckpt)

    @stage("ssl")
    def ssl_leg():
        run_train(["RANDOM_SEED", 0, "DATA.DEVICE_CACHE", True,
                   "MODEL.VISUAL.SELF_SUPERVISED", True],
                  "/tmp/acc_r5_ssl")

    @stage("heavy_s0")
    def heavy():
        import glob

        from clip_lite_tpu import bias_eda, linear_clf, voc_clf
        from clip_lite_tpu.scripts.quality_campaign import (
            DEFINITIONAL_PAIRS,
            LOADED_PROMPT,
            NEUTRAL_PROMPT,
        )

        pre_cfg = "/tmp/acc_r5_s0/pretrain_config.yaml"
        final = sorted(glob.glob(
            "/tmp/acc_r5_s0/*/checkpoint_10000.msgpack"))[-1]
        work = os.path.join(OUT, "evals_s0_heavy")
        os.makedirs(work, exist_ok=True)
        probe_overrides = [
            "--config-override",
            "DATA.ROOT", f"{SYNTH}/imagenet",
            "DATA.IMAGE_TRANSFORM_TRAIN",
            "['random_resized_crop','normalize']",
            "OPTIM.BATCH_SIZE", "64", "OPTIM.NUM_ITERATIONS", "800",
            "OPTIM.WARMUP_STEPS", "50", "OPTIM.LR", "0.03",
            "OPTIM.CNN_LR", "0.03", "OPTIM.LR_DECAY_NAME", "cosine",
        ]
        final_out = {}
        final_out["linear_probe"] = capture_cli(linear_clf, [
            *probe_overrides, "--pretrain-config", pre_cfg,
            "--checkpoint-path", final, "--frozen",
            "--serialization-dir", f"{work}/probe"])
        final_out["linear_probe_random_init"] = capture_cli(linear_clf, [
            *probe_overrides, "--pretrain-config", pre_cfg, "--frozen",
            "--serialization-dir", f"{work}/probe_rand"])
        final_out["voc07_svm"] = capture_cli(voc_clf, [
            "--config-override", "DATA.ROOT", f"{SYNTH}/VOC2007",
            "--pretrain-config", pre_cfg, "--checkpoint-path", final,
            "--serialization-dir", work])
        pairs_path = os.path.join(work, "definitional_pairs.json")
        with open(pairs_path, "w") as f:
            json.dump(DEFINITIONAL_PAIRS, f)
        for name, prompt in (("loaded", LOADED_PROMPT),
                             ("neutral", NEUTRAL_PROMPT)):
            final_out[f"bias_{name}"] = capture_cli(bias_eda, [
                "--config-override", "DATA.ROOT", f"{SYNTH}/coco_gender",
                "--pretrain-config", pre_cfg, "--checkpoint-path", final,
                "--definitional-pairs", pairs_path, "--prompt", prompt,
                "--cache-dir", f"{work}/gender_cache",
                "--serialization-dir", work])
        with open("QUALITY_r05_seed0_heavy.json", "w") as f:
            json.dump({"final": final_out}, f, indent=1)

    # SSL before cluster: the SSL leg rides the device cache
    # (compute-bound, ~25 min); the cluster leg is host-loader bound on
    # this box — run the reliable stage first when the round clock is
    # the constraint.
    ok = s0() and True
    s1()
    s2()
    ssl_leg()
    cluster_leg()
    heavy()
    log(f"worker finished (s0 ok={ok})")


if __name__ == "__main__":
    main()
