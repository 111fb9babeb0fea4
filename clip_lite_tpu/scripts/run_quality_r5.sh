#!/bin/bash
# Round-5 quality campaign (VERDICT r4 items 4 + 5):
#   * the r4 protocol at THREE seeds (mean +- spread for the regression
#     question: is 18.9% -> 15.8% zero-shot within seed noise?)
#   * one run through the mid-training cluster hard-negative switch
#     (reference train.py:151-163,196-208 semantics at the 75% mark)
#   * one run with MODEL.VISUAL.SELF_SUPERVISED on (reference
#     loss.py:256-300), equal budget
# All runs: fs_tpu_tuned semantics, RN50+BERT-12, bs128, 10k iters, one
# TPU v5e chip, synthetic learnable corpus (scripts/make_synth_data.py).
# Everything is serial: one chip, one job at a time.
set -u
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/tmp/clip_lite_jaxcache
SYNTH=/tmp/synth
OUT=/tmp/quality_r5
mkdir -p "$OUT"
log() { echo "[$(date +%H:%M:%S)] $*" >> "$OUT/campaign.log"; }

# ---- 1. data (idempotent) -------------------------------------------------
if [ ! -f "$SYNTH/serialized/coco_train_train_sbert2017.clrec" ]; then
  log "generating synthetic corpus"
  python -m clip_lite_tpu.scripts.make_synth_data --output-dir "$SYNTH" \
      --train-n 6000 --val-n 500 >> "$OUT/data.log" 2>&1 || exit 1
  for split in train val; do
    python -m clip_lite_tpu.scripts.coco_preprocess \
        --data-root "$SYNTH/coco" --split $split --mode train_sbert \
        --output-dir "$SYNTH/serialized" --short-edge 256 \
        >> "$OUT/data.log" 2>&1 || exit 1
  done
fi
log "data ready"

TRAIN_COMMON=(--config configs/fs_tpu_tuned.yaml
  --config-override DATA.ROOT "$SYNTH/serialized" DATA.DEVICE_CACHE True
  OPTIM.BATCH_SIZE 128 OPTIM.CNN_LR 0.025 OPTIM.TRANS_LR 0.000125
  OPTIM.LR 0.000125 OPTIM.NUM_ITERATIONS 10000 OPTIM.WARMUP_STEPS 500)

# ---- 2. three seeds, r4 protocol ------------------------------------------
for seed in 0 1 2; do
  run=/tmp/acc_r5_s$seed
  if [ ! -f "$OUT/train_s$seed.done" ]; then
    log "training seed $seed"
    timeout 4200 python -m clip_lite_tpu.train "${TRAIN_COMMON[@]}" \
        RANDOM_SEED $seed \
        --checkpoint-every 2500 --serialization-dir "$run" \
        >> "$OUT/train_s$seed.log" 2>&1 && touch "$OUT/train_s$seed.done"
    log "training seed $seed rc=$?"
  fi
  fams=sweep; [ $seed = 0 ] && fams=sweep,probe,voc,bias
  if [ -f "$OUT/train_s$seed.done" ] && [ ! -f "QUALITY_r05_seed$seed.json" ]; then
    log "evals seed $seed ($fams)"
    timeout 5400 python -m clip_lite_tpu.scripts.quality_campaign \
        --run-dir "$run" --synth-root "$SYNTH" --families $fams \
        --work-dir "$OUT/evals_s$seed" \
        --output QUALITY_r05_seed$seed.json >> "$OUT/eval_s$seed.log" 2>&1
    log "evals seed $seed rc=$?"
  fi
done

# ---- 3. cluster hard-negative curriculum leg ------------------------------
# Reuse seed 0's normal-phase checkpoint_7500, cluster the captions with
# its own text tower (scripts/cluster.py), then resume 7500->10000 in the
# clusters phase.  Equal total budget vs the seed-0 baseline.
CKPT7500=$(ls /tmp/acc_r5_s0/*/checkpoint_7500.msgpack 2>/dev/null | head -1)
if [ -n "$CKPT7500" ] && [ ! -f "$OUT/cluster.done" ]; then
  log "clustering captions with the 7500-iter text tower"
  timeout 1800 python -m clip_lite_tpu.scripts.cluster \
      --coco-root "$SYNTH/coco" --split train \
      --output-dir "$SYNTH/clusters" --min-clusters 2 --max-clusters 10 \
      --pretrain-config /tmp/acc_r5_s0/pretrain_config.yaml \
      --checkpoint-path "$CKPT7500" >> "$OUT/cluster.log" 2>&1
  # val split map too (the clustered val loader needs it)
  timeout 1800 python -m clip_lite_tpu.scripts.cluster \
      --coco-root "$SYNTH/coco" --split val \
      --output-dir "$SYNTH/clusters" --min-clusters 2 --max-clusters 10 \
      --pretrain-config /tmp/acc_r5_s0/pretrain_config.yaml \
      --checkpoint-path "$CKPT7500" >> "$OUT/cluster.log" 2>&1
  log "resuming into the clusters phase (7500 -> 10000)"
  timeout 3600 python -m clip_lite_tpu.train \
      --config configs/fs_tpu_tuned.yaml \
      --config-override DATA.ROOT "$SYNTH/serialized" \
      OPTIM.BATCH_SIZE 128 OPTIM.CNN_LR 0.025 OPTIM.TRANS_LR 0.000125 \
      OPTIM.LR 0.000125 OPTIM.NUM_ITERATIONS 10000 OPTIM.WARMUP_STEPS 500 \
      RANDOM_SEED 0 DATA.NEGATIVE_SAMPLING clusters \
      DATA.NEGATIVE_SAMPLING_START_ITERATION 7500 \
      DATA.CLUSTER_PATH "$SYNTH/clusters" DATA.COCO_ROOT "$SYNTH/coco" \
      --resume-from "$CKPT7500" --checkpoint-every 2500 \
      --serialization-dir /tmp/acc_r5_clusters \
      >> "$OUT/train_clusters.log" 2>&1 && touch "$OUT/cluster.done"
  log "cluster leg rc=$?"
fi
if [ -f "$OUT/cluster.done" ] && [ ! -f QUALITY_r05_clusters.json ]; then
  timeout 3600 python -m clip_lite_tpu.scripts.quality_campaign \
      --run-dir /tmp/acc_r5_clusters --synth-root "$SYNTH" \
      --families sweep --retrieval-checkpoints 1 \
      --work-dir "$OUT/evals_clusters" \
      --output QUALITY_r05_clusters.json >> "$OUT/eval_clusters.log" 2>&1
  log "cluster evals rc=$?"
fi

# ---- 4. visual SSL leg ----------------------------------------------------
# Visual SSL rides the device cache: the aug view is an independent
# on-device crop+flip+jitter of the cached tile (DeviceDataCache
# ssl_aug) — compute-bound, no host decode in the loop.
if [ ! -f "$OUT/ssl.done" ]; then
  log "training SSL leg"
  timeout 5400 python -m clip_lite_tpu.train "${TRAIN_COMMON[@]}" \
      RANDOM_SEED 0 MODEL.VISUAL.SELF_SUPERVISED True \
      --checkpoint-every 2500 --serialization-dir /tmp/acc_r5_ssl \
      >> "$OUT/train_ssl.log" 2>&1 && touch "$OUT/ssl.done"
  log "SSL leg rc=$?"
fi
if [ -f "$OUT/ssl.done" ] && [ ! -f QUALITY_r05_ssl.json ]; then
  timeout 3600 python -m clip_lite_tpu.scripts.quality_campaign \
      --run-dir /tmp/acc_r5_ssl --synth-root "$SYNTH" \
      --families sweep --retrieval-checkpoints 1 \
      --work-dir "$OUT/evals_ssl" \
      --output QUALITY_r05_ssl.json >> "$OUT/eval_ssl.log" 2>&1
  log "SSL evals rc=$?"
fi

log "campaign chain complete"
