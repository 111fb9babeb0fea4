#!/bin/bash
# Round-5 quality campaign orchestrator (VERDICT r4 items 4 + 5).
#
# Layout:
#   * scripts/campaign_worker.py — ONE TPU process running every training
#     stage in sequence (3 seeds + cluster curriculum + visual SSL) plus
#     the seed-0 heavy eval families; drops <stage>.done markers.
#   * this script — prepares data, launches the worker, and fires each
#     finished run's retrieval/zero-shot sweep on the HOST CPU in the
#     background (quality_campaign --sweep-platform cpu), overlapping
#     the next training; finally merges QUALITY_r05.json.
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

# ---- 2. the TPU worker (single process, all training stages) --------------
# Supervised: the tunnel intermittently loses a GB-scale transfer RPC,
# leaving the client blocked forever (observed twice this campaign).
# The supervisor kills the worker when its log goes stale for >13 min
# (steady training logs every ~30 s; init/compile/checkpoint quiet
# phases stay under ~10 min) and relaunches it — every stage resumes
# from its marker, and trainings resume from their newest checkpoint.
if [ ! -f "$OUT/worker_started" ]; then
  touch "$OUT/worker_started"
  ( for attempt in 1 2 3 4 5 6 7 8; do
      log "worker attempt $attempt"
      # setsid: own process group, so the wedge-kill below reaps python
      # itself, not just a wrapper (killing only the wrapper orphans the
      # worker, which then fights its successor for the TPU client —
      # observed at r5 campaign attempt 1/2 hand-off).
      setsid python -m clip_lite_tpu.scripts.campaign_worker \
          >> "$OUT/worker.log" 2>&1 &
      WPID=$!
      while kill -0 $WPID 2>/dev/null; do
        sleep 60
        stale=$(( $(date +%s) - $(stat -c %Y "$OUT/worker.log") ))
        if [ "$stale" -gt 780 ]; then
          log "worker wedged (log stale ${stale}s); killing group $WPID"
          kill -9 -- -$WPID 2>/dev/null || kill -9 $WPID 2>/dev/null
          sleep 5
          break
        fi
      done
      wait $WPID 2>/dev/null
      if grep -q "worker finished" "$OUT/worker.log"; then break; fi
      sleep 10
    done
    echo done > "$OUT/worker_rc" ) &
  log "supervised worker launched"
fi

sweep_bg() {  # $1 run-dir  $2 tag  $3 n-checkpoints
  ( timeout 7200 python -m clip_lite_tpu.scripts.quality_campaign \
      --run-dir "$1" --synth-root "$SYNTH" --families sweep \
      --sweep-platform cpu --retrieval-checkpoints "$3" \
      --work-dir "$OUT/evals_$2" \
      --output "QUALITY_r05_$2.json" >> "$OUT/eval_$2.log" 2>&1
    log "sweep $2 rc=$?" ) &
}

# ---- 3. fire CPU sweeps as training stages complete -----------------------
declare -A FIRED
while :; do
  for spec in "train_s0 /tmp/acc_r5_s0 seed0 4" \
              "train_s1 /tmp/acc_r5_s1 seed1 4" \
              "train_s2 /tmp/acc_r5_s2 seed2 4" \
              "cluster /tmp/acc_r5_clusters clusters 1" \
              "ssl /tmp/acc_r5_ssl ssl 1"; do
    set -- $spec
    if [ -f "$OUT/$1.done" ] && [ -z "${FIRED[$3]:-}" ] \
        && [ ! -f "QUALITY_r05_$3.json" ]; then
      FIRED[$3]=1
      log "sweep $3 -> background (cpu)"
      sweep_bg "$2" "$3" "$4"
    fi
    [ -f "QUALITY_r05_$3.json" ] && FIRED[$3]=1
  done
  [ -f "$OUT/worker_rc" ] && break
  sleep 60
done
log "worker exited rc=$(cat $OUT/worker_rc 2>/dev/null)"
wait
log "all sweeps finished"

# ---- 4. merge -------------------------------------------------------------
python - <<'EOF'
import json, os
try:
    with open("QUALITY_r05_seed0.json") as f:
        base = json.load(f)
    if os.path.exists("QUALITY_r05_seed0_heavy.json"):
        with open("QUALITY_r05_seed0_heavy.json") as f:
            heavy = json.load(f)
        base.setdefault("final", {}).update(heavy.get("final", {}))
        with open("QUALITY_r05_seed0.json", "w") as f:
            json.dump(base, f, indent=1)
except FileNotFoundError as e:
    print("merge skip:", e)
EOF
python -m clip_lite_tpu.scripts.merge_quality_r5 QUALITY_r05.json \
    >> "$OUT/campaign.log" 2>&1
log "campaign chain complete"
