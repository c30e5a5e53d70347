#!/bin/bash
# Unattended post-training evaluation sequence for the round-2 accuracy run.
#
# Waits for the training process to exit, then — on the now-free TPU —
# runs the full evidence chain the judge needs (VERDICT round-1 items 1 & 8):
#   1. K-sweep of --ransac-top-k on the 64-image `valmid` subset
#   2. full 1500-image val evaluation at the best K
#   3. +ICP depth-refinement arm at the best K
#   4. approx-vs-exact top-k A/B (tools/ab_topk.py) at the best K
#   5. tools/report_run.py trajectory table
#   6. bench.py (fresh perf numbers on the idle chip)
#
# Everything lands under $OUT with per-step logs; a DONE sentinel marks
# completion so a later session can pick up the results even if the
# session that launched this script has died.
#
# Usage: nohup tools/endgame.sh [TRAINER_PID] > /tmp/endgame.log 2>&1 &
set -u
# bench.py drops this sentinel when it quiesces the trainer at round end:
# the benchmark owns the chip, so the eval chain must not start (a later
# session reruns the endgame from the committed checkpoint).
if [ -f /tmp/bigrun_skip_endgame ]; then
  # bench.py clears this on completion; >1h old means a dead bench (stale)
  if [ -n "$(find /tmp/bigrun_skip_endgame -mmin +60 2>/dev/null)" ]; then
    echo "[endgame] stale skip_endgame sentinel (>1h old); clearing"
    rm -f /tmp/bigrun_skip_endgame
  else
    echo "[endgame] /tmp/bigrun_skip_endgame present (bench owns the chip); exiting"
    exit 0
  fi
fi
PID=${1:-$(cat /tmp/bigrun.pid)}
OUT=${OUT:-/root/data/endgame}
DATA=${DATA:-/root/data/lm_syn}
RUN=${RUN:-/root/data/bigrun}
mkdir -p "$OUT"
cd "$(dirname "$0")/.."

echo "[endgame] waiting for trainer pid $PID ..."
tail --pid="$PID" -f /dev/null 2>/dev/null
sleep 10  # let the final snapshot finish writing
CKPT=$(ls -d "$RUN"/step_* 2>/dev/null | sort | tail -1)
echo "[endgame] trainer exited; newest snapshot: $CKPT"
[ -n "$CKPT" ] || { echo "[endgame] no snapshot found, aborting"; exit 1; }

# --- 1. (K, score-threshold) sweep on valmid --------------------------------
# K sizes the vote pool (more noise averaging in GN, O(K) cost); a lower
# score threshold admits more votes on a soft (from-scratch) model. Sweep K
# first at the default threshold, then thresholds at the best K.
for K in 32 64 128 256; do
  echo "[endgame] valmid sweep K=$K"
  timeout 2700 python -m pyrapose_tpu.cli.main evaluate linemod "$DATA" "$CKPT" \
    --set-name valmid --ransac-top-k "$K" \
    --report-json "$OUT/valmid_k${K}_t0.5.json" > "$OUT/valmid_k${K}_t0.5.log" 2>&1
done

pick_best() {  # prints "K THR" of the best valmid arm so far
  python - "$OUT" <<'PY'
import json, glob, sys
best = (64, 0.5, -1.0)
for f in glob.glob(sys.argv[1] + "/valmid_k*_t*.json"):
    stem = f.rsplit("/", 1)[1][len("valmid_k"):-len(".json")]
    if "_int8" in stem or "_px" in stem:
        # sibling sweeps' stems don't parse as "K_tTHR" (ADVICE r3)
        continue
    try:
        k_s, t_s = stem.split("_t")
        k, t = int(k_s), float(t_s)
        r = float(json.load(open(f)).get("mean_recall", -1))
    except Exception:
        continue
    if r > best[2] or (r == best[2] and k < best[0]):
        best = (k, t, r)
print(best[0], best[1])
PY
}

read -r BESTK _ <<<"$(pick_best)"
for T in 0.4 0.3; do
  echo "[endgame] valmid sweep K=$BESTK thr=$T"
  timeout 2700 python -m pyrapose_tpu.cli.main evaluate linemod "$DATA" "$CKPT" \
    --set-name valmid --ransac-top-k "$BESTK" --score-threshold "$T" \
    --report-json "$OUT/valmid_k${BESTK}_t$T.json" > "$OUT/valmid_k${BESTK}_t$T.log" 2>&1
done

read -r BESTK BESTT <<<"$(pick_best)"
echo "[endgame] best arm on valmid: K=$BESTK thr=$BESTT"

# --- 2. full val at the best arm --------------------------------------------
echo "[endgame] full val, K=$BESTK thr=$BESTT"
timeout 3600 python -m pyrapose_tpu.cli.main evaluate linemod "$DATA" "$CKPT" \
  --set-name val --ransac-top-k "$BESTK" --score-threshold "$BESTT" \
  --report-json "$OUT/val_k${BESTK}_t$BESTT.json" > "$OUT/val_k${BESTK}_t$BESTT.log" 2>&1

# --- 2b. train-split capacity report ----------------------------------------
# Separates "pipeline/capacity" from "generalization": with the GT-votes
# oracle at recall 1.0, train-split recall bounds what the regression has
# LEARNED; the val report above is what it GENERALIZES. (corner_bias.py
# r3: 8 px train vs 27 px val median under no-augment.)
echo "[endgame] train-split report, K=$BESTK thr=$BESTT"
timeout 2700 python -m pyrapose_tpu.cli.main evaluate linemod "$DATA" "$CKPT" \
  --set-name train --eval-samples 256 \
  --ransac-top-k "$BESTK" --score-threshold "$BESTT" \
  --report-json "$OUT/train256_k${BESTK}_t$BESTT.json" \
  > "$OUT/train256_k${BESTK}_t$BESTT.log" 2>&1

# --- 3. ICP arm -----------------------------------------------------------
echo "[endgame] full val + ICP, K=$BESTK thr=$BESTT"
timeout 4800 python -m pyrapose_tpu.cli.main evaluate linemod "$DATA" "$CKPT" \
  --set-name val --ransac-top-k "$BESTK" --score-threshold "$BESTT" --icp \
  --report-json "$OUT/val_k${BESTK}_t${BESTT}_icp.json" > "$OUT/val_k${BESTK}_t${BESTT}_icp.log" 2>&1

# --- 3.5 int8 PTQ A/B (docs/USAGE.md promises this measurement) -------------
echo "[endgame] valmid + int8 PTQ, K=$BESTK thr=$BESTT"
timeout 1800 python -m pyrapose_tpu.cli.main evaluate linemod "$DATA" "$CKPT" \
  --set-name valmid --ransac-top-k "$BESTK" --score-threshold "$BESTT" --int8 \
  --report-json "$OUT/valmid_int8_k${BESTK}.json" \
  > "$OUT/valmid_int8_k${BESTK}.log" 2>&1

# --- 4. approx-vs-exact top-k A/B ------------------------------------------
echo "[endgame] ab_topk at K=$BESTK (valmid)"
timeout 1800 python tools/ab_topk.py linemod "$DATA" "$CKPT" \
  --set-name valmid --ransac-top-k "$BESTK" --score-threshold "$BESTT" \
  > "$OUT/ab_topk.json" 2> "$OUT/ab_topk.log"

# --- 4.5 cascade-gate fate sweep (VERDICT r3 next-round #7) ----------------
# --ransac-fallback-px on the best arm: does the strict-consensus arbiter
# ever beat the reference's fixed 5 px gate on a real model? The px-sweep
# stems are excluded from pick_best by name.
for PX in 8 12; do
  echo "[endgame] cascade sweep: fallback ${PX}px (valmid)"
  timeout 1800 python -m pyrapose_tpu.cli.main evaluate linemod "$DATA" "$CKPT" \
    --set-name valmid --ransac-top-k "$BESTK" --score-threshold "$BESTT" \
    --ransac-fallback-px "$PX" \
    --report-json "$OUT/valmid_k${BESTK}_t${BESTT}_fpx${PX}.json" \
    > "$OUT/valmid_k${BESTK}_t${BESTT}_fpx${PX}.log" 2>&1
done
# winner (if any) replayed on full val for the keep/delete decision
BESTPX=$(python - "$OUT" "$BESTK" "$BESTT" <<'PY'
import json, sys, glob
out, k, t = sys.argv[1], sys.argv[2], sys.argv[3]
base = json.load(open(f"{out}/valmid_k{k}_t{t}.json")).get("mean_recall", -1)
best = ("", base)
for f in glob.glob(f"{out}/valmid_k{k}_t{t}_fpx*.json"):
    px = f.rsplit("_fpx", 1)[1][:-5]
    r = json.load(open(f)).get("mean_recall", -1)
    if r > best[1]:
        best = (px, r)
print(best[0])
PY
)
if [ -n "$BESTPX" ]; then
  echo "[endgame] cascade ${BESTPX}px beat baseline on valmid; replaying on val"
  timeout 3600 python -m pyrapose_tpu.cli.main evaluate linemod "$DATA" "$CKPT" \
    --set-name val --ransac-top-k "$BESTK" --score-threshold "$BESTT" \
    --ransac-fallback-px "$BESTPX" \
    --report-json "$OUT/val_k${BESTK}_t${BESTT}_fpx${BESTPX}.json" \
    > "$OUT/val_k${BESTK}_t${BESTT}_fpx${BESTPX}.log" 2>&1
else
  echo "[endgame] cascade gate never beat the strict gate on valmid"
fi

# --- 5. trajectory report ---------------------------------------------------
python tools/report_run.py "$RUN" > "$OUT/report_run.md" 2>&1

# --- 6. fresh bench on the idle chip ---------------------------------------
# skippable when the round already has a committed all-arm bench and the
# chip time is needed elsewhere (touch /tmp/skip_endgame_bench)
if [ "${SKIP_ENDGAME_BENCH:-0}" = "1" ] || [ -f /tmp/skip_endgame_bench ]; then
  echo "[endgame] bench skipped (sentinel/env)"
else
  echo "[endgame] bench.py"
  BENCH_BUDGET_S=2000 timeout 2400 python bench.py > "$OUT/bench.json" 2> "$OUT/bench.log"
fi

echo "$CKPT" > "$OUT/CKPT"
date -u +%FT%TZ > "$OUT/DONE"
echo "[endgame] complete"
