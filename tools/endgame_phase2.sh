#!/bin/bash
# Trimmed endgame for the phase-2 checkpoint (step_00025272), designed to
# overlap with the dataset re-render after a VM re-provision: each arm
# waits only for the split it needs (valmid/val first, the train-split
# capacity arm once the 20k train render lands).
#
# Rationale (runs_evidence/r3final/DIAGNOSIS.md): phase 2 converged the
# dense corner regression to 8.2 px median on its training views and
# 26.8 px on val. The train-split report is therefore the round's key
# CAPACITY evidence (recall >> 0 expected); the val report is the honest
# generalization number under the sandbox's sparse synthetic pose space.
#
# Usage: nohup tools/endgame_phase2.sh > /tmp/endgame_phase2.log 2>&1 &
set -u
cd "$(dirname "$0")/.."
DATA=${DATA:-/root/data/lm_syn}
CKPT=${CKPT:-/root/data/final2_src/step_00025272}
OUT=${OUT:-$PWD/runs_evidence/r3final/endgame}
mkdir -p "$OUT"
stamp() { date -u +%FT%TZ; }

wait_marker() {  # block until a render done-marker exists
  while [ ! -f "$DATA/annotations/$1_done" ]; do sleep 20; done
}

run_eval() {  # name, extra args...
  local name=$1; shift
  [ -f "$OUT/$name.json" ] && { echo "[eg2 $(stamp)] $name cached"; return 0; }
  echo "[eg2 $(stamp)] $name"
  timeout 2700 python -m pyrapose_tpu.cli.main evaluate linemod "$DATA" "$CKPT" \
    --report-json "$OUT/$name.json" "$@" > "$OUT/$name.log" 2>&1
}

pick_best() {  # prints "K THR" of the best valmid arm so far
  python - "$OUT" <<'PY'
import json, glob, sys
best = (128, 0.5, -1.0)
for f in glob.glob(sys.argv[1] + "/valmid_k*_t*.json"):
    stem = f.rsplit("/", 1)[1][len("valmid_k"):-len(".json")]
    if "_int8" in stem or "_px" in stem:
        # other sweeps (int8 A/B, --ransac-inlier-px) share this dir;
        # their stems don't parse as "K_tTHR" (ADVICE r3 finding 3)
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

wait_marker valmid
for K in 64 128 256; do
  run_eval "valmid_k${K}_t0.5" --set-name valmid --ransac-top-k "$K"
done
read -r BESTK _ <<<"$(pick_best)"
for T in 0.4 0.3; do
  run_eval "valmid_k${BESTK}_t$T" --set-name valmid --ransac-top-k "$BESTK" \
    --score-threshold "$T"
done
read -r BESTK BESTT <<<"$(pick_best)"
echo "[eg2 $(stamp)] best valmid arm: K=$BESTK thr=$BESTT"

wait_marker val
run_eval "val_k${BESTK}_t$BESTT" --set-name val \
  --ransac-top-k "$BESTK" --score-threshold "$BESTT"

wait_marker train
run_eval "train256_k${BESTK}_t$BESTT" --set-name train --eval-samples 256 \
  --ransac-top-k "$BESTK" --score-threshold "$BESTT"

run_eval "valmid_int8_k${BESTK}_t$BESTT" --set-name valmid --int8 \
  --ransac-top-k "$BESTK" --score-threshold "$BESTT"

echo "[eg2 $(stamp)] ab_topk at K=$BESTK"
[ -f "$OUT/ab_topk.json" ] || timeout 1800 python tools/ab_topk.py \
  linemod "$DATA" "$CKPT" --set-name valmid \
  --ransac-top-k "$BESTK" --score-threshold "$BESTT" \
  > "$OUT/ab_topk.json" 2> "$OUT/ab_topk.log"

touch "$OUT/DONE"
echo "[eg2 $(stamp)] all arms done"
