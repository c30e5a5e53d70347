#!/bin/bash
# Chain v2 (replaces chain_phase2b.sh's tail): drain the phase-2 endgame,
# run the RANSAC inlier-gate sweep (the one decode hyperparameter the
# endgame did not cover: reference hardcodes 5 px, linemod_eval.py:479;
# phase-2's train-split votes sit at ~8 px median so the 5 px gate is the
# binding constraint — measure what widening it buys at fixed ADD-0.1d),
# then launch the phase-2b geometric-only finalrun once prestage is done.
#
# Usage: nohup tools/chain_phase2b_v2.sh > /tmp/chain2.log 2>&1 &
set -u
cd "$(dirname "$0")/.."
DATA=${DATA:-/root/data}
SET=$DATA/lm_syn
RUN=${RUN:-$DATA/final2}
CKPT=${CKPT:-$DATA/final2_src/step_00025272}
EG=runs_evidence/r3final/endgame
stamp() { date -u +%FT%TZ; }

echo "[chain2 $(stamp)] draining phase-2 endgame"
for _ in $(seq 1 120); do
  [ -f "$EG/DONE" ] && break
  [ -f /tmp/eg2.pid ] && kill -0 "$(cat /tmp/eg2.pid)" 2>/dev/null || break
  sleep 30
done

run_eval() {
  local name=$1; shift
  [ -f "$EG/$name.json" ] && return 0
  echo "[chain2 $(stamp)] $name"
  timeout 2700 python -m pyrapose_tpu.cli.main evaluate linemod "$SET" "$CKPT" \
    --report-json "$EG/$name.json" "$@" > "$EG/$name.log" 2>&1
}

for PX in 8 12; do
  run_eval "train256_k64_t0.4_px$PX" --set-name train --eval-samples 256 \
    --ransac-top-k 64 --score-threshold 0.4 --ransac-inlier-px "$PX"
done
run_eval "valmid_k64_t0.4_px8" --set-name valmid \
  --ransac-top-k 64 --score-threshold 0.4 --ransac-inlier-px 8
python - "$EG" <<'PY'
import glob, json, sys
for f in sorted(glob.glob(sys.argv[1] + "/*px*.json")):
    try:
        d = json.load(open(f))
        print(f.rsplit("/", 1)[1], d.get("mean_recall"))
    except Exception as e:
        print(f, "ERR", e)
PY

echo "[chain2 $(stamp)] waiting for prestage (render driver done marker)"
while :; do
  grep -q '^\[render .*\] done' /tmp/render_driver.log 2>/dev/null && break
  if [ -f /tmp/render.pid ] && ! kill -0 "$(cat /tmp/render.pid)" 2>/dev/null; then
    echo "[chain2 $(stamp)] render driver died; proceeding"
    break
  fi
  sleep 30
done

echo "[chain2 $(stamp)] launching phase-2b finalrun (geometric-only)"
RUN="$RUN" EVIDENCE="$PWD/runs_evidence/r3final2" \
  AUG_FLAGS=--augment-geometric-only EPOCHS=160 LR=2e-4 WARMUP=2 \
  nohup tools/finalrun.sh > /tmp/finalrun2_driver.log 2>&1 &
echo "[chain2 $(stamp)] finalrun pid $!"
