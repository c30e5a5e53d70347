#!/bin/bash
# Round-2 accuracy-evidence run (VERDICT round-1 item 1), end to end and
# unattended:
#
#   meshes -> render-synthetic (train/val/valmid) -> from-scratch training
#   (docs/USAGE.md recipe) -> tools/endgame.sh evaluation chain.
#
# Everything a later session (or the judge) needs lands under
# $EVIDENCE inside the repo — /root/data does NOT survive VM re-provisioning
# (this round's first run was lost exactly that way), so logs, metrics and
# eval reports are copied into the git tree as they appear.
#
# Usage: nohup tools/bigrun.sh > /tmp/bigrun_driver.log 2>&1 &
set -u
cd "$(dirname "$0")/.."
REPO=$PWD
DATA=${DATA:-/root/data}
MESHES=$DATA/meshes
SET=$DATA/lm_syn
RUN=$DATA/bigrun
EVIDENCE=${EVIDENCE:-$REPO/runs_evidence/r2}
N_TRAIN=${N_TRAIN:-20000}
EPOCHS=${EPOCHS:-480}           # x5000-frame chunks = 2.4M images seen
mkdir -p "$EVIDENCE" "$DATA"

stamp() { date -u +%FT%TZ; }

# --- 0. meshes ---------------------------------------------------------------
if [ ! -f "$MESHES/models_info.json" ]; then
  echo "[bigrun $(stamp)] generating meshes"
  python scripts/make_demo_meshes.py "$MESHES"
fi

# --- 1. render (restartable: per-image RNG streams skip existing files) ------
# CPU-only JAX: the renderer's small ops round-trip the remote-TPU tunnel
# otherwise (measured 0.92 s/img axon vs 0.35 s/img cpu on this host).
render() {  # set_name n seed
  local name=$1 n=$2 seed=$3
  if [ -f "$SET/annotations/${name}_done" ]; then return; fi
  echo "[bigrun $(stamp)] rendering $name ($n images)"
  JAX_PLATFORMS=cpu python -m pyrapose_tpu.cli.main render-synthetic \
    "$MESHES" "$SET" --set-name "$name" --n-images "$n" --seed "$seed" \
    >> "$EVIDENCE/render_$name.log" 2>&1 \
  && touch "$SET/annotations/${name}_done"
}
render valmid 64 2000000
render val   1500 1000003
render train "$N_TRAIN" 0
for s in valmid val train; do
  [ -f "$SET/annotations/${s}_done" ] || { echo "[bigrun] render $s FAILED"; exit 1; }
done

# --- 2. train (docs/USAGE.md from-scratch recipe, HBM chunk rotation) --------
# 5000-frame chunks (5 GB) + prefetch keep peak cache residency 10 GB of the
# 16 GB HBM; rotate every 2 epochs -> full 20k coverage each 8 epochs.
# Supervised + stall-watchdog: tunnel wedges/preemptions self-heal.
echo "[bigrun $(stamp)] training: $EPOCHS epochs x 5000-frame chunks"
python -m pyrapose_tpu.cli.main train linemod "$SET" \
  --batch-size 16 --epochs "$EPOCHS" --lr 3e-4 \
  --warmup-epochs 8 --cosine-decay --head-l2 0 \
  --no-freeze-stem --train-bn \
  --device-cache --device-cache-frames 5000 --device-cache-rotate 2 \
  --device-cache-prefetch \
  --snapshot-path "$RUN" --auto-resume --save-epochs 20 \
  --keep-checkpoints 4 \
  --eval-every 20 --eval-samples 64 --val-set-name valmid \
  --stall-timeout 1200 --supervise 60 \
  > "$EVIDENCE/train.log" 2>&1 &
TRAINER=$!
echo $TRAINER > /tmp/bigrun.pid
echo "[bigrun $(stamp)] trainer pid $TRAINER"

# copy live evidence into the repo while training runs
while kill -0 "$TRAINER" 2>/dev/null; do
  sleep 300
  cp -f "$RUN/metrics.jsonl" "$EVIDENCE/metrics.jsonl" 2>/dev/null
  tail -40 "$EVIDENCE/train.log" > "$EVIDENCE/train_tail.log" 2>/dev/null
done
wait "$TRAINER"; RC=$?
cp -f "$RUN/metrics.jsonl" "$EVIDENCE/metrics.jsonl" 2>/dev/null
echo "[bigrun $(stamp)] trainer exited rc=$RC"

# --- 3. evaluation chain ------------------------------------------------------
OUT="$EVIDENCE/endgame" DATA="$SET" RUN="$RUN" tools/endgame.sh "$TRAINER"
echo "[bigrun $(stamp)] all done"
