#!/bin/bash
# Dataset-density probe (VERDICT r3 next-round #2): does the ~26 px val
# corner-error floor move with training-set size, or is it a property of
# the 20k-frame sandbox render (the "pose-space sparsity" hypothesis of
# runs_evidence/r3final/DIAGNOSIS.md §4)?
#
# Design: two arms at FIXED optimizer-step compute, identical recipe
# (geometric-only augmentation, frozen BN, warm restart from the same
# checkpoint — the exact phase-2b regime, so the arms compose with the
# flagship run as a 20k-vs-40k comparison):
#   arm A: 20k-frame train set  (the flagship's own dataset)
#   arm B: 40k-frame train set  (a disjoint-seed re-render, same renderer)
# Each arm trains STEPS optimizer steps, then measures val corner error
# (tools/corner_error.py) and valmid ADD(-S) recall. A lower arm-B corner
# error at equal compute = density moves the floor -> scale the dataset
# next; equal errors = saturation -> the sparsity claim is refuted and the
# floor belongs to the optimization/augmentation axis.
#
# The 40k set renders host-side (~100 min on 1 core, restartable) and does
# not touch the chip; run `RENDER_ONLY=1 tools/density_sweep.sh` early to
# prepare data while the chip trains something else.
#
# Usage:
#   RENDER_ONLY=1 nohup tools/density_sweep.sh > /tmp/density_render.log 2>&1 &
#   ... later, with the chip free:
#   CKPT=/root/data/final2/step_XXXX nohup tools/density_sweep.sh > /tmp/density.log 2>&1 &
set -u
cd "$(dirname "$0")/.."
REPO=$PWD
DATA=${DATA:-/root/data}
MESHES=$DATA/meshes
SET20=${SET20:-$DATA/lm_syn}
SET40=${SET40:-$DATA/lm_syn40}
EVIDENCE=${EVIDENCE:-$REPO/runs_evidence/r4/density}
EPOCHS=${EPOCHS:-24}           # per arm, at 312 steps/epoch on 20k chunks
LR=${LR:-2e-4}
CKPT=${CKPT:-}
mkdir -p "$EVIDENCE" "$DATA"
stamp() { date -u +%FT%TZ; }

# ---- 40k train render (disjoint seed stream from the 20k set) ---------------
if [ ! -f "$SET40/annotations/train_done" ]; then
  mkdir -p "$SET40/annotations"
  echo "[density $(stamp)] rendering 40k train set"
  JAX_PLATFORMS=cpu python -m pyrapose_tpu.cli.main render-synthetic \
    "$MESHES" "$SET40" --set-name train --n-images 40000 --seed 7000000 \
    >> "$EVIDENCE/render40.log" 2>&1 \
    && touch "$SET40/annotations/train_done"
fi
# both arms evaluate on the SAME val/valmid splits (copied annotations +
# images from the 20k set — val identity is what makes the arms comparable)
for s in val valmid; do
  if [ ! -f "$SET40/annotations/instances_$s.json" ]; then
    cp "$SET20/annotations/instances_$s.json" "$SET40/annotations/"
    mkdir -p "$SET40/images/$s"
    cp -r "$SET20/images/$s/." "$SET40/images/$s/" 2>/dev/null || true
  fi
done
# prestage decoded chunks for both arms (host-side, no chip):
# arm 20k reuses the flagship's chunks by hardlink (same dataset, same
# seed, same --cache-frames => identical chunk table and disk keys);
# arm 40k decodes once here instead of inside the training timeline.
FINAL_RUN=${FINAL_RUN:-$DATA/final2}
mkdir -p "$DATA/density_20k" "$DATA/density_40k"
for f in "$FINAL_RUN"/device_cache_c*.npz; do
  [ -f "$f" ] || continue
  ln -f "$f" "$DATA/density_20k/$(basename "$f")" 2>/dev/null \
    || cp -n "$f" "$DATA/density_20k/" 2>/dev/null || true
done
if [ ! -f "$DATA/density_40k/device_cache_c7.npz" ] \
   && [ -f "$SET40/annotations/train_done" ]; then
  echo "[density $(stamp)] prestaging 40k chunks"
  python tools/prestage_chunks.py "$SET40" "$DATA/density_40k" \
    --cache-frames 5000 --seed 0 >> "$EVIDENCE/prestage40.log" 2>&1 \
    || echo "[density $(stamp)] WARNING: 40k prestage failed"
fi

[ "${RENDER_ONLY:-0}" = "1" ] && { echo "[density $(stamp)] render done"; exit 0; }

[ -n "$CKPT" ] || { echo "[density] set CKPT=<warm-start checkpoint>"; exit 1; }

run_arm() {  # name data_root
  local name=$1 root=$2 run=$DATA/density_$1
  mkdir -p "$run"
  echo "[density $(stamp)] arm $name: $EPOCHS epochs from $CKPT"
  python -m pyrapose_tpu.cli.main train linemod "$root" \
    --batch-size 16 --epochs "$EPOCHS" --lr "$LR" \
    --warmup-epochs 1 --cosine-decay --head-l2 0 \
    --no-freeze-stem --augment-geometric-only \
    --device-cache --device-cache-frames 5000 --device-cache-rotate 2 \
    --device-cache-prefetch \
    --snapshot "$CKPT" --snapshot-path "$run" \
    --save-epochs "$EPOCHS" --keep-checkpoints 2 \
    --stall-timeout 1200 \
    > "$EVIDENCE/train_$name.log" 2>&1
  local ck
  ck=$(ls -d "$run"/step_* 2>/dev/null | sort | tail -1)
  echo "[density $(stamp)] arm $name eval: $ck"
  python tools/corner_error.py linemod "$root" "$ck" --split val --n 64 \
    > "$EVIDENCE/corner_${name}_val.txt" 2>&1
  python tools/corner_error.py linemod "$root" "$ck" --split train --n 64 \
    > "$EVIDENCE/corner_${name}_train.txt" 2>&1
  timeout 2700 python -m pyrapose_tpu.cli.main evaluate linemod "$root" "$ck" \
    --set-name valmid --ransac-top-k 128 --score-threshold 0.3 \
    --report-json "$EVIDENCE/recall_${name}_valmid.json" \
    > "$EVIDENCE/recall_${name}_valmid.log" 2>&1
  cp -f "$run/metrics.jsonl" "$EVIDENCE/metrics_$name.jsonl" 2>/dev/null
}

run_arm 20k "$SET20"
run_arm 40k "$SET40"
echo "[density $(stamp)] done — compare corner_{20k,40k}_val.txt and recall_*_valmid.json"
