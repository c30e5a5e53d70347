#!/bin/bash
# Dataset-density probe (VERDICT r3 next-round #2): does the ~26 px val
# corner-error floor move with training-set size, or is it a property of
# the 20k-frame sandbox render (the "pose-space sparsity" hypothesis of
# runs_evidence/r3final/DIAGNOSIS.md §4)?
#
# Design: arms at FIXED optimizer-step compute, identical recipe
# (geometric-only augmentation, frozen BN, warm restart from the same
# checkpoint — the exact phase-2b regime, so the arms compose with the
# flagship run). Each arm trains EPOCHS*312 steps, then measures val
# corner error (tools/corner_error.py) and valmid ADD(-S) recall.
#
# Default arms measure the data-size slope AT 20k FROM BELOW:
#   arm 10k: the first half of the 20k train set (derived annotations +
#            symlinked images — zero new rendering)
#   arm 20k: the flagship's own dataset
# Reading: 10k clearly worse than 20k at equal compute => the size curve
# still climbs at 20k => more data plausibly helps (sparsity hypothesis
# supported; render 40k+ next). 10k ~= 20k => saturated at 20k => the
# floor is NOT data volume (sparsity claim refuted; the lever is
# augmentation/optimization). A 40k arm (disjoint-seed re-render, ~100
# min host-side at 1 core) is included when $SET40 exists with
# annotations/train_done — run `RENDER40=1 RENDER_ONLY=1` early to
# prepare it while the chip is busy.
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
SET10=${SET10:-$DATA/lm_syn10k}
SET40=${SET40:-$DATA/lm_syn40}
EVIDENCE=${EVIDENCE:-$REPO/runs_evidence/r4/density}
EPOCHS=${EPOCHS:-16}           # per arm, at 312 steps/epoch
LR=${LR:-2e-4}
CKPT=${CKPT:-}
mkdir -p "$EVIDENCE" "$DATA"
stamp() { date -u +%FT%TZ; }

# ---- optional 40k train render (disjoint seed stream) -----------------------
if [ "${RENDER40:-0}" = "1" ] && [ ! -f "$SET40/annotations/train_done" ]; then
  mkdir -p "$SET40/annotations"
  echo "[density $(stamp)] rendering 40k train set"
  JAX_PLATFORMS=cpu python -m pyrapose_tpu.cli.main render-synthetic \
    "$MESHES" "$SET40" --set-name train --n-images 40000 --seed 7000000 \
    >> "$EVIDENCE/render40.log" 2>&1 \
    && touch "$SET40/annotations/train_done"
fi

# ---- 10k arm dataset: derived view of the 20k set ---------------------------
if [ ! -f "$SET10/annotations/instances_train.json" ]; then
  echo "[density $(stamp)] deriving 10k dataset view from $SET20"
  mkdir -p "$SET10/annotations" "$SET10/images"
  python - "$SET20" "$SET10" <<'PY'
import json, sys
src, dst = sys.argv[1], sys.argv[2]
d = json.load(open(f"{src}/annotations/instances_train.json"))
imgs = sorted(d["images"], key=lambda im: im["id"])[: len(d["images"]) // 2]
keep = {im["id"] for im in imgs}
anns = [a for a in d["annotations"] if a["image_id"] in keep]
json.dump({**d, "images": imgs, "annotations": anns},
          open(f"{dst}/annotations/instances_train.json", "w"))
print(f"10k view: {len(imgs)} images, {len(anns)} annotations")
PY
  cp "$SET20/annotations/models_info.json" "$SET10/annotations/"
  for s in val valmid; do
    cp "$SET20/annotations/instances_$s.json" "$SET10/annotations/" 2>/dev/null || true
    ln -sfn "$SET20/images/$s" "$SET10/images/$s"
  done
  ln -sfn "$SET20/images/train" "$SET10/images/train"
fi

# ---- prestage decoded chunks for the arms (host-side, no chip) --------------
FINAL_RUN=${FINAL_RUN:-$DATA/final2}
mkdir -p "$DATA/density_10k" "$DATA/density_20k"
for f in "$FINAL_RUN"/device_cache_c*.npz; do
  [ -f "$f" ] || continue
  ln -f "$f" "$DATA/density_20k/$(basename "$f")" 2>/dev/null \
    || cp -n "$f" "$DATA/density_20k/" 2>/dev/null || true
done
if [ ! -f "$DATA/density_10k/device_cache_c1.npz" ]; then
  echo "[density $(stamp)] prestaging 10k chunks"
  python tools/prestage_chunks.py "$SET10" "$DATA/density_10k" \
    --cache-frames 5000 --seed 0 >> "$EVIDENCE/prestage10.log" 2>&1 \
    || echo "[density $(stamp)] WARNING: 10k prestage failed"
fi
if [ -f "$SET40/annotations/train_done" ] \
   && [ ! -f "$DATA/density_40k/device_cache_c7.npz" ]; then
  mkdir -p "$DATA/density_40k"
  echo "[density $(stamp)] prestaging 40k chunks"
  python tools/prestage_chunks.py "$SET40" "$DATA/density_40k" \
    --cache-frames 5000 --seed 0 >> "$EVIDENCE/prestage40.log" 2>&1 \
    || echo "[density $(stamp)] WARNING: 40k prestage failed"
fi

[ "${RENDER_ONLY:-0}" = "1" ] && { echo "[density $(stamp)] render/prep done"; exit 0; }

[ -n "$CKPT" ] || { echo "[density] set CKPT=<warm-start checkpoint>"; exit 1; }

run_arm() {  # name data_root
  local name=$1 root=$2 run=$DATA/density_$1
  mkdir -p "$run"
  echo "[density $(stamp)] arm $name: $EPOCHS epochs from $CKPT"
  python -m pyrapose_tpu.cli.main train linemod "$root" \
    --batch-size 16 --epochs "$EPOCHS" --lr "$LR" \
    --warmup-epochs 1 --cosine-decay --head-l2 0 \
    --no-freeze-stem --augment-geometric-only \
    --device-cache --device-cache-frames 5000 --device-cache-rotate 4 \
    --device-cache-prefetch \
    --snapshot "$CKPT" --snapshot-path "$run" \
    --save-epochs "$EPOCHS" --keep-checkpoints 2 \
    --stall-timeout 1200 \
    > "$EVIDENCE/train_$name.log" 2>&1 &
  local tpid=$!
  # register with the bench quiesce protocol (bench.py sends STOP to
  # {snapshot_path}/STOP of the pid in /tmp/bigrun.pid): a round-end
  # driver bench then gracefully stops the arm instead of contending
  echo "$tpid" > /tmp/bigrun.pid
  echo "$run" > /tmp/bigrun.run
  wait "$tpid"
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

run_arm 10k "$SET10"
run_arm 20k "$SET20"
[ -f "$DATA/density_40k/device_cache_c7.npz" ] && run_arm 40k "$SET40"
echo "[density $(stamp)] done — compare corner_{10k,20k}_val.txt and recall_*_valmid.json"
