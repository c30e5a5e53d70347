#!/bin/bash
# Render + prestage only (the host-CPU critical path of bigrun.sh), with no
# training afterwards: used when the session wants to gate training on
# diagnostics first. Mirrors bigrun.sh's done-markers so a later bigrun.sh
# skips straight to training.
set -u
cd "$(dirname "$0")/.."
DATA=${DATA:-/root/data}
MESHES=$DATA/meshes
SET=$DATA/lm_syn
RUN=${RUN:-$DATA/bigrun}  # prestage target: the trainer's --snapshot-path
EVIDENCE=${EVIDENCE:-$PWD/runs_evidence/r3}
N_TRAIN=${N_TRAIN:-20000}
mkdir -p "$EVIDENCE" "$DATA" "$RUN"
stamp() { date -u +%FT%TZ; }

if [ ! -f "$MESHES/models_info.json" ]; then
  echo "[render $(stamp)] generating meshes"
  python scripts/make_demo_meshes.py "$MESHES"
fi

render() {
  local name=$1 n=$2 seed=$3
  if [ -f "$SET/annotations/${name}_done" ]; then return; fi
  echo "[render $(stamp)] rendering $name ($n images)"
  JAX_PLATFORMS=cpu python -m pyrapose_tpu.cli.main render-synthetic \
    "$MESHES" "$SET" --set-name "$name" --n-images "$n" --seed "$seed" \
    >> "$EVIDENCE/render_$name.log" 2>&1 \
  && touch "$SET/annotations/${name}_done"
}
render valmid 64 2000000
render val   1500 1000003
render train "$N_TRAIN" 0
for s in valmid val train; do
  [ -f "$SET/annotations/${s}_done" ] || { echo "[render] $s FAILED"; exit 1; }
done
echo "[render $(stamp)] pre-staging device-cache chunks"
python tools/prestage_chunks.py "$SET" "$RUN" --cache-frames 5000 --seed 0 \
  >> "$EVIDENCE/prestage.log" 2>&1 \
  || echo "[render $(stamp)] WARNING: prestage failed"
echo "[render $(stamp)] done"
