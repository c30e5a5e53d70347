#!/bin/bash
# Round-4 flagship chain: gate -> launch phase-2b -> density render.
#
# Encodes the round-3 post-mortem's launch discipline (VERDICT r3 weak #2):
#  1. wait for the prestaged chunks (render_only.sh) and for any bench run
#     to release the chip;
#  2. REFUSE to launch from a dirty tree — the r3 flagship died because the
#     trainer imported a mid-edit inference.py against an older ransac.py;
#  3. launch tools/finalrun.sh (geometric-only phase-2b, resumed from the
#     committed r3final2 checkpoint) — its trainer now runs the eval
#     preflight before committing the chip;
#  4. once training is live, start the 40k density render host-side
#     (tools/density_sweep.sh RENDER_ONLY=1) for the post-run probe.
#
# Usage: nohup tools/chain_r4.sh > /tmp/chain_r4.log 2>&1 &
set -u
cd "$(dirname "$0")/.."
DATA=${DATA:-/root/data}
RUN=${RUN:-$DATA/final2}
EVIDENCE=${EVIDENCE:-$PWD/runs_evidence/r4final}
EPOCHS=${EPOCHS:-160}
stamp() { date -u +%FT%TZ; }

echo "[chain $(stamp)] waiting for prestaged chunks in $RUN"
while :; do
  n=$(ls "$RUN"/device_cache_c*.npz 2>/dev/null | wc -l)
  [ "$n" -ge 4 ] && break
  sleep 60
done
echo "[chain $(stamp)] $n chunks prestaged"

if [ -f /tmp/bench.pid ] && kill -0 "$(cat /tmp/bench.pid)" 2>/dev/null; then
  echo "[chain $(stamp)] waiting for bench (pid $(cat /tmp/bench.pid)) to release the chip"
  while kill -0 "$(cat /tmp/bench.pid)" 2>/dev/null; do sleep 30; done
fi
echo "[chain $(stamp)] chip free"

if [ -n "$(git status --porcelain --untracked-files=no)" ]; then
  echo "[chain $(stamp)] REFUSING to launch: working tree is dirty (r3 lesson)"
  git status --porcelain --untracked-files=no | head
  exit 1
fi
echo "[chain $(stamp)] tree clean at $(git rev-parse --short HEAD)"

mkdir -p "$EVIDENCE"
RUN="$RUN" EVIDENCE="$EVIDENCE" AUG_FLAGS=--augment-geometric-only \
  EPOCHS="$EPOCHS" LR=2e-4 WARMUP=2 \
  nohup tools/finalrun.sh > /tmp/finalrun_r4_driver.log 2>&1 &
echo $! > /tmp/finalrun_r4.pid
echo "[chain $(stamp)] finalrun launched (driver pid $(cat /tmp/finalrun_r4.pid))"

# give the trainer time to pass preflight + stage chunk 0, then start the
# 40k render on the host (it only competes for the CPU, not the chip)
sleep 900
if ! kill -0 "$(cat /tmp/finalrun_r4.pid)" 2>/dev/null; then
  echo "[chain $(stamp)] WARNING: finalrun driver died within 15 min — check $EVIDENCE/train.log"
fi
echo "[chain $(stamp)] starting 40k density render (host-side)"
RENDER_ONLY=1 nohup tools/density_sweep.sh > /tmp/density_render.log 2>&1 &
echo $! > /tmp/density_render.pid
echo "[chain $(stamp)] chain set up complete"
