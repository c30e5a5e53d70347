#!/bin/bash
# Unattended chain: wait for render_only.sh (render + prestage) to finish,
# then launch the phase-2b geometric-only finalrun (DIAGNOSIS.md §5).
# Survives the launching session's death; logs to /tmp/chain_phase2b.log.
#
# Usage: nohup tools/chain_phase2b.sh > /tmp/chain_phase2b.log 2>&1 &
set -u
cd "$(dirname "$0")/.."
DATA=${DATA:-/root/data}
RUN=${RUN:-$DATA/final2}
stamp() { date -u +%FT%TZ; }

echo "[chain $(stamp)] waiting for render+prestage driver to finish"
while :; do
  grep -q '^\[render .*\] done' /tmp/render_driver.log 2>/dev/null && break
  # prestage failure still prints done via the || warning path; also bail
  # if the render driver died without the marker so we don't wait forever
  if [ -f /tmp/render.pid ] && ! kill -0 "$(cat /tmp/render.pid)" 2>/dev/null; then
    grep -q 'done' /tmp/render_driver.log 2>/dev/null && break
    echo "[chain $(stamp)] render driver died without done marker; launching anyway"
    break
  fi
  sleep 30
done

# the phase-2 endgame owns the chip while its arms run; wait for DONE (the
# train256 arm needs the chip and the freshly rendered train split)
EG=runs_evidence/r3final/endgame
if [ -f /tmp/eg2.pid ] && kill -0 "$(cat /tmp/eg2.pid)" 2>/dev/null; then
  echo "[chain $(stamp)] waiting for phase-2 endgame arms to release the chip"
  for _ in $(seq 1 240); do   # cap: 2 h
    [ -f "$EG/DONE" ] && break
    kill -0 "$(cat /tmp/eg2.pid)" 2>/dev/null || break
    sleep 30
  done
fi

echo "[chain $(stamp)] launching phase-2b finalrun (geometric-only)"
RUN="$RUN" EVIDENCE="$PWD/runs_evidence/r3final2" \
  AUG_FLAGS=--augment-geometric-only EPOCHS=160 LR=2e-4 WARMUP=2 \
  nohup tools/finalrun.sh > /tmp/finalrun2_driver.log 2>&1 &
echo "[chain $(stamp)] finalrun pid $!"
