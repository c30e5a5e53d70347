#!/bin/bash
# Round-2 accuracy-evidence run (VERDICT round-1 item 1), end to end and
# unattended:
#
#   meshes -> render-synthetic (train/val/valmid) -> from-scratch training
#   (docs/USAGE.md recipe) -> tools/endgame.sh evaluation chain.
#
# /root/data does NOT survive VM re-provisioning (this round's first two
# attempts were lost exactly that way) and neither do UNCOMMITTED files in
# the git tree (the tree is restored from HEAD at provision time). So this
# driver COMMITS its evidence as it appears:
#   - logs/metrics every ~30 min,
#   - a tarball of the newest orbax checkpoint every ~2.5 h
#     (runs_evidence/r2/ckpt_latest.tar, replaced in place),
# and at startup it restores $RUN from the committed tarball so training
# resumes (--auto-resume keeps step/opt state) instead of starting over.
#
# Usage: nohup tools/bigrun.sh > /tmp/bigrun_driver.log 2>&1 &
set -u
cd "$(dirname "$0")/.."
REPO=$PWD
DATA=${DATA:-/root/data}
MESHES=$DATA/meshes
SET=$DATA/lm_syn
RUN=$DATA/bigrun
EVIDENCE=${EVIDENCE:-$REPO/runs_evidence/r3}
N_TRAIN=${N_TRAIN:-20000}
EPOCHS=${EPOCHS:-170}           # x5000-frame chunks; cosine horizon that COMPLETES in-round
mkdir -p "$EVIDENCE" "$DATA" "$RUN"

stamp() { date -u +%FT%TZ; }

gcommit() {  # gcommit <msg> <path>... : commit working-tree state of paths
  local msg=$1; shift
  local i
  for i in 1 2 3; do
    git add -A -- "$@" >/dev/null 2>&1
    if git commit -q -m "$msg" -- "$@" >/dev/null 2>&1; then
      echo "[bigrun $(stamp)] committed: $msg"
      return 0
    fi
    # "nothing to commit" is success; a held index.lock gets a retry
    git status --porcelain -- "$@" 2>/dev/null | grep -q . || return 0
    sleep 11
  done
  echo "[bigrun $(stamp)] WARNING: commit failed: $msg"
  return 1
}

snap_ckpt() {  # tar the newest complete checkpoint into the repo + commit
  local ck name
  ck=$(ls -d "$RUN"/step_* 2>/dev/null | grep -v tmp | sort | tail -1)
  [ -n "$ck" ] || return 0
  name=$(basename "$ck")
  [ "$(cat "$EVIDENCE/ckpt_latest.name" 2>/dev/null)" = "$name" ] && return 0
  echo "[bigrun $(stamp)] snapshotting checkpoint $name into the repo"
  tar -C "$RUN" -cf "$EVIDENCE/ckpt_latest.tar.tmp" "$name" \
    && mv -f "$EVIDENCE/ckpt_latest.tar.tmp" "$EVIDENCE/ckpt_latest.tar" \
    && echo "$name" > "$EVIDENCE/ckpt_latest.name" \
    && gcommit "bigrun: durable checkpoint snapshot $name" \
         "$EVIDENCE/ckpt_latest.tar" "$EVIDENCE/ckpt_latest.name"
}

# --- restore a committed checkpoint after VM re-provisioning ----------------
if ! ls "$RUN"/step_* >/dev/null 2>&1 && [ -f "$EVIDENCE/ckpt_latest.tar" ]; then
  echo "[bigrun $(stamp)] restoring committed checkpoint $(cat "$EVIDENCE/ckpt_latest.name" 2>/dev/null)"
  tar -C "$RUN" -xf "$EVIDENCE/ckpt_latest.tar"
  # metrics.jsonl is append-mode: seed it so the curve stays continuous
  [ -f "$RUN/metrics.jsonl" ] || cp -f "$EVIDENCE/metrics.jsonl" "$RUN/metrics.jsonl" 2>/dev/null
elif ! ls "$RUN"/step_* >/dev/null 2>&1 && [ -s "$EVIDENCE/metrics.jsonl" ] \
    && [ ! -f "$RUN/metrics.jsonl" ]; then
  # fresh start with no restorable checkpoint: keep the dead attempt's
  # metrics as separate evidence rather than mixing two step counters
  n=$(ls "$EVIDENCE"/metrics_attempt*.jsonl 2>/dev/null | wc -l)
  mv "$EVIDENCE/metrics.jsonl" "$EVIDENCE/metrics_attempt$((n + 1)).jsonl"
fi

# --- background committer (runs for the whole driver lifetime) --------------
committer() {
  local i=0
  while :; do
    sleep 300
    i=$((i + 1))
    cp -f "$RUN/metrics.jsonl" "$EVIDENCE/metrics.jsonl" 2>/dev/null
    tail -40 "$EVIDENCE/train.log" > "$EVIDENCE/train_tail.log" 2>/dev/null
    if [ $((i % 6)) -eq 0 ]; then
      gcommit "bigrun: live evidence snapshot" "$EVIDENCE"
    fi
    if [ $((i % 30)) -eq 0 ]; then
      snap_ckpt
    fi
  done
}
committer & COMMITTER=$!
trap 'kill "$COMMITTER" 2>/dev/null' EXIT

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

# --- 1b. pre-build every rotation chunk's decoded .npz (host-only work) ------
# Without this the FIRST visit of each chunk blocks training on a minutes-
# long single-core PNG decode (r2: epochs at 4.5-46 img/s vs 129 steady
# state). Skips chunks that already exist, so restarts are free.
echo "[bigrun $(stamp)] pre-staging device-cache chunks"
python tools/prestage_chunks.py "$SET" "$RUN" --cache-frames 5000 --seed 0 \
  >> "$EVIDENCE/prestage.log" 2>&1 \
  || echo "[bigrun $(stamp)] WARNING: prestage failed (trainer will decode inline)"

# --- 2. train (docs/USAGE.md from-scratch recipe, HBM chunk rotation) --------
# 5000-frame chunks (5 GB) + prefetch keep peak cache residency 10 GB of the
# 16 GB HBM; rotate every 2 epochs -> full 20k coverage each 8 epochs.
# Supervised + stall-watchdog: tunnel wedges/preemptions self-heal.
# --save-epochs 10: the first lost attempt died at epoch 12 with nothing
# saved because the first snapshot was scheduled at epoch 20.
# bench.py quiesces a live trainer at round end (STOP sentinel) and drops
# /tmp/bigrun_skip_endgame so neither a restarted trainer nor the endgame
# eval chain contends with the benchmark for the chip.
if [ -f /tmp/bigrun_skip_endgame ]; then
  # bench.py removes the sentinel when it finishes; one older than ~1 h
  # means the bench died mid-run — treat it as stale (ADVICE r2: the
  # sentinel used to persist forever and block every later session)
  if [ -n "$(find /tmp/bigrun_skip_endgame -mmin +60 2>/dev/null)" ]; then
    echo "[bigrun $(stamp)] stale skip_endgame sentinel (>1h old); clearing"
    rm -f /tmp/bigrun_skip_endgame
  else
    echo "[bigrun $(stamp)] /tmp/bigrun_skip_endgame present (bench owns the chip); exiting"
    snap_ckpt
    exit 0
  fi
fi
echo "[bigrun $(stamp)] training: $EPOCHS epochs x 5000-frame chunks"
python -m pyrapose_tpu.cli.main train linemod "$SET" \
  --batch-size 16 --epochs "$EPOCHS" --lr 3e-4 \
  --warmup-epochs 8 --cosine-decay --head-l2 0 \
  --no-freeze-stem --train-bn \
  --device-cache --device-cache-frames 5000 --device-cache-rotate 2 \
  --device-cache-prefetch \
  --snapshot-path "$RUN" --auto-resume --save-epochs 10 \
  --keep-checkpoints 4 \
  --eval-every 10 --eval-samples 64 --val-set-name valmid \
  --stall-timeout 1200 --supervise 60 \
  >> "$EVIDENCE/train.log" 2>&1 &
TRAINER=$!
echo $TRAINER > /tmp/bigrun.pid
echo "$RUN" > /tmp/bigrun.run  # bench.py quiesce: where the STOP sentinel goes
echo "[bigrun $(stamp)] trainer pid $TRAINER"

wait "$TRAINER"; RC=$?
cp -f "$RUN/metrics.jsonl" "$EVIDENCE/metrics.jsonl" 2>/dev/null
echo "[bigrun $(stamp)] trainer exited rc=$RC"
snap_ckpt
gcommit "bigrun: training finished (rc=$RC), final evidence" "$EVIDENCE"

# --- 3. evaluation chain ------------------------------------------------------
if [ -f /tmp/bigrun_skip_endgame ]; then
  echo "[bigrun $(stamp)] bench quiesced the trainer; skipping endgame (next session reruns it)"
  exit 0
fi
OUT="$EVIDENCE/endgame" DATA="$SET" RUN="$RUN" tools/endgame.sh "$TRAINER"
gcommit "bigrun: endgame evaluation reports" "$EVIDENCE"
echo "[bigrun $(stamp)] all done"
