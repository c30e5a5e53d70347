#!/usr/bin/env bash
# Provision pyrapose_tpu on a fresh Cloud TPU VM (v5e/v6e images).
#
# The container-free sibling of the Dockerfile (reference startCont_0.sh
# launches the docker image with dataset mounts; on TPU VMs running directly
# on the host VM is the common deployment). Usage:
#
#   gcloud compute tpus tpu-vm ssh $NAME --command "$(cat setup_tpu_vm.sh)"
# or on the VM:
#   bash scripts/setup_tpu_vm.sh [repo_dir]
set -euo pipefail

REPO_DIR="${1:-$(cd "$(dirname "$0")/.." && pwd)}"

python3 -m pip install --upgrade pip

# jax + the matching libtpu release (keep in sync with the Dockerfile pin)
python3 -m pip install "jax[tpu]>=0.4.30" \
    -f https://storage.googleapis.com/jax-releases/libtpu_releases.html

python3 -m pip install "$REPO_DIR"

# C++ parity kernels (tests only; skipped if no toolchain)
if command -v g++ >/dev/null; then
    make -C "$REPO_DIR/cpp"
fi

# persistent XLA compile cache (first full-model compile is minutes; repeat
# CLI invocations then start in seconds)
mkdir -p "$HOME/.cache/pyrapose_tpu/xla"

python3 - <<'EOF'
import jax
print("devices:", jax.devices())
EOF

echo "pyrapose_tpu ready: try 'pyrapose --help'"
