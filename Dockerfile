# pyrapose_tpu deployment container (TPU VM).
#
# Capability match of the reference's Dockerfile:1-56 (TF2.1-gpu base +
# pinned pip deps + package install), re-targeted at Cloud TPU: the jax[tpu]
# extra pulls the matching libtpu release, and the container is expected to
# run on a TPU VM with /dev/accel* passed through (--privileged or
# --device=/dev/accel0 ...).
#
# Build:  docker build -t pyrapose-tpu .
# Run:    docker run --privileged --net=host \
#             -v /data/linemod:/data/linemod pyrapose-tpu \
#             pyrapose evaluate linemod /data/linemod /ckpt/step_00000000
FROM python:3.11-slim

RUN apt-get update && apt-get install -y --no-install-recommends \
        build-essential \
    && rm -rf /var/lib/apt/lists/*

# TPU runtime: jax + libtpu from the official release index. Keep this pin in
# sync with scripts/setup_tpu_vm.sh.
RUN pip install --no-cache-dir "jax[tpu]>=0.4.30" \
        -f https://storage.googleapis.com/jax-releases/libtpu_releases.html

WORKDIR /opt/pyrapose_tpu
COPY pyproject.toml README.md ./
COPY pyrapose_tpu ./pyrapose_tpu
COPY cpp ./cpp
RUN pip install --no-cache-dir . \
    && make -C cpp \
    && python -c "import pyrapose_tpu"

# Persistent XLA compile cache across container restarts (mount a volume at
# /root/.cache/pyrapose_tpu to keep it warm).
ENV PYRAPOSE_COMPILE_CACHE=/root/.cache/pyrapose_tpu/xla

ENTRYPOINT []
CMD ["pyrapose", "--help"]
