"""Test configuration: force an 8-device virtual CPU mesh.

Multi-device sharding tests run on the host platform with
--xla_force_host_platform_device_count=8, per the multi-chip test strategy
(SURVEY.md section 4): TPU hardware in CI is a single chip, so mesh semantics
are validated on virtual CPU devices.

Note: this environment's sitecustomize pre-imports jax and registers a remote
TPU backend, so env vars alone are too late — the platform is redirected via
jax.config after import (the CPU backend itself has not initialized yet, so
XLA_FLAGS still applies).
"""

import os

# --xla_cpu_multi_thread_eigen=false: on core-constrained machines (this
# sandbox exposes a single CPU), 8 virtual devices each spinning up
# multi-threaded Eigen pools starve XLA's collective rendezvous — device
# threads miss the all-reduce join deadline and the runtime SIGABRTs.
# Single-threaded Eigen keeps the 8 device threads schedulable, and the
# raised collective-call rendezvous deadlines absorb whole compile/execute
# latencies of staggered device threads (the root-cause fix for the
# historical SIGABRT flake; see __graft_entry__._CPU_MESH_XLA_FLAGS).
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=8"
    + " --xla_cpu_multi_thread_eigen=false"
    + " --xla_cpu_collective_call_warn_stuck_timeout_seconds=600"
    + " --xla_cpu_collective_call_terminate_timeout_seconds=3600"
    + " --xla_cpu_collective_timeout_seconds=3600"
).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Persistent compile cache makes warm test runs much faster. The directory
# is keyed by host CPU features: XLA:CPU AOT entries written by a host with
# different features abort (or noisily fail) on load.
import sys  # noqa: E402

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import __graft_entry__  # noqa: E402

jax.config.update("jax_compilation_cache_dir", __graft_entry__._cpu_cache_dir())
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
