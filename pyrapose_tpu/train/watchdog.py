"""Compatibility re-export. The implementation lives at
pyrapose_tpu.watchdog: the supervisor arms it BEFORE the train stack
imports (pyrapose_tpu.train.__init__ pulls in jax-heavy modules whose
import initializes the TPU backend — exactly the phase the watchdog must
cover, so its own import has to stay backend-free)."""

from pyrapose_tpu.watchdog import EXIT_STALLED, StallWatchdog

__all__ = ["EXIT_STALLED", "StallWatchdog"]
