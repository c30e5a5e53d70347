"""Stall watchdog: detect a wedged device/transport and fail fast.

Remote-attached TPUs (and, on pods, flaky hosts) can wedge mid-run: every
thread ends up asleep waiting on a transfer that will never complete. The
reference has no equivalent (its failure story is "the job dies and keras
restarts from the last .h5", SURVEY §5); here a run that stops making
progress is actively detected and turned INTO a clean death, so the
`--supervise` / `--auto-resume` restart loop can heal it.

Mechanism: the train loop calls `beat()` at every host-visible sync point
(epoch-end loss fetch, checkpoint save, eval). A daemon thread checks the
time since the last beat; past the deadline it dumps every thread's stack
(faulthandler) to stderr and calls the `on_stall` action — by default
`os._exit(EXIT_STALLED)`, because a wedged XLA transfer cannot be
interrupted from Python (no exception ever surfaces; only process death
releases the device).

JAX dispatch is async: a step that merely *enqueues* work returns instantly
even when the device is wedged, so beating on dispatch would mask the hang.
Beat only where the host actually blocks on device results.
"""

from __future__ import annotations

import faulthandler
import os
import sys
import threading
import time

EXIT_STALLED = 17
"""Distinctive exit code for "watchdog killed a wedged run" (supervisors
restart on any nonzero exit; the code makes the cause greppable)."""

EXIT_RESTART = 18
"""Voluntary self-restart: the run saved a checkpoint and asked its
supervisor to relaunch it (e.g. --rss-restart-gb, which works around a
host-memory leak in remote-TPU transport clients: every host->device
transfer's bytes stay resident in the client forever, so a training run
that restages multi-GB dataset chunks grows ~chunk-size of anon RSS per
rotation until the kernel OOM-kills it mid-epoch. A voluntary restart at
a safe threshold loses nothing: checkpoint + exit + --auto-resume)."""


def host_rss_gb() -> float:
    """This process's resident set size in GB (0.0 if unreadable —
    /proc is Linux-only and the check must never kill a healthy run)."""
    try:
        with open("/proc/self/status") as f:
            for line in f:
                if line.startswith("VmRSS"):
                    return int(line.split()[1]) / 1e6
    except OSError:
        pass
    return 0.0


def _default_on_stall() -> None:
    # os._exit, not sys.exit: the main thread is blocked inside an XLA
    # transfer and will never unwind; raising in this daemon thread would
    # change nothing.
    os._exit(EXIT_STALLED)


class StallWatchdog:
    """Arms a deadline on host-visible progress; fires `on_stall` past it.

    timeout_s <= 0 disables (no thread is started). The check period is
    timeout_s / 4, so a stall is detected within ~1.25x the timeout.
    """

    def __init__(self, timeout_s: float, on_stall=None, label: str = "train"):
        self.timeout_s = float(timeout_s)
        self._on_stall = on_stall or _default_on_stall
        self._label = label
        self._last = time.monotonic()
        self._stop = threading.Event()
        self._thread: threading.Thread | None = None
        self.fired = False

    def beat(self) -> None:
        self._last = time.monotonic()

    def start(self) -> "StallWatchdog":
        if self.timeout_s > 0 and self._thread is None:
            self._thread = threading.Thread(
                target=self._run, name="stall-watchdog", daemon=True
            )
            self._thread.start()
        return self

    def stop(self) -> None:
        self._stop.set()
        if self._thread is not None:
            self._thread.join(timeout=5)
            self._thread = None

    # -- context manager sugar ------------------------------------------------
    def __enter__(self) -> "StallWatchdog":
        return self.start()

    def __exit__(self, *exc) -> None:
        self.stop()

    def _run(self) -> None:
        period = max(self.timeout_s / 4.0, 0.05)
        while not self._stop.wait(period):
            idle = time.monotonic() - self._last
            if idle > self.timeout_s:
                self.fired = True
                print(
                    f"STALL: {self._label} made no host-visible progress for "
                    f"{idle:.0f}s (timeout {self.timeout_s:.0f}s); dumping "
                    "stacks and exiting so --auto-resume can restart",
                    file=sys.stderr,
                    flush=True,
                )
                try:
                    faulthandler.dump_traceback(file=sys.stderr, all_threads=True)
                except Exception:
                    pass
                self._on_stall()
                return
