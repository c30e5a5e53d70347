"""Honest supervision for unattended single-process train runs.

The round-3 post-mortem (VERDICT r3 weak #2 / next-round #3) found three
lies of omission in the old ``subprocess.call`` supervisor:

- a child crash left no visible trace at the restart point — the
  traceback scrolled away mid-log and the relaunch line said only
  ``rc=1``;
- an identical crash repeated every restart burned the whole retry
  budget (potentially 60 relaunches of a deterministically-broken tree);
- auto-resume silently fell back to a much older checkpoint (step 0 in
  r3final2, discarding 9 epochs) with nothing in the log flagging it.

This module fixes all three while keeping the child's output streaming to
the parent log: the child's stdout+stderr are pumped line-by-line (echoed
verbatim), a rolling tail is kept, and the pump extracts the few
structured facts the trainer prints (epoch completions, checkpoint saves,
the resume line). On a crash the supervisor prints the tail with a loud
banner and a one-line *crash signature* (the last traceback frame +
exception line); three consecutive identical signatures halt the run
regardless of the retry budget — restarting cannot fix a deterministic
crash. On resume, a restart that discards completed epochs is called out
with the exact count.

Reference anchor: the reference has no supervisor at all (bin/train.py
runs once); this subsystem is the tpu-side answer to preemptible
remote-attached devices.
"""

from __future__ import annotations

import collections
import re
import subprocess
import time

from pyrapose_tpu.watchdog import EXIT_RESTART

# trainer prints parsed by the pump (cli/train.py)
_EPOCH_RE = re.compile(r"^epoch (\d+)/(\d+): loss ")
_SAVE_RE = re.compile(r"saved .*step_(\d+)")
_RESUME_RE = re.compile(r"^resumed from .* at step (\d+)$")
_EXC_RE = re.compile(
    r"^(?:[A-Za-z_][\w.]*(?:Error|Exception|Interrupt|Exit)\b.*"
    r"|Traceback \(most recent call last\):)"
)

TAIL_LINES = 40
IDENTICAL_CRASH_HALT = 3


def crash_signature(tail: list[str]) -> str:
    """One line identifying a crash: the exception line plus the deepest
    ``File ...`` frame before it (so two different AttributeErrors don't
    collide). Falls back to the last non-empty line for non-Python deaths
    (SIGKILL tails, C++ aborts)."""
    exc_idx = None
    for i in range(len(tail) - 1, -1, -1):
        line = tail[i].strip()
        if line and _EXC_RE.match(line) and not line.startswith("Traceback"):
            exc_idx = i
            break
    if exc_idx is None:
        for line in reversed(tail):
            if line.strip():
                return line.strip()[:200]
        return "<no output>"
    frame = ""
    for i in range(exc_idx - 1, -1, -1):
        if tail[i].lstrip().startswith("File "):
            frame = tail[i].strip() + " :: "
            break
    return (frame + tail[exc_idx].strip())[:200]


class ChildMonitor:
    """Per-run progress facts extracted from the child's output stream.

    Pure and side-effect-free apart from returned warning strings, so the
    halt/rollback logic is unit-testable without subprocesses
    (tests/test_supervise.py).
    """

    def __init__(self) -> None:
        self.tail: collections.deque[str] = collections.deque(
            maxlen=TAIL_LINES
        )
        self.max_epoch = 0  # newest epoch ANY incarnation completed
        self.max_saved_step = -1  # newest checkpoint step seen saved
        # epochs the CURRENT incarnation completed after its last save —
        # exactly the work a restart discards (auto-resume restores the
        # newest checkpoint, which postdates every earlier epoch)
        self._epochs_since_save = 0

    def feed(self, line: str) -> str | None:
        """Consume one child output line; return a warning to print loudly,
        or None."""
        self.tail.append(line.rstrip("\n"))
        m = _EPOCH_RE.match(line)
        if m:
            self.max_epoch = max(self.max_epoch, int(m.group(1)))
            self._epochs_since_save += 1
            return None
        m = _SAVE_RE.search(line)
        if m:
            self.max_saved_step = max(self.max_saved_step, int(m.group(1)))
            self._epochs_since_save = 0
            return None
        m = _RESUME_RE.match(line.strip())
        if m and self.max_saved_step >= 0:
            step = int(m.group(1))
            if step < self.max_saved_step:
                return (
                    f"supervise: WARNING — auto-resume restored step {step} "
                    f"but a NEWER checkpoint (step {self.max_saved_step}) "
                    "was saved earlier in this run; checkpoint discovery "
                    "went backwards (pruned/raced rotation?)"
                )
        return None

    def on_restart(self) -> str | None:
        """Called when a new incarnation launches; warns if the previous one
        had completed epochs beyond the newest checkpoint it saved (exactly
        the silent 9-epoch loss of r3final2)."""
        lost = self._epochs_since_save
        self._epochs_since_save = 0
        if lost > 1:
            return (
                f"supervise: WARNING — restarting will discard ~{lost} "
                f"completed epochs (last incarnation reached epoch "
                f"{self.max_epoch}; newest saved step "
                f"{max(self.max_saved_step, 0)}). If this repeats, lower "
                "--save-epochs."
            )
        return None


def summarize_exit(rc: int, restarts: int, crashes: int) -> str:
    """The truthful end-of-run line (VERDICT r3 next-round #3: a crashed
    run must not be summarized as 'finished (rc=0)')."""
    if rc == 0 and crashes == 0 and restarts == 0:
        return "supervise: run finished clean (rc=0, no restarts)"
    if rc == 0:
        return (
            f"supervise: run finished rc=0 AFTER {crashes} crash(es) and "
            f"{restarts} restart(s) — inspect the log before trusting "
            "end-to-end metrics"
        )
    return (
        f"supervise: run FAILED rc={rc} after {crashes} crash(es) and "
        f"{restarts} restart(s)"
    )


def run_supervised(
    child_cmd: list[str], retries: int, sleep_fn=time.sleep
) -> int:
    """Run ``child_cmd`` with restart-on-crash, streaming its output.

    Restart policy: rc==EXIT_RESTART(18) relaunches immediately and
    unboundedly (voluntary, checkpoint saved); other nonzero rcs consume
    the ``retries`` budget with linear backoff; IDENTICAL_CRASH_HALT
    consecutive identical crash signatures halt regardless of budget.
    ``sleep_fn`` is injectable for tests.
    """
    mon = ChildMonitor()
    attempt = 0
    crashes = 0
    restarts = 0
    last_sig: str | None = None
    same_sig = 0
    while True:
        proc = subprocess.Popen(
            child_cmd,
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
            bufsize=1,
        )
        assert proc.stdout is not None
        for line in proc.stdout:
            print(line, end="", flush=True)
            warn = mon.feed(line)
            if warn:
                print(f"\n!!! {warn}\n", flush=True)
        rc = proc.wait()
        if rc == 0:
            print(summarize_exit(0, restarts, crashes), flush=True)
            return 0
        if rc == EXIT_RESTART:
            print(
                "supervise: child requested restart (rc=18, checkpoint "
                "saved); relaunching immediately",
                flush=True,
            )
            restarts += 1
            warn = mon.on_restart()
            if warn:
                print(f"!!! {warn}", flush=True)
            continue
        crashes += 1
        sig = crash_signature(list(mon.tail))
        banner = "=" * 72
        print(
            f"\n{banner}\nsupervise: child CRASHED rc={rc}\n"
            f"crash signature: {sig}\nlast output:",
            flush=True,
        )
        for t in list(mon.tail)[-15:]:
            print(f"  | {t}")
        print(banner, flush=True)
        if sig == last_sig:
            same_sig += 1
        else:
            last_sig, same_sig = sig, 1
        if same_sig >= IDENTICAL_CRASH_HALT:
            print(
                f"supervise: HALT — {same_sig} consecutive identical "
                "crashes; restarting cannot fix a deterministic failure. "
                f"Fix the tree and relaunch.\n"
                f"{summarize_exit(rc, restarts, crashes)}",
                flush=True,
            )
            return rc
        attempt += 1
        if attempt > retries:
            print(
                f"supervise: giving up after {retries} restarts (rc={rc})\n"
                f"{summarize_exit(rc, restarts, crashes)}",
                flush=True,
            )
            return rc
        restarts += 1
        warn = mon.on_restart()
        if warn:
            print(f"!!! {warn}", flush=True)
        print(
            f"supervise: child exited rc={rc}; restart "
            f"{attempt}/{retries} (auto-resume from newest checkpoint)",
            flush=True,
        )
        sleep_fn(min(5.0 * attempt, 60.0))
