"""Supervisor crash honesty (pyrapose_tpu/supervise.py).

Round-3 VERDICT next-round #3: the old supervisor buried the child's
traceback mid-log, burned the whole retry budget on deterministic
crashes, and silently discarded 9 epochs via a step-0 auto-resume. These
tests pin the new policy: crash signatures, the identical-crash halt,
multi-epoch rollback warnings, and the truthful end-of-run summary —
plus one subprocess integration test of run_supervised on a child that
crashes identically every time.
"""

import subprocess
import sys

from pyrapose_tpu.supervise import (
    IDENTICAL_CRASH_HALT,
    ChildMonitor,
    crash_signature,
    run_supervised,
    summarize_exit,
)

TRACEBACK = [
    "Traceback (most recent call last):",
    '  File "/repo/pyrapose_tpu/inference.py", line 207, in infer',
    "    px = ransac.fallback_inlier_px",
    "AttributeError: 'RansacConfig' object has no attribute "
    "'fallback_inlier_px'",
]


class TestCrashSignature:
    def test_exception_line_plus_frame(self):
        sig = crash_signature(TRACEBACK)
        assert "AttributeError" in sig
        assert "inference.py" in sig  # the deepest frame disambiguates

    def test_different_frames_different_signatures(self):
        other = list(TRACEBACK)
        other[1] = '  File "/repo/pyrapose_tpu/pose/ransac.py", line 9, in f'
        assert crash_signature(TRACEBACK) != crash_signature(other)

    def test_non_python_death_falls_back_to_last_line(self):
        tail = ["epoch 3/100: loss 1.9 lr 2.0e-04 140.0 img/s", "Killed"]
        assert crash_signature(tail) == "Killed"

    def test_empty_tail(self):
        assert crash_signature([]) == "<no output>"

    def test_ignores_log_noise_after_exception(self):
        tail = TRACEBACK + ["", "some atexit cleanup line"]
        assert "AttributeError" in crash_signature(tail)


class TestChildMonitor:
    def test_rollback_warning_after_unsaved_epochs(self):
        """The r3final2 failure: 9 epochs completed, crash, restart —
        the supervisor must say what the restart discards."""
        mon = ChildMonitor()
        mon.feed("saved /run/step_00000000\n")
        for e in range(1, 10):
            mon.feed(f"epoch {e}/160: loss 1.9 lr 2.0e-04 140.0 img/s\n")
        warn = mon.on_restart()
        assert warn is not None and "discard ~9" in warn

    def test_no_warning_when_epoch_banked(self):
        mon = ChildMonitor()
        mon.feed("epoch 1/160: loss 1.9 lr 2.0e-04 140.0 img/s\n")
        mon.feed("saved /run/step_00000312\n")
        assert mon.on_restart() is None

    def test_single_unsaved_epoch_tolerated(self):
        mon = ChildMonitor()
        mon.feed("saved /run/step_00000312\n")
        mon.feed("epoch 2/160: loss 1.8 lr 2.0e-04 140.0 img/s\n")
        assert mon.on_restart() is None  # <=1 epoch is normal cadence loss

    def test_backwards_resume_flagged(self):
        """Auto-resume restoring an OLDER step than a save we already saw
        is checkpoint-discovery corruption and must warn immediately."""
        mon = ChildMonitor()
        mon.feed("saved /run/step_00002808\n")
        warn = mon.feed("resumed from /run/step_00000000 at step 0\n")
        assert warn is not None and "backwards" in warn

    def test_forward_resume_silent(self):
        mon = ChildMonitor()
        mon.feed("saved /run/step_00000312\n")
        assert mon.feed("resumed from /run/step_00000312 at step 312\n") is None

    def test_restart_counter_resets_per_incarnation(self):
        mon = ChildMonitor()
        for e in range(1, 5):
            mon.feed(f"epoch {e}/160: loss 1.9 lr 2.0e-04 140.0 img/s\n")
        assert mon.on_restart() is not None
        # fresh incarnation starts with a clean unsaved-epoch counter
        assert mon.on_restart() is None


class TestSummarizeExit:
    def test_clean(self):
        assert "clean" in summarize_exit(0, 0, 0)

    def test_rc0_after_crashes_not_reported_clean(self):
        s = summarize_exit(0, 2, 1)
        assert "clean" not in s and "1 crash" in s

    def test_failed(self):
        s = summarize_exit(1, 0, 3)
        assert "FAILED" in s and "rc=1" in s


class TestRunSupervised:
    def test_identical_crash_halts_before_budget(self, capfd):
        """A deterministically-crashing child must halt after
        IDENTICAL_CRASH_HALT attempts, not burn a 60-restart budget."""
        child = [
            sys.executable, "-c",
            "raise AttributeError('no attribute fallback_inlier_px')",
        ]
        rc = run_supervised(child, retries=60, sleep_fn=lambda s: None)
        out, _ = capfd.readouterr()
        assert rc != 0
        assert out.count("child CRASHED") == IDENTICAL_CRASH_HALT
        assert "HALT" in out
        assert "crash signature:" in out and "AttributeError" in out

    def test_clean_child_single_run(self, capfd):
        rc = run_supervised(
            [sys.executable, "-c", "print('epoch 1/1: loss 1.0 lr 1e-4 1.0 img/s')"],
            retries=3,
        )
        out, _ = capfd.readouterr()
        assert rc == 0
        assert "finished clean" in out

    def test_tail_printed_on_crash(self, capfd):
        child = [
            sys.executable, "-c",
            "print('epoch 1/2: loss 1.0 lr 1e-4 1.0 img/s');"
            "raise RuntimeError('boom')",
        ]
        run_supervised(child, retries=0)
        out, _ = capfd.readouterr()
        assert "last output:" in out
        assert "| epoch 1/2" in out  # the tail includes pre-crash context


def test_child_crash_integration_with_monitor(capfd):
    """One subprocess crash end-to-end: signature extracted from the real
    interleaved stdout/stderr stream."""
    code = (
        "import sys\n"
        "print('saved /run/step_00000000')\n"
        "for e in range(1, 4):\n"
        "    print(f'epoch {e}/10: loss 1.9 lr 2e-4 99.0 img/s')\n"
        "sys.stdout.flush()\n"
        "raise ValueError('deterministic')\n"
    )
    rc = run_supervised([sys.executable, "-u", "-c", code], retries=0)
    out, _ = capfd.readouterr()
    assert rc == 1
    assert "ValueError: deterministic" in out
    assert "FAILED" in out
