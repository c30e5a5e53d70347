"""Stall watchdog + supervisor: wedged-device detection and self-healing.

Motivated by a real failure: on a remote-attached TPU the transport wedged
mid-run — every thread asleep, zero CPU, no exception ever raised — and the
only cure is process death + restart from the newest checkpoint. The
reference has no analogue (keras jobs just die, SURVEY §5 failure-recovery
row); this is the TPU-native extension.
"""

from __future__ import annotations

import time

from pyrapose_tpu.cli.main import _child_command, build_parser
from pyrapose_tpu.watchdog import EXIT_STALLED, StallWatchdog


class TestStallWatchdog:
    def test_fires_without_beats(self):
        fired = []
        wd = StallWatchdog(0.2, on_stall=lambda: fired.append(1))
        wd.start()
        deadline = time.monotonic() + 5
        while not fired and time.monotonic() < deadline:
            time.sleep(0.05)
        wd.stop()
        assert fired and wd.fired

    def test_beats_keep_it_alive(self):
        fired = []
        wd = StallWatchdog(0.4, on_stall=lambda: fired.append(1))
        wd.start()
        for _ in range(8):
            time.sleep(0.1)
            wd.beat()
        wd.stop()
        assert not fired and not wd.fired

    def test_disabled_when_timeout_zero(self):
        wd = StallWatchdog(0, on_stall=lambda: (_ for _ in ()).throw(AssertionError))
        wd.start()
        assert wd._thread is None  # no thread armed
        wd.beat()
        wd.stop()

    def test_stop_is_idempotent_and_default_exit_code(self):
        wd = StallWatchdog(10)
        wd.start()
        wd.stop()
        wd.stop()
        assert EXIT_STALLED == 17


class TestSupervisor:
    def test_child_command_strips_supervise_forces_auto_resume(self):
        argv = [
            "train", "linemod", "/data", "--supervise", "3",
            "--stall-timeout", "600", "--batch-size", "16",
        ]
        child = _child_command(argv)
        assert "--supervise" not in child and "3" not in child[-6:]
        assert child[-1] == "--auto-resume"
        assert "--stall-timeout" in child and "600" in child
        # module re-exec form, unbuffered
        assert child[1:4] == ["-u", "-m", "pyrapose_tpu.cli.main"]

    def test_child_command_keeps_existing_auto_resume(self):
        argv = ["train", "synthetic", "--supervise=2", "--auto-resume"]
        child = _child_command(argv)
        assert child.count("--auto-resume") == 1
        assert all(not a.startswith("--supervise") for a in child)

    def test_parser_accepts_flags(self):
        args = build_parser().parse_args(
            ["train", "synthetic", "--supervise", "2",
             "--stall-timeout", "120.5"]
        )
        assert args.supervise == 2
        assert args.stall_timeout == 120.5


class TestMidEpochBeats:
    def test_train_loop_beats_inside_the_epoch(self, tmp_path, monkeypatch):
        """The watchdog must see liveness at STEP granularity, not epoch
        granularity: a healthy epoch stretched past the timeout by host
        contention once killed a real run at the epoch-end loss fetch
        (rc=17 mid-training, restart lost 4 epochs). The loop now syncs on
        a lagged step loss every _BEAT_EVERY dispatches and beats."""
        import pyrapose_tpu.watchdog as wd_mod
        from pyrapose_tpu.cli import train as cli_train
        from pyrapose_tpu.cli.main import build_parser

        beats: list[int] = []

        class RecordingWatchdog(wd_mod.StallWatchdog):
            def beat(self):
                beats.append(1)
                super().beat()

        monkeypatch.setattr(wd_mod, "StallWatchdog", RecordingWatchdog)
        monkeypatch.setattr(cli_train, "_BEAT_EVERY", 2)
        args = build_parser().parse_args(
            [
                "train", "synthetic",
                "--backbone", "resnet10",
                "--batch-size", "2",
                "--epochs", "1",
                "--steps-per-epoch", "5",
                "--image-min-side", "64",
                "--image-max-side", "64",
                "--snapshot-path", str(tmp_path / "snap"),
                "--workers", "1",
            ]
        )
        assert cli_train.run_train(args) == 0
        # mid-epoch beats at it=2,4 (+ the epoch-end fetch beat + the final
        # save); epoch-granularity would give only the post-loop beats
        assert len(beats) >= 3


class TestRssRestart:
    """--rss-restart-gb: voluntary checkpoint+exit(18) before the host
    OOM-kills a leaking remote-TPU transport client (every host->device
    transfer's bytes stay resident forever, so chunk-rotating
    --device-cache runs grow without bound)."""

    def test_exit_code_and_rss_readable(self):
        from pyrapose_tpu.watchdog import EXIT_RESTART, host_rss_gb

        assert EXIT_RESTART == 18
        rss = host_rss_gb()
        assert rss > 0.001  # a live CPython process is at least a few MB

    def test_supervisor_relaunches_on_restart_without_burning_retries(
        self, tmp_path, capfd
    ):
        """Two voluntary rc=18 exits then a clean exit — with retries=0 the
        pre-r2 behavior would give up on the first rc=18. Runs real child
        processes through pyrapose_tpu.supervise (the Popen-based r4
        supervisor; the old subprocess.call monkeypatch no longer
        intercepts anything)."""
        import sys

        from pyrapose_tpu.supervise import run_supervised

        counter = tmp_path / "n"
        code = (
            "import os, sys\n"
            f"p = {str(counter)!r}\n"
            "n = int(open(p).read()) if os.path.exists(p) else 0\n"
            "open(p, 'w').write(str(n + 1))\n"
            "sys.exit(18 if n < 2 else 0)\n"
        )
        rc = run_supervised([sys.executable, "-c", code], retries=0)
        assert rc == 0
        assert int(counter.read_text()) == 3  # two relaunches happened
        assert "requested restart" in capfd.readouterr().out

    def test_train_loop_saves_and_exits_18_when_over_limit(self, tmp_path):
        """A multi-epoch synthetic run with an impossibly small limit must
        checkpoint and return EXIT_RESTART after the first epoch instead of
        finishing (the supervisor would then relaunch with --auto-resume)."""
        from pyrapose_tpu.cli import train as cli_train
        from pyrapose_tpu.cli.main import build_parser
        from pyrapose_tpu.train.checkpoint import latest_checkpoint
        from pyrapose_tpu.watchdog import EXIT_RESTART

        snap = tmp_path / "snap"
        args = build_parser().parse_args(
            [
                "train", "synthetic",
                "--backbone", "resnet10",
                "--batch-size", "2",
                "--epochs", "3",
                "--steps-per-epoch", "2",
                "--image-min-side", "64",
                "--image-max-side", "64",
                "--snapshot-path", str(snap),
                "--workers", "1",
                "--save-epochs", "10",  # would NOT save at epoch 1 on its own
                "--rss-restart-gb", "0.001",
            ]
        )
        assert cli_train.run_train(args) == EXIT_RESTART
        assert latest_checkpoint(str(snap)) is not None

    def test_threshold_file_overrides_flag(self, tmp_path):
        """{snapshot-path}/RSS_RESTART_GB re-arms/disarms a LIVE run: a
        huge file value must override a tiny flag and let the run finish."""
        from pyrapose_tpu.cli import train as cli_train
        from pyrapose_tpu.cli.main import build_parser

        snap = tmp_path / "snap"
        snap.mkdir()
        (snap / "RSS_RESTART_GB").write_text("10000\n")
        args = build_parser().parse_args(
            [
                "train", "synthetic",
                "--backbone", "resnet10",
                "--batch-size", "2",
                "--epochs", "2",
                "--steps-per-epoch", "2",
                "--image-min-side", "64",
                "--image-max-side", "64",
                "--snapshot-path", str(snap),
                "--workers", "1",
                "--rss-restart-gb", "0.001",
            ]
        )
        assert cli_train.run_train(args) == 0


class TestImportGraph:
    def test_watchdog_import_pulls_no_train_stack(self):
        """The init watchdog (cli/main.py) arms BEFORE the train-stack
        import precisely because that import initializes the TPU backend
        (and hangs when the attach is wedged). pyrapose_tpu.watchdog must
        therefore never pull the train stack itself — a regression here
        silently re-opens the uncovered-hang window."""
        import subprocess
        import sys

        code = (
            "import sys\n"
            "import pyrapose_tpu.watchdog\n"
            "bad = [m for m in sys.modules\n"
            "       if m in ('flax', 'optax', 'pyrapose_tpu.train.step',\n"
            "                'pyrapose_tpu.models')]\n"
            "raise SystemExit(1 if bad else 0)\n"
        )
        proc = subprocess.run(
            [sys.executable, "-c", code],
            env={**__import__('os').environ, "JAX_PLATFORMS": "cpu"},
        )
        assert proc.returncode == 0
