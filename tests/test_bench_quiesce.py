"""bench.py trainer-quiesce guard.

At round end the driver runs bench.py on the real chip while a bigrun
training may still hold most of its HBM. `bench._quiesce_trainer` must ask
the trainer to stop (STOP sentinel, consumed by cli/train.py's stop_file
poll) and wait for its pid to die, and must no-op on CPU so test runs never
touch a live trainer. Tested against a real short-lived subprocess standing
in for the trainer.
"""

import os
import subprocess
import sys
import time

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


@pytest.fixture
def fake_trainer(tmp_path, monkeypatch):
    """A subprocess that exits as soon as STOP appears in its run dir."""
    run_dir = tmp_path / "run"
    run_dir.mkdir()
    proc = subprocess.Popen(
        [
            sys.executable,
            "-c",
            "import os,sys,time\n"
            f"stop = os.path.join({str(run_dir)!r}, 'STOP')\n"
            "for _ in range(600):\n"
            "    if os.path.exists(stop): sys.exit(0)\n"
            "    time.sleep(0.05)\n",
        ]
    )
    pid_file = tmp_path / "bigrun.pid"
    pid_file.write_text(str(proc.pid))
    monkeypatch.setenv("BENCH_TRAINER_PID_FILE", str(pid_file))
    monkeypatch.setenv("BENCH_TRAINER_RUN", str(run_dir))
    monkeypatch.setenv(
        "BENCH_SKIP_ENDGAME_FILE", str(tmp_path / "skip_endgame")
    )
    yield proc, run_dir
    if proc.poll() is None:
        proc.kill()
    proc.wait()


def test_quiesce_noops_on_cpu(fake_trainer, monkeypatch):
    import bench

    proc, run_dir = fake_trainer
    monkeypatch.setattr(bench.jax, "default_backend", lambda: "cpu")
    bench._quiesce_trainer()
    assert proc.poll() is None  # untouched
    assert not (run_dir / "STOP").exists()


def test_quiesce_stops_live_trainer(fake_trainer, monkeypatch):
    import bench

    proc, run_dir = fake_trainer
    monkeypatch.setattr(bench.jax, "default_backend", lambda: "tpu")
    real_sleep = time.sleep
    monkeypatch.setattr(
        bench.time, "sleep", lambda s: real_sleep(min(s, 0.1))
    )
    bench._quiesce_trainer()
    assert (run_dir / "STOP").exists()
    assert proc.poll() == 0  # exited via the sentinel before bench proceeded


def test_quiesce_ignores_dead_pid(tmp_path, monkeypatch):
    import bench

    pid_file = tmp_path / "bigrun.pid"
    pid_file.write_text("999999999")
    monkeypatch.setenv("BENCH_TRAINER_PID_FILE", str(pid_file))
    monkeypatch.setenv("BENCH_TRAINER_RUN", str(tmp_path))
    monkeypatch.setattr(bench.jax, "default_backend", lambda: "tpu")
    bench._quiesce_trainer()
    assert not (tmp_path / "STOP").exists()
