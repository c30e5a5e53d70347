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
            # the literal 'pyrapose' below lands in /proc/<pid>/cmdline so
            # bench._pid_is_trainer accepts this stand-in as a real trainer
            "import os,sys,time  # pyrapose_tpu trainer stand-in\n"
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


def test_quiesce_stops_live_trainer(fake_trainer, monkeypatch, capsys):
    import threading

    import bench

    proc, run_dir = fake_trainer
    monkeypatch.setattr(bench.jax, "default_backend", lambda: "tpu")
    real_sleep = time.sleep
    monkeypatch.setattr(
        bench.time, "sleep", lambda s: real_sleep(min(s, 0.1))
    )
    # reap the child concurrently: without this the exited trainer stays a
    # zombie of the pytest process and os.kill(pid, 0) keeps succeeding, so
    # the pid-death branch under test would never fire (ADVICE r2)
    reaper = threading.Thread(target=proc.wait, daemon=True)
    reaper.start()
    bench._quiesce_trainer(max_wait_s=30.0)
    reaper.join(timeout=10)
    assert (run_dir / "STOP").exists()
    assert proc.poll() == 0  # exited via the sentinel before bench proceeded
    # the pid-death detection branch itself must have fired — not the
    # "still alive, benchmarking anyway" fallback
    assert "trainer stopped; chip free" in capsys.readouterr().err


def test_quiesce_skips_recycled_pid(tmp_path, monkeypatch):
    """A stale pid file pointing at a live NON-trainer process must neither
    signal it nor wait on it (ADVICE r2: recycled-pid hazard)."""
    import bench

    bystander = subprocess.Popen(
        [sys.executable, "-c", "import time; time.sleep(60)"]
    )
    try:
        pid_file = tmp_path / "bigrun.pid"
        pid_file.write_text(str(bystander.pid))
        monkeypatch.setenv("BENCH_TRAINER_PID_FILE", str(pid_file))
        monkeypatch.setenv("BENCH_TRAINER_RUN", str(tmp_path))
        monkeypatch.setenv(
            "BENCH_SKIP_ENDGAME_FILE", str(tmp_path / "skip_endgame")
        )
        monkeypatch.setattr(bench.jax, "default_backend", lambda: "tpu")
        bench._quiesce_trainer(max_wait_s=5.0)
        assert not (tmp_path / "STOP").exists()
        assert not (tmp_path / "skip_endgame").exists()
        assert bystander.poll() is None  # untouched
    finally:
        bystander.kill()
        bystander.wait()


def test_run_dir_derived_from_trainer_cmdline(tmp_path, monkeypatch):
    """Without BENCH_TRAINER_RUN, the STOP sentinel must land in the dir the
    trainer actually polls — its own --snapshot-path — not a hardcoded
    default (finalrun trainers use /root/data/final*, not /root/data/bigrun).
    """
    import threading

    import bench

    run_dir = tmp_path / "final2"
    run_dir.mkdir()
    proc = subprocess.Popen(
        [
            sys.executable,
            "-c",
            "import os,sys,time  # pyrapose_tpu trainer stand-in\n"
            "i = sys.argv.index('--snapshot-path')\n"
            "stop = os.path.join(sys.argv[i + 1], 'STOP')\n"
            "for _ in range(600):\n"
            "    if os.path.exists(stop): sys.exit(0)\n"
            "    time.sleep(0.05)\n",
            "--snapshot-path",
            str(run_dir),
        ]
    )
    try:
        pid_file = tmp_path / "bigrun.pid"
        pid_file.write_text(str(proc.pid))
        monkeypatch.setenv("BENCH_TRAINER_PID_FILE", str(pid_file))
        monkeypatch.delenv("BENCH_TRAINER_RUN", raising=False)
        monkeypatch.setenv(
            "BENCH_SKIP_ENDGAME_FILE", str(tmp_path / "skip_endgame")
        )
        monkeypatch.setattr(bench.jax, "default_backend", lambda: "tpu")
        for _ in range(100):  # wait out the fork->exec race before reading
            if bench._trainer_run_dir(proc.pid) == str(run_dir):  # /proc cmdline
                break
            time.sleep(0.05)
        assert bench._trainer_run_dir(proc.pid) == str(run_dir)
        real_sleep = time.sleep
        monkeypatch.setattr(
            bench.time, "sleep", lambda s: real_sleep(min(s, 0.1))
        )
        reaper = threading.Thread(target=proc.wait, daemon=True)
        reaper.start()
        bench._quiesce_trainer(max_wait_s=30.0)
        reaper.join(timeout=10)
        assert (run_dir / "STOP").exists()
        assert proc.poll() == 0
    finally:
        if proc.poll() is None:
            proc.kill()
        proc.wait()


def test_quiesce_ignores_dead_pid(tmp_path, monkeypatch):
    import bench

    pid_file = tmp_path / "bigrun.pid"
    pid_file.write_text("999999999")
    monkeypatch.setenv("BENCH_TRAINER_PID_FILE", str(pid_file))
    monkeypatch.setenv("BENCH_TRAINER_RUN", str(tmp_path))
    monkeypatch.setattr(bench.jax, "default_backend", lambda: "tpu")
    bench._quiesce_trainer()
    assert not (tmp_path / "STOP").exists()
