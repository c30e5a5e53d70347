"""Graceful external stop: `touch {snapshot_path}/STOP` ends the run with a
checkpoint and exit code 0 (so --supervise does not restart it), unlike the
reference's only stop mechanism — killing the keras process and losing the
epoch (bin/train.py has no equivalent; SURVEY §5 failure-recovery row).
"""

import os
import threading
import time

from pyrapose_tpu.cli.main import main
from tests.test_datasets import _make_bop_tree


def _args(root, snap, epochs):
    return [
        "train", "homebrewed", root,
        "--backbone", "resnet10", "--batch-size", "2",
        "--epochs", str(epochs),
        "--image-min-side", "64", "--image-max-side", "64",
        "--snapshot-path", snap, "--no-augment",
    ]


def test_stale_stop_sentinel_is_consumed_at_startup(tmp_path, capsys):
    """A STOP file left by a previous incarnation must not no-op the run."""
    root = str(tmp_path / "ds")
    snap = str(tmp_path / "ckpt")
    _make_bop_tree(root, [1], set_name="train", n_images=4)
    os.makedirs(snap)
    stop = os.path.join(snap, "STOP")
    open(stop, "w").close()
    assert main(_args(root, snap, 2)) == 0
    out = capsys.readouterr().out
    assert "removed stale stop sentinel" in out
    assert "epoch 2/2" in out  # ran to completion, no early exit
    assert not os.path.exists(stop)


def test_stop_sentinel_saves_and_exits_zero(tmp_path, capsys):
    """Touching STOP mid-run ends a long run early with a final snapshot."""
    root = str(tmp_path / "ds")
    snap = str(tmp_path / "ckpt")
    _make_bop_tree(root, [1], set_name="train", n_images=4)
    stop = os.path.join(snap, "STOP")
    metrics = os.path.join(snap, "metrics.jsonl")

    def touch_after_first_epoch():
        deadline = time.time() + 300
        while time.time() < deadline and not os.path.exists(metrics):
            time.sleep(0.05)
        open(stop, "w").close()

    watcher = threading.Thread(target=touch_after_first_epoch, daemon=True)
    watcher.start()
    rc = main(_args(root, snap, 500))
    watcher.join(timeout=10)
    assert rc == 0
    out = capsys.readouterr().out
    assert "stop sentinel" in out
    # stopped long before the nominal 500 epochs
    n_epochs = sum(1 for _ in open(metrics))
    assert n_epochs < 500
    # the stop path went through the end-of-epoch save
    snaps = [d for d in os.listdir(snap) if d.startswith("step_")]
    assert snaps, "graceful stop must leave a checkpoint"
