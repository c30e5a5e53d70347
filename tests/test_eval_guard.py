"""Epoch-boundary eval safety (VERDICT r3 weak #1 / next-round #1).

Round 3's flagship run died at its first in-training eval and lost all 9
completed epochs because the checkpoint save ran AFTER the eval and the
eval was unguarded. These tests pin the new contract in cli/train.py:

- the epoch-boundary checkpoint is written BEFORE the eval runs, so a
  broken eval can never cost more than zero epochs;
- an eval exception degrades to a missing metric (run continues, exit 0);
- the launch preflight executes one eval batch BEFORE epoch 1, so a
  broken eval stack fails at launch, not ten epochs in;
- --no-eval-preflight restores the old lazy behavior for smoke runs.
"""

import os

import pytest

import pyrapose_tpu.cli.train as cli_train
from pyrapose_tpu.cli.main import main
from tests.test_datasets import _make_bop_tree


def _args(root, snap, epochs, extra=()):
    return [
        "train", "homebrewed", root,
        "--backbone", "resnet10", "--batch-size", "2",
        "--epochs", str(epochs),
        "--image-min-side", "64", "--image-max-side", "64",
        "--snapshot-path", snap, "--no-augment",
        "--eval-every", "1", "--eval-samples", "2",
        *extra,
    ]


@pytest.fixture()
def tree(tmp_path):
    root = str(tmp_path / "ds")
    snap = str(tmp_path / "ckpt")
    _make_bop_tree(root, [1], set_name="train", n_images=4)
    return root, snap


def test_preflight_runs_by_default(tree, capsys):
    root, snap = tree
    assert main(_args(root, snap, 1)) == 0
    out = capsys.readouterr().out
    assert "eval preflight ok" in out
    # preflight happens before any epoch trains
    assert out.index("eval preflight ok") < out.index("epoch 1/1")


def test_no_eval_preflight_flag(tree, capsys):
    root, snap = tree
    assert main(_args(root, snap, 1, ["--no-eval-preflight"])) == 0
    out = capsys.readouterr().out
    assert "eval preflight ok" not in out


def test_preflight_fails_fast_before_training(tree, capsys, monkeypatch):
    """A broken eval stack must fail at launch with zero epochs trained."""
    root, snap = tree

    def boom(self, state):
        raise AttributeError("broken eval stack (preflight)")

    monkeypatch.setattr(cli_train._EvalRunner, "preflight", boom)
    with pytest.raises(AttributeError, match="preflight"):
        main(_args(root, snap, 2))
    out = capsys.readouterr().out
    assert "epoch 1/2" not in out  # the chip was never committed


def test_eval_crash_degrades_to_missing_metric(tree, capsys, monkeypatch):
    """Post-preflight eval breakage: run continues, checkpoint already
    banked, exit 0 (the r3 crash scenario, now survivable)."""
    root, snap = tree

    def boom(self, state):
        raise RuntimeError("eval broke mid-run")

    # preflight untouched (passes); the real eval raises
    monkeypatch.setattr(cli_train._EvalRunner, "__call__", boom)
    rc = main(_args(root, snap, 2, ["--save-epochs", "5"]))
    out = capsys.readouterr().out
    assert rc == 0
    assert "EVAL FAILED" in out
    assert "epoch 2/2" in out  # training continued past the broken eval
    snaps = [d for d in os.listdir(snap) if d.startswith("step_")]
    assert snaps, "epoch checkpoints must exist despite eval crashes"


def test_checkpoint_saved_before_eval(tree, capsys, monkeypatch):
    """The save must precede the eval within an epoch boundary — even off
    the --save-epochs cadence — so an eval death costs zero epochs."""
    root, snap = tree

    def boom(self, state):
        raise RuntimeError("eval broke")

    monkeypatch.setattr(cli_train._EvalRunner, "__call__", boom)
    assert main(_args(root, snap, 1, ["--save-epochs", "50"])) == 0
    out = capsys.readouterr().out
    first_save = out.index("saved ")
    first_fail = out.index("EVAL FAILED")
    assert first_save < first_fail, "checkpoint must be banked before eval"
