"""--device-cache-rotate argv path: HBM-chunk rotation through a set
bigger than the staged cache, end-to-end via the real train CLI.

Covers the coverage property (every chunk staged over the run), the
per-chunk disk caches, and the resume arithmetic (chunk is a pure function
of the epoch), with the small backbone on a tiny fixture.
"""

import os

from pyrapose_tpu.cli.main import main
from tests.test_datasets import _make_bop_tree

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_train_cache_rotation_cli(tmp_path, capsys):
    root = str(tmp_path / "ds")
    snap = str(tmp_path / "ckpt")
    _make_bop_tree(root, [1, 2], set_name="train", n_images=8)
    rc = main([
        "train", "homebrewed", root,
        "--backbone", "resnet10", "--batch-size", "2", "--epochs", "4",
        "--image-min-side", "64", "--image-max-side", "64",
        "--snapshot-path", snap, "--no-augment",
        "--device-cache", "--device-cache-frames", "4",
        "--device-cache-rotate", "2",
    ])
    assert rc == 0
    out = capsys.readouterr().out
    # 8 frames / 4 per chunk = 2 chunks, rotating every 2 of 4 epochs:
    # both chunks must have been staged exactly once
    assert "2 chunks x 4 frames over 8" in out
    assert "staging chunk 1/2" in out
    assert "staging chunk 2/2" in out
    assert out.count("staging chunk") == 2
    # per-chunk decoded-set disk caches
    assert os.path.exists(os.path.join(snap, "device_cache_c0.npz"))
    assert os.path.exists(os.path.join(snap, "device_cache_c1.npz"))
    assert "epoch 4/4" in out


def test_resume_restages_correct_chunk(tmp_path, capsys):
    """A resumed run must stage the chunk its epoch lands in (not chunk 0)."""
    root = str(tmp_path / "ds")
    snap = str(tmp_path / "ckpt")
    _make_bop_tree(root, [1, 2], set_name="train", n_images=8)
    common = [
        "train", "homebrewed", root,
        "--backbone", "resnet10", "--batch-size", "2",
        "--image-min-side", "64", "--image-max-side", "64",
        "--snapshot-path", snap, "--no-augment",
        "--device-cache", "--device-cache-frames", "4",
        "--device-cache-rotate", "2",
    ]
    assert main(common + ["--epochs", "2"]) == 0
    capsys.readouterr()
    # epochs 3-4 live in chunk 2: the resumed run must NOT touch chunk 1
    assert main(common + ["--epochs", "4", "--auto-resume"]) == 0
    out = capsys.readouterr().out
    assert "staging chunk 2/2" in out
    assert "staging chunk 1/2" not in out


def test_prefetch_rotation_matches_inline(tmp_path, capsys):
    """--device-cache-prefetch is a pure latency optimization: the staged
    chunk content (and therefore every training loss) must be identical to
    the inline-restage path."""
    import json

    root = str(tmp_path / "ds")
    _make_bop_tree(root, [1, 2], set_name="train", n_images=8)

    def _run(snap, extra):
        rc = main([
            "train", "homebrewed", root,
            "--backbone", "resnet10", "--batch-size", "2", "--epochs", "4",
            "--image-min-side", "64", "--image-max-side", "64",
            "--snapshot-path", snap, "--no-augment",
            "--device-cache", "--device-cache-frames", "4",
            "--device-cache-rotate", "1",
            *extra,
        ])
        assert rc == 0
        return [
            loss
            for ln in open(snap + "/metrics.jsonl")
            for loss in json.loads(ln)["losses"]
        ]

    inline = _run(str(tmp_path / "inline"), [])
    capsys.readouterr()
    pre = _run(str(tmp_path / "pre"), ["--device-cache-prefetch"])
    out = capsys.readouterr().out
    # rotate=1 over 2 chunks x 4 epochs: chunk 2 (epoch 2) and every
    # rotation after the first must come from the background stage
    assert "chunk 2/2 prefetched" in out
    assert "chunk 1/2 prefetched" in out  # epoch 3 returns to chunk 1
    assert out.count("staging chunk") == 1  # only the first stage is inline
    assert pre == inline


def test_prestage_tool_caches_are_reused_by_the_trainer(tmp_path, capsys):
    """tools/prestage_chunks.py must derive the exact chunk tables + disk
    keys the trainer derives (both shared from cli/train.py), so a
    pre-staged run performs ZERO inline decodes: every chunk loads from
    the pre-built .npz (VERDICT r2 weak #3: first-cycle decode stalls)."""
    import subprocess
    import sys

    root = str(tmp_path / "ds")
    snap = str(tmp_path / "ckpt")
    _make_bop_tree(root, [1, 2], set_name="train", n_images=8)
    out = subprocess.run(
        [
            sys.executable, os.path.join(REPO, "tools", "prestage_chunks.py"),
            root, snap, "--dataset", "homebrewed",
            "--cache-frames", "4", "--seed", "0", "--workers", "1",
            "--image-min-side", "64", "--image-max-side", "64",
        ],
        capture_output=True, text=True, timeout=600,
        env={**os.environ, "JAX_PLATFORMS": "cpu"},
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert os.path.exists(os.path.join(snap, "device_cache_c0.npz"))
    assert os.path.exists(os.path.join(snap, "device_cache_c1.npz"))

    rc = main([
        "train", "homebrewed", root,
        "--backbone", "resnet10", "--batch-size", "2", "--epochs", "4",
        "--image-min-side", "64", "--image-max-side", "64",
        "--snapshot-path", snap, "--no-augment", "--seed", "0",
        "--device-cache", "--device-cache-frames", "4",
        "--device-cache-rotate", "2",
    ])
    assert rc == 0
    text = capsys.readouterr().out
    # the prestaged npz files are preloaded to host RAM at launch; every
    # rotation stage then reads from RAM ("(ram ..." in the stage
    # breakdown) — ZERO inline decodes and ZERO in-timeline disk loads
    assert "preloaded 2/2 chunks to host RAM" in text
    assert text.count("(ram ") == 2
    assert "decoded set loaded from" not in text  # nothing read mid-run
    assert "epoch 4/4" in text


def test_prestage_disk_path_without_host_ram(tmp_path, capsys):
    """--no-device-cache-host-ram restores the r3 behavior: each rotation
    loads its chunk from the prestaged npz on disk."""
    import subprocess
    import sys

    root = str(tmp_path / "ds")
    snap = str(tmp_path / "ckpt")
    _make_bop_tree(root, [1, 2], set_name="train", n_images=8)
    out = subprocess.run(
        [
            sys.executable, os.path.join(REPO, "tools", "prestage_chunks.py"),
            root, snap, "--dataset", "homebrewed",
            "--cache-frames", "4", "--seed", "0", "--workers", "1",
            "--image-min-side", "64", "--image-max-side", "64",
        ],
        capture_output=True, text=True, timeout=600,
        env={**os.environ, "JAX_PLATFORMS": "cpu"},
    )
    assert out.returncode == 0, out.stderr[-2000:]
    rc = main([
        "train", "homebrewed", root,
        "--backbone", "resnet10", "--batch-size", "2", "--epochs", "4",
        "--image-min-side", "64", "--image-max-side", "64",
        "--snapshot-path", snap, "--no-augment", "--seed", "0",
        "--device-cache", "--device-cache-frames", "4",
        "--device-cache-rotate", "2", "--no-device-cache-host-ram",
    ])
    assert rc == 0
    text = capsys.readouterr().out
    assert text.count("decoded set loaded from") == 2
    assert "preloaded" not in text
    assert "epoch 4/4" in text
