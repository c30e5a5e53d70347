"""decoded_store: one-time decode into an mmap'd array, loader-equivalent."""

import numpy as np

from pyrapose_tpu.data.datasets import create_dataset
from pyrapose_tpu.data.decoded_store import DecodedStore, build_store
from tests.test_datasets import _make_bop_tree


def test_store_roundtrip_matches_dataset(tmp_path):
    root = str(tmp_path / "ds")
    _make_bop_tree(root, [1, 2], n_images=6)
    ds = create_dataset("homebrewed", root, spec=None, augment=None)
    prefix = str(tmp_path / "store" / "train")
    assert not DecodedStore.exists(prefix)
    build_store(ds, prefix, verbose=False)
    assert DecodedStore.exists(prefix)

    store = DecodedStore(prefix)
    assert len(store) == len(ds)
    idx = [3, 0, 5]
    imgs_s, gt_s = store.batch(idx)
    imgs_d, gt_d = ds.batch(idx)
    np.testing.assert_array_equal(imgs_s, np.asarray(imgs_d))
    for a, b in zip(gt_s, gt_d):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # rows are materialized copies (device_put-safe), not mmap views
    assert imgs_s.flags["C_CONTIGUOUS"]


def test_cli_flag_requires_device_augment(tmp_path):
    from pyrapose_tpu.cli.main import build_parser
    from pyrapose_tpu.cli.train import _build_dataset
    from pyrapose_tpu.data.spec import dataset_spec

    root = str(tmp_path / "ds")
    _make_bop_tree(root, [1, 2], n_images=4)
    args = build_parser().parse_args(
        ["train", "homebrewed", root,
         "--decoded-store", str(tmp_path / "st" / "train")]
    )
    spec = dataset_spec("homebrewed", root)
    import pytest

    with pytest.raises(ValueError, match="device-augment"):
        _build_dataset(args, spec, augment=True)

    args = build_parser().parse_args(
        ["train", "homebrewed", root, "--device-augment",
         "--decoded-store", str(tmp_path / "st" / "train")]
    )
    store = _build_dataset(args, spec, augment=True)
    assert isinstance(store, DecodedStore)
    assert len(store) == 4

    # --device-cache implies on-device augmentation (run_train's
    # device_aug), so it must satisfy the deterministic-frames check too
    # (regression: this combination raised a spurious ValueError)
    args = build_parser().parse_args(
        ["train", "homebrewed", root, "--device-cache",
         "--decoded-store", str(tmp_path / "st" / "train")]
    )
    store = _build_dataset(args, spec, augment=True)
    assert isinstance(store, DecodedStore)
