"""serving/factory.py: the shared load-checkpoint -> PoseEstimator recipe.

Both serving frontends (cli/serve.py, ros/pyrapose_ros pyrapose_node.py)
construct their estimator through this factory (the reference duplicates
the recipe between bin/evaluate.py and pyrapose_node.py:773-814); cover the
factory itself rather than only its callers.
"""

from __future__ import annotations

import numpy as np

from pyrapose_tpu.serving.factory import estimator_from_checkpoint


def test_random_weights_estimator(capsys):
    est = estimator_from_checkpoint(
        "linemod", None, backbone="resnet10", image_shape=(64, 64)
    )
    out = capsys.readouterr().out
    assert "random weights" in out  # loud warning, not a silent fallback
    assert est.spec.image_shape == (64, 64)
    img = np.zeros((64, 64, 3), np.uint8)
    poses = est.estimate(img)
    # random weights: any (possibly empty) pose list, but a well-formed one
    assert isinstance(poses, list)


def test_icp_without_meshes_disables_icp(tmp_path, capsys):
    # a valid data root (models_info present) but no models/*.ply meshes:
    # the factory must fall back to ICP-off loudly, not crash or serve
    # box-corner "surfaces" to ICP
    import sys

    sys.path.insert(0, "tests")
    from test_datasets import _make_bop_tree

    _make_bop_tree(str(tmp_path), [1])
    est = estimator_from_checkpoint(
        "linemod", None, backbone="resnet10", image_shape=(64, 64),
        icp=True, data_path=str(tmp_path),
    )
    out = capsys.readouterr().out
    assert "ICP disabled" in out
    assert est.config.icp is False
