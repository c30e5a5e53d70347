"""`evaluate --report-json` argv path: machine-readable report twin."""

import json

from pyrapose_tpu.cli.main import main
from tests.test_datasets import _make_bop_tree


def test_evaluate_report_json_cli(tmp_path):
    root = str(tmp_path / "ds")
    out = str(tmp_path / "report.json")
    _make_bop_tree(root, [1, 2], set_name="val", n_images=4)
    rc = main([
        "evaluate", "homebrewed", root,
        "--backbone", "resnet10", "--batch-size", "2",
        "--image-min-side", "64", "--image-max-side", "64",
        "--set-name", "val", "--report-json", out,
    ])
    assert rc == 0
    report = json.load(open(out))
    assert set(report["per_class"]) >= {
        "recall", "precision", "detection_rate", "support"
    }
    for key in ("mean_recall", "mean_precision", "mean_detection_rate"):
        assert isinstance(report[key], float)
    # the live accumulator object must be dropped, not crash serialization
    assert report.get("accumulator") is None
