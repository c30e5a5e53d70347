"""--int8 argv path: `pyrapose evaluate ... --int8` end-to-end on a fixture.

Locks the CLI wiring (flag -> quantize_variables -> build_inference_fn
qtable) with the small backbone; the numeric path itself is covered by
tests/test_quantize.py.
"""

from pyrapose_tpu.cli.main import main
from tests.test_datasets import _make_bop_tree


def test_evaluate_int8_cli(tmp_path, capsys):
    root = str(tmp_path / "ds")
    _make_bop_tree(root, [1, 2], set_name="val", n_images=4)
    rc = main([
        "evaluate", "homebrewed", root,
        "--backbone", "resnet10", "--batch-size", "2",
        "--image-min-side", "64", "--image-max-side", "64",
        "--set-name", "val", "--int8",
    ])
    assert rc == 0
    out = capsys.readouterr().out
    assert "int8: quantized" in out
    assert "evaluation (ADD(-S) < 0.1d)" in out
