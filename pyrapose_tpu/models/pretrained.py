"""ImageNet backbone weights: fetch + import helper.

The reference auto-downloads the fizyr keras-models ResNet release and md5-
checks it (models/resnet.py:42-62). This module reproduces that path for
the framework: download (or accept a local file), verify the checksum, and
import through models/h5_import.py's Caffe-name mapping into a parameter
tree. Network access is optional — in air-gapped environments pass a
pre-downloaded file to `pyrapose convert --backbone-only`.
"""

from __future__ import annotations

import hashlib
import os

# fizyr keras-models release v0.0.1 (reference models/resnet.py:44-56)
_RESNET_URL = (
    "https://github.com/fizyr/keras-models/releases/download/v0.0.1/"
    "ResNet-{depth}-model.keras.h5"
)
_RESNET_MD5 = {
    50: "3e9f4e4f77bbe2c9bec13b53ee1c2319",
    101: "05dc86924389e5b401a9ea0348a3213c",
    152: "6ee11ef2b135592f8031058820bb9e71",
}


def imagenet_weights_url(backbone: str = "resnet50") -> tuple[str, str]:
    """(url, md5) of the reference's pretrained backbone release."""
    depth = int("".join(ch for ch in backbone if ch.isdigit()))
    if depth not in _RESNET_MD5:
        raise ValueError(f"no pretrained release for {backbone!r}")
    return _RESNET_URL.format(depth=depth), _RESNET_MD5[depth]


def verify_md5(path: str, expected: str) -> bool:
    h = hashlib.md5()
    with open(path, "rb") as f:
        for chunk in iter(lambda: f.read(1 << 20), b""):
            h.update(chunk)
    return h.hexdigest() == expected


def fetch_imagenet_weights(
    backbone: str = "resnet50",
    cache_dir: str | None = None,
    local_file: str | None = None,
) -> str:
    """Return a verified .h5 path: local_file if given, else download.

    Raises RuntimeError when the checksum fails and FileNotFoundError when
    offline with no local file (this build environment has zero egress —
    the download path is exercised in deployments, not CI).
    """
    url, md5 = imagenet_weights_url(backbone)
    if local_file is not None:
        if not os.path.exists(local_file):
            raise FileNotFoundError(local_file)
        if not verify_md5(local_file, md5):
            raise RuntimeError(
                f"{local_file}: md5 mismatch (expected {md5}); not the fizyr "
                f"{backbone} ImageNet release"
            )
        return local_file
    cache_dir = cache_dir or os.path.join(
        os.path.expanduser("~"), ".cache", "pyrapose_tpu", "pretrained"
    )
    os.makedirs(cache_dir, exist_ok=True)
    dest = os.path.join(cache_dir, os.path.basename(url))
    if os.path.exists(dest) and verify_md5(dest, md5):
        return dest
    import urllib.request

    try:
        urllib.request.urlretrieve(url, dest)
    except OSError as exc:
        raise FileNotFoundError(
            f"cannot download {url} ({exc}); pass a pre-downloaded file via "
            "--pretrained-file / local_file"
        ) from exc
    if not verify_md5(dest, md5):
        raise RuntimeError(f"downloaded {dest} fails md5 check")
    return dest


def load_imagenet_backbone(variables: dict, backbone: str = "resnet50",
                           local_file: str | None = None) -> dict:
    """Fetch + import the ImageNet backbone into `variables`."""
    from pyrapose_tpu.models.h5_import import import_resnet_imagenet

    path = fetch_imagenet_weights(backbone, local_file=local_file)
    return import_resnet_imagenet(path, variables, backbone)
