"""Anchor-parameter config file support.

The reference accepts an .ini file whose `[anchor_parameters]` section
overrides the anchor generation constants (utils/config.py:23-36, threaded
through `--config`: bin/evaluate.py:156, generator.py:338-342). Same format
here, mapped onto geometry.AnchorConfig:

    [anchor_parameters]
    sizes   = 32 64 128
    strides = 8 16 32
    ratios  = 0.5 1 2
    scales  = 1 1.2 1.6
"""

from __future__ import annotations

import configparser

from pyrapose_tpu.geometry.anchors import AnchorConfig


def read_config_file(path: str) -> configparser.ConfigParser:
    config = configparser.ConfigParser()
    read = config.read(path)
    if not read:
        raise FileNotFoundError(path)
    return config


def parse_anchor_parameters(config: configparser.ConfigParser) -> AnchorConfig:
    """[anchor_parameters] section -> AnchorConfig (reference
    utils/config.py:30-36 semantics: space-separated value lists)."""
    sec = config["anchor_parameters"]
    kwargs = {}
    if "sizes" in sec:
        kwargs["sizes"] = tuple(float(v) for v in sec["sizes"].split())
    if "strides" in sec:
        kwargs["strides"] = tuple(int(v) for v in sec["strides"].split())
    if "ratios" in sec:
        kwargs["ratios"] = tuple(float(v) for v in sec["ratios"].split())
    if "scales" in sec:
        kwargs["scales"] = tuple(float(v) for v in sec["scales"].split())
    cfg = AnchorConfig(**kwargs)
    if len(cfg.sizes) != len(cfg.strides):
        raise ValueError(
            f"sizes ({len(cfg.sizes)}) and strides ({len(cfg.strides)}) "
            "must have equal length"
        )
    return cfg


def anchor_config_from_file(path: str) -> AnchorConfig:
    return parse_anchor_parameters(read_config_file(path))
