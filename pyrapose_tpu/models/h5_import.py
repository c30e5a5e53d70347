"""Keras .h5 checkpoint import: reference weights -> flax param tree.

The reference trains Keras models and stores full .h5 checkpoints
(bin/train.py:128-142); its backbone loads fizyr's Caffe-named ImageNet
ResNet h5 by layer name (models/resnet.py:87-98 `load_weights(by_name=True)`).
This module maps those layouts onto this framework's parameter tree for
checkpoint-parity evaluation (SURVEY.md section 7.2 step 3):

- `import_resnet_imagenet`: the Caffe naming scheme (conv1/bn_conv1,
  res{S}{b}_branch{2a,2b,2c,1}, bn{S}{b}_branch*) used by keras-resnet and
  the fizyr release -> `backbone/*` params + batch_stats.
- `import_pyrapose_h5`: a full training checkpoint. Backbone layers are
  matched by name; the PFPN's ten convs are matched in topological file
  order filtered by kernel shape (the reference leaves them auto-named,
  retinanet.py:180-214, so names carry no information); the three heads are
  nested keras sub-models ('3Dbox'/'cls'/'mask' submodels,
  retinanet.py:217-229) whose inner conv order is their build order.

Keras Conv2D kernels are HWIO like flax — no transposes; BatchNorm maps
(gamma, beta) -> params (scale, bias) and (moving_mean, moving_variance) ->
batch_stats.

Validation: beyond the hand-written fixtures (tests/test_h5_import.py), the
mapping is checked against a reference-shaped checkpoint written by REAL
keras through its legacy HDF5 writer — auto-name counters, topological
layer_names order, nested sub-model weight paths and BN naming all come
from keras itself (tests/test_h5_import_keras.py). Residual risk is down
to keras-2.3-era naming drift: no real fizyr/PyraPose checkpoint is
published (reference README.md:25), so a file written by that exact
version could still differ; verify imported checkpoints with
`pyrapose evaluate ... model.h5` on a few frames before trusting them.
"""

from __future__ import annotations

import string

import numpy as np


def _as_f32(x) -> np.ndarray:
    return np.asarray(x, np.float32)


def read_h5_layers(path: str) -> dict[str, dict[str, np.ndarray]]:
    """Flatten a keras .h5 weight file -> {layer_name: {short_name: array}}.

    Handles both top-level layers and nested sub-model groups; insertion
    order follows the file's `layer_names` attribute (keras writes
    model.layers order).
    """
    import h5py

    out: dict[str, dict[str, np.ndarray]] = {}
    with h5py.File(path, "r") as f:
        root = f["model_weights"] if "model_weights" in f else f

        def visit(group, prefix=""):
            names = group.attrs.get("layer_names")
            if names is None:
                names = list(group.keys())
            else:
                names = [n.decode() if isinstance(n, bytes) else n for n in names]
            for lname in names:
                if lname not in group:
                    continue
                g = group[lname]
                wnames = g.attrs.get("weight_names")
                if wnames is None:
                    # nested model group without weight_names: recurse
                    visit(g, prefix + lname + "/")
                    continue
                for wn in wnames:
                    wn = wn.decode() if isinstance(wn, bytes) else wn
                    arr = np.asarray(g[wn])
                    short = wn.split("/")[-1].split(":")[0]
                    # nested sub-model weight names look like
                    # "inner_layer/kernel:0" — keep the inner layer too
                    inner = "/".join(wn.split("/")[:-1])
                    key = prefix + lname
                    if inner and inner != lname:
                        key = prefix + lname + "/" + inner
                    out.setdefault(key, {})[short] = arr
        visit(root)
    return out


# ---------------------------------------------------------------------------
# Caffe-named ResNet -> backbone subtree
# ---------------------------------------------------------------------------

_STAGE_BLOCKS = {"resnet50": (3, 4, 6, 3), "resnet101": (3, 4, 23, 3),
                 "resnet152": (3, 8, 36, 3)}


def _caffe_block_names(depth_name: str):
    """Yield (our_block_path, caffe_suffix) pairs, e.g.
    ('stage1_block1', '2a') for res2a."""
    blocks = _STAGE_BLOCKS[depth_name]
    for stage_idx, n in enumerate(blocks):
        caffe_stage = stage_idx + 2  # caffe res2..res5
        for b in range(n):
            if n <= 26:
                suffix = string.ascii_lowercase[b]
            else:
                suffix = f"a{b}" if b else "a"
            # keras-resnet for resnet101/152 names blocks 'a', 'b1', 'b2', ...
            if n > 3 and b > 0 and depth_name != "resnet50":
                suffix = f"b{b}"
            yield f"stage{stage_idx + 1}_block{b + 1}", f"{caffe_stage}{suffix}"


def _bn_split(w: dict[str, np.ndarray]):
    params = {"scale": _as_f32(w["gamma"]), "bias": _as_f32(w["beta"])}
    stats = {
        "mean": _as_f32(w["moving_mean"]),
        "var": _as_f32(w["moving_variance"]),
    }
    return params, stats


def import_resnet_imagenet(
    h5_path: str, variables: dict, backbone: str = "resnet50"
) -> dict:
    """Fill `backbone/*` of a variables tree from a Caffe-named ResNet h5.

    Returns a new {params, batch_stats} dict; raises KeyError with the layer
    name when an expected layer is absent.
    """
    layers = read_h5_layers(h5_path)
    params = {k: dict(v) if isinstance(v, dict) else v
              for k, v in variables["params"].items()}
    stats = {k: dict(v) if isinstance(v, dict) else v
             for k, v in variables.get("batch_stats", {}).items()}
    bb_params = dict(params["backbone"])
    bb_stats = dict(stats.get("backbone", {}))

    def set_conv(our: str, caffe: str):
        w = layers[caffe]
        kernel = _as_f32(w["kernel"])
        entry = {"kernel": kernel}
        if "bias" in w:
            entry["bias"] = _as_f32(w["bias"])
        expect = np.asarray(bb_params[our]["kernel"]).shape
        if kernel.shape != expect:
            raise ValueError(
                f"{caffe}: kernel shape {kernel.shape} != expected {expect}"
            )
        bb_params[our] = entry

    def set_bn(our_parent: str, our: str, caffe: str):
        p, s = _bn_split(layers[caffe])
        if our_parent:
            sub = dict(bb_params[our_parent])
            sub[our] = p
            bb_params[our_parent] = sub
            ssub = dict(bb_stats.get(our_parent, {}))
            ssub[our] = s
            bb_stats[our_parent] = ssub
        else:
            bb_params[our] = p
            bb_stats[our] = s

    set_conv("stem_conv", "conv1")
    set_bn("", "stem_bn", "bn_conv1")

    for block_path, caffe in _caffe_block_names(backbone):
        sub = dict(bb_params[block_path])
        ssub = dict(bb_stats.get(block_path, {}))
        for our_c, our_b, branch in (
            ("conv1", "bn1", "branch2a"),
            ("conv2", "bn2", "branch2b"),
            ("conv3", "bn3", "branch2c"),
        ):
            w = layers[f"res{caffe}_{branch}"]
            sub[our_c] = {"kernel": _as_f32(w["kernel"])}
            p, s = _bn_split(layers[f"bn{caffe}_{branch}"])
            sub[our_b] = p
            ssub[our_b] = s
        if "proj_conv" in sub:
            w = layers[f"res{caffe}_branch1"]
            sub["proj_conv"] = {"kernel": _as_f32(w["kernel"])}
            p, s = _bn_split(layers[f"bn{caffe}_branch1"])
            sub["proj_bn"] = p
            ssub["proj_bn"] = s
        bb_params[block_path] = sub
        bb_stats[block_path] = ssub

    params["backbone"] = bb_params
    stats["backbone"] = bb_stats
    return {"params": params, "batch_stats": stats}


# ---------------------------------------------------------------------------
# Full PyraPose checkpoint
# ---------------------------------------------------------------------------

# PFPN conv creation order in __create_sparceFPN (retinanet.py:180-214) and
# the flax names they land on.
_PFPN_ORDER = (
    "lateral_p3", "lateral_p4", "lateral_p5",
    "td_p4", "td_p3", "down_p3", "out_p3", "down_p4", "out_p4", "out_p5",
)

# The named output convs (retinanet.py:204,209,212 pass name='P3'/'P4'/'P5').
_PFPN_NAMED = {"P3": "out_p3", "P4": "out_p4", "P5": "out_p5"}
# The four shape-identical unnamed 3x3 smoothing/downsampling convs, in
# CREATION order (retinanet.py:199-207: P4_mid, P3_mid, P3_down, P4_down).
_PFPN_MIDS = ("td_p4", "td_p3", "down_p3", "down_p4")
_PFPN_LATERALS = ("lateral_p3", "lateral_p4", "lateral_p5")


def _auto_name_index(name: str) -> int:
    """keras auto-name counter: 'conv2d' -> 0, 'conv2d_7' -> 7.

    The counter increments at layer INSTANTIATION, so it encodes creation
    order even though the h5 `layer_names` attribute is written in
    model.layers (topological) order — the robust anchor for the four
    shape-identical PFPN convs.
    """
    head, _, tail = name.rpartition("_")
    if head and tail.isdigit():
        return int(tail)
    return 0

_HEAD_SUBTREES = {"3Dbox": "box3d_head", "cls": "cls_head", "mask": "mask_head"}


def import_pyrapose_h5(h5_path: str, variables: dict) -> dict:
    """Import a full reference training checkpoint.

    Backbone: by Caffe name. PFPN: the ten auto-named top-level convs in
    file order (kernel-shape checked). Heads: nested sub-model groups in
    build order — 4 tower convs then the output conv each.
    """
    layers = read_h5_layers(h5_path)
    variables = import_resnet_imagenet(h5_path, variables)
    params = variables["params"]

    named_backbone = {
        k for k in layers
        if k.startswith(("res", "bn", "conv1", "padding")) or k == "bn_conv1"
    }

    # -- PFPN mapping (order-robust) ---------------------------------------
    # keras writes `layer_names` in model.layers (topological) order, NOT
    # creation order, and td/down convs share the same 3x3 256->256 kernel
    # shape — file order alone could silently swap them. Anchors used
    # instead: (a) the named 'P3'/'P4'/'P5' output convs; (b) the 1x1
    # laterals, disambiguated by input width (C3 < C4 < C5); (c) the four
    # remaining 3x3 convs by their auto-name counter ('conv2d_N'), which
    # encodes creation order.
    top_convs = [
        (k, v) for k, v in layers.items()
        if k not in named_backbone and "/" not in k and "kernel" in v
    ]
    pfpn = dict(params["pfpn"])

    def assign(our: str, lname: str, w) -> None:
        expect = np.asarray(pfpn[our]["kernel"]).shape
        k = _as_f32(w["kernel"])
        if k.shape != expect:
            raise ValueError(
                f"pyramid conv {lname} -> {our}: shape {k.shape} != {expect}"
            )
        pfpn[our] = {"kernel": k, "bias": _as_f32(w["bias"])}

    if all(n in layers for n in _PFPN_NAMED):
        for nm, our in _PFPN_NAMED.items():
            assign(our, nm, layers[nm])
        unnamed = [(k, v) for k, v in top_convs if k not in _PFPN_NAMED]
        laterals = [
            (k, v) for k, v in unnamed if v["kernel"].shape[:2] == (1, 1)
        ]
        mids = [
            (k, v) for k, v in unnamed if v["kernel"].shape[:2] == (3, 3)
        ]
        if len(laterals) != 3 or len(mids) != 4:
            raise ValueError(
                f"PFPN: expected 3 laterals + 4 mid convs, found "
                f"{len(laterals)} + {len(mids)}"
            )
        laterals.sort(key=lambda kv: kv[1]["kernel"].shape[2])  # Cin asc
        for (lname, w), our in zip(laterals, _PFPN_LATERALS):
            assign(our, lname, w)
        mids.sort(key=lambda kv: _auto_name_index(kv[0]))
        for (lname, w), our in zip(mids, _PFPN_MIDS):
            assign(our, lname, w)
    else:
        # legacy fallback: strict file order (pre-naming exports)
        if len(top_convs) < len(_PFPN_ORDER):
            raise ValueError(
                f"expected >= {len(_PFPN_ORDER)} pyramid convs, "
                f"found {len(top_convs)}"
            )
        for (lname, w), our in zip(top_convs[: len(_PFPN_ORDER)], _PFPN_ORDER):
            assign(our, lname, w)
    params["pfpn"] = pfpn

    # -- heads: nested sub-model groups --------------------------------
    for h5_name, our_head in _HEAD_SUBTREES.items():
        inner = [
            (k, v) for k, v in layers.items()
            if k.startswith(h5_name + "/") and "kernel" in v
        ]
        if not inner:
            continue
        head = dict(params[our_head])
        tower = dict(head["tower"])
        *tower_convs, out_conv = inner
        for i, (lname, w) in enumerate(tower_convs[:4]):
            tower[f"conv{i}"] = {
                "kernel": _as_f32(w["kernel"]),
                "bias": _as_f32(w["bias"]),
            }
        head["tower"] = tower
        head["out"] = {
            "kernel": _as_f32(out_conv[1]["kernel"]),
            "bias": _as_f32(out_conv[1]["bias"]),
        }
        params[our_head] = head
    variables["params"] = params
    return variables
