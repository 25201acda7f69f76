"""Checkpointing (orbax) + torch→jax weight conversion.

Replaces the reference's mmcv Runner checkpoint machinery
(`/root/reference/mmdet/apis/train.py:227-230`, `checkpoint_config` with
epoch + intra-epoch cadence) and the model-surgery utilities
(`tools/publish_model.py`, `upgrade_model_version.py`,
`detectron2pytorch.py`).  Checkpoints embed meta (framework version, config
text, CLASSES) like the reference (`tools/train.py:91-98`).

``convert_torch_checkpoint`` maps a reference-trained ``.pth`` state_dict
onto this framework's param pytree so mAP parity can be validated without
retraining (SURVEY §5 checkpoint/resume notes).
"""
from __future__ import annotations

import json
import os
import re
from typing import Any, Dict, Optional, Tuple

import numpy as np


# ---------------------------------------------------------------- orbax io
def save_checkpoint(path: str, state, meta: Optional[dict] = None):
    """state: engine TrainState or bare params pytree."""
    import orbax.checkpoint as ocp
    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, state, force=True)
    ckptr.wait_until_finished()
    if meta is not None:
        with open(path + ".meta.json", "w") as f:
            json.dump(meta, f)


def load_checkpoint(path: str, target=None):
    import orbax.checkpoint as ocp
    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    state = ckptr.restore(path, target)
    meta = None
    if os.path.isfile(path + ".meta.json"):
        with open(path + ".meta.json") as f:
            meta = json.load(f)
    return state, meta


def publish_model(in_path: str, out_path: str, target=None):
    """`tools/publish_model.py` equivalent: strip optimizer state, suffix a
    content hash."""
    import hashlib
    state, meta = load_checkpoint(in_path, target)
    params = state.params if hasattr(state, "params") else state
    save_checkpoint(out_path, params, meta)
    h = hashlib.sha256()
    import jax
    for leaf in jax.tree_util.tree_leaves(params):
        h.update(np.asarray(leaf).tobytes())
    digest = h.hexdigest()[:8]
    final = f"{out_path}-{digest}"
    os.rename(out_path, final)
    if os.path.isfile(out_path + ".meta.json"):
        os.rename(out_path + ".meta.json", final + ".meta.json")
    return final


# ------------------------------------------------------- torch → jax import
def _conv_w(w: np.ndarray) -> np.ndarray:
    """torch OIHW → flax HWIO."""
    return np.transpose(w, (2, 3, 1, 0))


def _fc_w(w: np.ndarray) -> np.ndarray:
    """torch (out, in) → flax (in, out)."""
    return np.transpose(w, (1, 0))


ROI_FEAT_HW = 7


def _fc_roi_w(w: np.ndarray) -> np.ndarray:
    """fc weight over flattened RoI features: torch flattens (C, 7, 7) in
    CHW order, this framework flattens NHWC pooled features in HWC order
    (bbox_head.flatten_roi_feats) — permute the input axis accordingly."""
    out_dim, in_dim = w.shape
    c = in_dim // (ROI_FEAT_HW * ROI_FEAT_HW)
    w = w.reshape(out_dim, c, ROI_FEAT_HW, ROI_FEAT_HW)
    w = np.transpose(w, (0, 2, 3, 1)).reshape(out_dim, in_dim)
    return np.transpose(w, (1, 0))


def _is_roi_fc(name_base: str, w: np.ndarray) -> bool:
    """fc layers that consume flattened 7×7 RoI maps: fc_new_1 of the
    SELSA/HRNMP heads, the first shared fc of ConvFC heads, and plain
    BBoxHead fc_cls/fc_reg on conv features (in_dim divisible by 49 and
    larger than the 1024-d relation features)."""
    if w.ndim != 2:
        return False
    in_dim = w.shape[1]
    if in_dim % (ROI_FEAT_HW * ROI_FEAT_HW) != 0 or in_dim < 2048:
        return False
    return name_base in ("fc_new_1", "shared_fc0", "fc_cls", "fc_reg", "fc0")


def _set(tree: Dict, path: Tuple[str, ...], value: np.ndarray):
    node = tree
    for k in path[:-1]:
        node = node.setdefault(k, {})
    node[path[-1]] = value


_BN_MAP = {"weight": "scale", "bias": "bias",
           "running_mean": "mean", "running_var": "var"}


def convert_torch_checkpoint(state_dict: Dict[str, np.ndarray],
                             verbose: bool = False) -> Dict[str, Any]:
    """Map a reference mmdet state_dict to this framework's {'params': ...}.

    Handles: caffe ResNet backbone (stem conv1/bn1, layer1-3 bottlenecks with
    downsample), shared head (layer4 + external ConvModule new_layer_1), RPN
    head, SELSA head (fc_new_1/2, selsa_1/2 q/k fc + 1×1 linear_out, fc_cls,
    fc_reg) and HRNMP head (fc_new_1..4, selsa_1..4, fc_cls(_2), fc_reg(_2)).
    """
    out: Dict[str, Any] = {}
    unused = []
    for name, v in state_dict.items():
        v = np.asarray(v)
        parts = name.split(".")
        mod = parts[0]
        if mod == "backbone":
            if parts[1] == "conv1":
                _set(out, ("backbone", "stem", "conv", "kernel"), _conv_w(v))
            elif parts[1] == "bn1":
                _set(out, ("backbone", "stem", "bn", _BN_MAP[parts[2]]), v)
            elif parts[1].startswith("layer"):
                layer = parts[1]
                block = f"block{parts[2]}"
                sub = parts[3]
                if sub.startswith("conv"):
                    _set(out, ("backbone", layer, block, sub, "conv", "kernel"),
                         _conv_w(v))
                elif sub.startswith("bn"):
                    idx = sub[2:]
                    _set(out, ("backbone", layer, block, f"conv{idx}", "bn",
                               _BN_MAP[parts[4]]), v)
                elif sub == "downsample":
                    if parts[4] == "0":   # conv
                        _set(out, ("backbone", layer, block, "downsample",
                                   "conv", "kernel"), _conv_w(v))
                    else:                 # bn
                        _set(out, ("backbone", layer, block, "downsample",
                                   "bn", _BN_MAP[parts[5]]), v)
                else:
                    unused.append(name)
            else:
                unused.append(name)
        elif mod == "shared_head":
            if parts[1].startswith("layer"):
                layer = parts[1]
                block = f"block{parts[2]}"
                sub = parts[3]
                if sub.startswith("conv"):
                    _set(out, ("shared_head", layer, block, sub, "conv",
                               "kernel"), _conv_w(v))
                elif sub.startswith("bn"):
                    idx = sub[2:]
                    _set(out, ("shared_head", layer, block, f"conv{idx}", "bn",
                               _BN_MAP[parts[4]]), v)
                elif sub == "downsample":
                    if parts[4] == "0":
                        _set(out, ("shared_head", layer, block, "downsample",
                                   "conv", "kernel"), _conv_w(v))
                    else:
                        _set(out, ("shared_head", layer, block, "downsample",
                                   "bn", _BN_MAP[parts[5]]), v)
            elif parts[1] == "new_layer_1":
                # ConvModule: new_layer_1.conv.weight/bias
                key = "kernel" if parts[3] == "weight" else "bias"
                val = _conv_w(v) if parts[3] == "weight" else v
                _set(out, ("shared_head", "new_layer_1", "conv", key), val)
            else:
                unused.append(name)
        elif mod == "rpn_head":
            sub = parts[1]
            key = "kernel" if parts[2] == "weight" else "bias"
            val = _conv_w(v) if parts[2] == "weight" else v
            _set(out, ("rpn_head", sub, key), val)
        elif mod == "bbox_head":
            sub = parts[1]
            m = re.match(r"selsa_(\d+)", sub)
            if m:
                inner = parts[2]            # e.g. q_data_fc_1 / linear_out_1
                base = re.sub(r"_\d+$", "", inner)
                key = "kernel" if parts[3] == "weight" else "bias"
                if base == "linear_out" and parts[3] == "weight":
                    val = v[:, :, 0, 0].T   # 1×1 Conv2d (O,I,1,1) → dense (I,O)
                elif parts[3] == "weight":
                    val = _fc_w(v)
                else:
                    val = v
                _set(out, ("bbox_head", sub, base, key), val)
            elif sub.startswith("fc_") or sub.startswith("shared_fc"):
                key = "kernel" if parts[2] == "weight" else "bias"
                if parts[2] == "weight":
                    val = _fc_roi_w(v) if _is_roi_fc(sub, v) else _fc_w(v)
                else:
                    val = v
                _set(out, ("bbox_head", sub, key), val)
            else:
                unused.append(name)
        else:
            unused.append(name)
    if verbose and unused:
        print(f"convert_torch_checkpoint: {len(unused)} unmapped tensors "
              f"(e.g. {unused[:5]})")
    return {"params": out}


def load_torch_checkpoint(path: str, verbose: bool = False) -> Dict[str, Any]:
    import torch
    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    sd = ckpt.get("state_dict", ckpt)
    sd = {k: v.numpy() if hasattr(v, "numpy") else np.asarray(v)
          for k, v in sd.items()}
    return convert_torch_checkpoint(sd, verbose=verbose)


def merge_params(init_params: Dict[str, Any],
                 loaded: Dict[str, Any]) -> Tuple[Dict[str, Any], list]:
    """Overlay loaded tensors on an initialized tree; returns (tree, missing)."""
    import jax

    missing = []

    def walk(init_node, loaded_node, path):
        if isinstance(init_node, dict):
            out = {}
            for k, v in init_node.items():
                ln = loaded_node.get(k) if isinstance(loaded_node, dict) else None
                out[k] = walk(v, ln, path + (k,))
            return out
        if loaded_node is None:
            missing.append("/".join(path))
            return init_node
        arr = np.asarray(loaded_node)
        expect = np.asarray(init_node)
        if arr.shape != expect.shape:
            raise ValueError(
                f"shape mismatch at {'/'.join(path)}: "
                f"checkpoint {arr.shape} vs model {expect.shape}")
        return arr.astype(expect.dtype)

    merged = walk(init_params, loaded, ())
    return merged, missing
