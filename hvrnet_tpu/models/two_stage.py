"""Two-stage detector module (backbone + shared head + RPN + bbox head).

Flax counterpart of `/root/reference/mmdet/models/detectors/two_stage.py` for
the C5 configuration both configs use: `feat_from_shared_head=True` moves the
dilated stage-4 + 1×1→256 conv *before* RoI pooling (two_stage.py:44-46,
225-232).  The module only holds parameters and pure per-tensor compute;
orchestration (sliding windows, sampling, NMS plumbing) lives in
``hvrnet_tpu.engine`` as jitted functions over these methods.
"""
from __future__ import annotations

from typing import Any, Dict, Optional

import flax.linen as nn
import jax.numpy as jnp

from .anchor_heads.rpn_head import RPNHead
from .backbones.resnet import ResNet
from .registry import BACKBONES, HEADS, SHARED_HEADS
from .shared_heads.res_layer import ResLayer


def _clean(cfg: Optional[Dict[str, Any]], cls) -> Dict[str, Any]:
    """Filter a config dict to the module's dataclass fields; tuple-ify lists."""
    if cfg is None:
        return {}
    fields = set(cls.__dataclass_fields__.keys())
    out = {}
    for k, v in cfg.items():
        if k == "type" or k not in fields:
            continue
        if isinstance(v, list):
            v = tuple(v)
        out[k] = v
    return out


def build_submodule(cfg: Dict[str, Any], registry, dtype, name: str):
    cls = registry.get(cfg["type"])
    if cls is None:
        raise KeyError(f"{cfg['type']} not registered in {registry.name}")
    kwargs = _clean(cfg, cls)
    if "dtype" in cls.__dataclass_fields__:
        kwargs["dtype"] = dtype
    return cls(name=name, **kwargs)


class TwoStageModule(nn.Module):
    """Parameter container exposing per-stage compute methods.

    Call as ``module.apply(params, x, method=module.<method>)``.
    """
    backbone: Dict[str, Any]
    rpn_head: Dict[str, Any]
    bbox_head: Dict[str, Any]
    shared_head: Optional[Dict[str, Any]] = None
    neck: Optional[Dict[str, Any]] = None
    dtype: Any = jnp.float32

    def setup(self):
        self.backbone_m = build_submodule(self.backbone, BACKBONES, self.dtype,
                                          "backbone")
        if self.shared_head is not None:
            self.shared_head_m = build_submodule(self.shared_head, SHARED_HEADS,
                                                 self.dtype, "shared_head")
        self.rpn_head_m = build_submodule(self.rpn_head, HEADS, self.dtype,
                                          "rpn_head")
        self.bbox_head_m = build_submodule(self.bbox_head, HEADS, self.dtype,
                                           "bbox_head")

    # ------------------------------------------------------------ per-stage
    def extract_feat(self, img: jnp.ndarray) -> jnp.ndarray:
        """img (B, H, W, 3) → C4 feature map (B, H/16, W/16, 1024)."""
        return self.backbone_m(img.astype(self.dtype))[0]

    def shared(self, c4: jnp.ndarray) -> jnp.ndarray:
        """C4 → C5 (dilated stage-4 + external 1×1→256)."""
        return self.shared_head_m(c4)

    def rpn(self, c4: jnp.ndarray):
        """C4 → (cls logits, reg deltas) maps."""
        return self.rpn_head_m(c4)

    def bbox_precompute_fc1(self, pooled: jnp.ndarray) -> jnp.ndarray:
        return self.bbox_head_m.precompute_fc1(pooled)

    def bbox_forward_fc1(self, fc1, cur_start: int, cur_len: int,
                         valid_mask=None, **kw):
        return self.bbox_head_m.forward_fc1(fc1, cur_start, cur_len,
                                            valid_mask, **kw)

    def bbox_forward_fc1_multi_pass(self, fc1, pass_len: int, cur_start: int,
                                    cur_len: int, valid_mask=None):
        return self.bbox_head_m.forward_fc1_multi_passes(
            fc1, pass_len, cur_start, cur_len, valid_mask)

    def bbox_forward(self, pooled, *args, **kw):
        return self.bbox_head_m(pooled, *args, **kw)

    def bbox_stream_update(self, st, fc1_new, mask_new, slot,
                           rollback: bool = False):
        """Streaming sliding-window slide (hrnmp_bbox_head.stream_update)."""
        return self.bbox_head_m.stream_update(st, fc1_new, mask_new, slot,
                                              rollback=rollback)

    def bbox_stream_forward(self, st, center, rollback: bool = False):
        """Streaming sliding-window detect (hrnmp_bbox_head.stream_forward)."""
        return self.bbox_head_m.stream_forward(st, center, rollback=rollback)

    def bbox_stream_rebuild(self, st):
        """Exact accumulator rebuild (hrnmp_bbox_head.stream_rebuild) — the
        rollback protocol's recovery program."""
        return self.bbox_head_m.stream_rebuild(st)

    def bbox_forward_train_hrnmp(self, pooled, labels_key, valid_mask=None):
        return self.bbox_head_m.forward_train(pooled, labels_key, valid_mask)

    def __call__(self, img: jnp.ndarray):
        """Parameter-initialisation path: touch every submodule once."""
        c4 = self.extract_feat(img)
        rpn_out = self.rpn(c4)
        c5 = self.shared(c4) if self.shared_head is not None else c4
        n = 8  # tiny dummy RoI set just to create head params
        pooled = jnp.zeros((n, 7, 7, c5.shape[-1]), self.dtype)
        head_out = self.bbox_head_m(pooled, 0, n)
        return rpn_out, head_out
