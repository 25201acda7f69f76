"""Builders (reference `/root/reference/mmdet/models/builder.py`).

``build_detector`` returns an engine-level detector wrapper (holding the flax
parameter module, the RoI extractor and the train/test cfgs) chosen by the
config's ``type`` — SelsaRCNN / HNMBRCNN / HNLRCNN / FasterRCNN.
"""
from __future__ import annotations

from typing import Any, Dict, Optional

import jax.numpy as jnp

from ..utils.config import unwrap
from .registry import DETECTORS
from .roi_extractor import SingleRoIExtractor
from .two_stage import TwoStageModule


def build_roi_extractor(cfg: Dict[str, Any]) -> SingleRoIExtractor:
    cfg = dict(unwrap(cfg))
    cfg.pop("type", None)
    return SingleRoIExtractor(**cfg)


def build_model_module(model_cfg: Dict[str, Any], dtype=jnp.float32) -> TwoStageModule:
    m = unwrap(model_cfg)
    return TwoStageModule(
        backbone=m["backbone"],
        rpn_head=m["rpn_head"],
        bbox_head=m["bbox_head"],
        shared_head=m.get("shared_head"),
        neck=m.get("neck"),
        dtype=dtype,
    )


def build_detector(model_cfg: Dict[str, Any], train_cfg=None, test_cfg=None,
                   dtype=jnp.float32):
    # engine classes register on import; pull them all in so a config-driven
    # caller (tools/*, apis.init_detector) sees the full zoo (lazy to avoid
    # an import cycle: engine modules import models.builder)
    from ..engine import detector as _det            # noqa: F401
    from ..engine import multi_stage as _ms          # noqa: F401
    from ..engine import single_stage as _ss         # noqa: F401
    det_type = model_cfg["type"]
    cls = DETECTORS.get(det_type)
    if cls is None:
        raise KeyError(f"detector type {det_type} is not registered")
    return cls(unwrap(model_cfg), unwrap(train_cfg) if train_cfg else None,
               unwrap(test_cfg) if test_cfg else None, dtype=dtype)
