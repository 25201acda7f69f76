from .anchors import AnchorGenerator
from .boxes import (bbox2delta, bbox2result_np, bbox_flip, bbox_mapping,
                    bbox_mapping_back, bbox_overlaps, delta2bbox)
from .nms import multiclass_nms_static, nms, nms_static, soft_nms_static
from .roi_align import roi_align
from .roi_pool import roi_pool

__all__ = [
    "AnchorGenerator", "bbox2delta", "delta2bbox", "bbox_flip", "bbox_mapping",
    "bbox_mapping_back", "bbox_overlaps", "bbox2result_np", "nms", "nms_static",
    "soft_nms_static", "multiclass_nms_static", "roi_align", "roi_pool",
]
