from .mean_ap import (analysis_map, average_precision, bbox_overlaps_np,
                      eval_map, print_map_summary, tpfp_analysis, tpfp_default,
                      tpfp_imagenet)
from .recall import eval_recalls

__all__ = [
    "average_precision", "eval_map", "print_map_summary", "tpfp_default",
    "tpfp_imagenet", "tpfp_analysis", "analysis_map", "bbox_overlaps_np",
    "eval_recalls",
]
