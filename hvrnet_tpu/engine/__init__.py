from .canvas import Canvas, get_canvas, pad_to_canvas, pick_canvas_shape
from .detector import (BaseEngine, FasterRCNN, FastRCNN, HNLRCNN, HNMBRCNN,
                       SelsaRCNN)
from .video_runner import SlidingWindowRunner

__all__ = [
    "Canvas", "get_canvas", "pad_to_canvas", "pick_canvas_shape",
    "BaseEngine", "SelsaRCNN", "HNMBRCNN", "HNLRCNN", "FasterRCNN",
    "FastRCNN", "SlidingWindowRunner",
]
from .batched_runner import BatchedSlidingWindowRunner, make_window_schedule  # noqa: E402

__all__ += ["BatchedSlidingWindowRunner", "make_window_schedule"]
