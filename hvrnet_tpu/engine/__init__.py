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

# trainers are imported lazily by tools/train.py; exported here for API parity
from .train import HNMBTrainer, SelsaTrainer, TrainState  # noqa: E402
from .train_two_stage import TwoStageTrainer  # noqa: E402
from .train_single_stage import FreeAnchorTrainer, RetinaTrainer  # noqa: E402
from .train_guided_anchor import GATrainer  # noqa: E402
from .train_fcos import FCOSTrainer, FoveaTrainer  # noqa: E402
from .train_reppoints import RepPointsTrainer  # noqa: E402

__all__ += [
    "SelsaTrainer", "HNMBTrainer", "TrainState", "TwoStageTrainer",
    "RetinaTrainer", "FreeAnchorTrainer", "GATrainer", "FCOSTrainer",
    "FoveaTrainer", "RepPointsTrainer",
]
