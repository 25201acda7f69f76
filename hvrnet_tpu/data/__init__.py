from .pipelines import Compose, build_transform
from .vid_dataset import (DATASETS, ConcatDataset, DETSeqDataset,
                          RepeatDataset, VIDSeqDataset, VID_CLASSES,
                          VID_WNIDS, build_dataset)

__all__ = [
    "Compose", "build_transform", "DATASETS", "VIDSeqDataset",
    "DETSeqDataset", "ConcatDataset", "RepeatDataset", "build_dataset",
    "VID_CLASSES", "VID_WNIDS",
]
