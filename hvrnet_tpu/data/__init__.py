from .pipelines import Compose, build_transform
from .vid_dataset import (DATASETS, ConcatDataset, DETSeqDataset,
                          RepeatDataset, VIDSeqDataset, VID_CLASSES,
                          VID_WNIDS, build_dataset)
from .datasets import (CityscapesDataset, CocoDataset, CustomDataset,
                       DETIMGDataset, VIDDataset, VOCDataset,
                       WIDERFaceDataset, XMLDataset)
from .loader import (DistributedGroupSampler, DistributedSampler,
                     GroupSampler, PrefetchLoader, build_dataloader)

__all__ = [
    "Compose", "build_transform", "DATASETS", "VIDSeqDataset",
    "DETSeqDataset", "ConcatDataset", "RepeatDataset", "build_dataset",
    "VID_CLASSES", "VID_WNIDS", "CustomDataset", "XMLDataset", "VOCDataset",
    "CocoDataset", "CityscapesDataset", "WIDERFaceDataset", "VIDDataset",
    "DETIMGDataset", "GroupSampler", "DistributedGroupSampler",
    "DistributedSampler", "PrefetchLoader", "build_dataloader",
]
