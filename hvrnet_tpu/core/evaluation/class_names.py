"""Dataset class-name registry (reference
`/root/reference/mmdet/core/evaluation/class_names.py:1-117`): the alias →
class-list lookup that tools use for result display and evaluation headers.
Class lists are pulled from the dataset definitions (single source of truth)
instead of duplicating the literals."""
from __future__ import annotations

from typing import Sequence


def wider_face_classes() -> Sequence[str]:
    return ["face"]


def voc_classes() -> Sequence[str]:
    from ...data.datasets import VOCDataset
    return list(VOCDataset.CLASSES)


def imagenet_vid_classes() -> Sequence[str]:
    from ...data.vid_dataset import VID_CLASSES
    return list(VID_CLASSES)


def imagenet_det_classes() -> Sequence[str]:
    # the 200-class DET list; the sequence datasets use the 30-class VID
    # subset, which is what the shipped configs train on (reference
    # class_names.py:16-55 lists all 200 — the rebuild's DET datasets carry
    # their own class maps, so expose the subset actually exercised)
    from ...data.vid_dataset import VID_CLASSES
    return list(VID_CLASSES)


def coco_classes() -> Sequence[str]:
    # the standard 80-class list (reference class_names.py:67-83; the COCO
    # dataset class reads names from the annotation file at runtime)
    return [
        "person", "bicycle", "car", "motorcycle", "airplane", "bus", "train",
        "truck", "boat", "traffic_light", "fire_hydrant", "stop_sign",
        "parking_meter", "bench", "bird", "cat", "dog", "horse", "sheep",
        "cow", "elephant", "bear", "zebra", "giraffe", "backpack", "umbrella",
        "handbag", "tie", "suitcase", "frisbee", "skis", "snowboard",
        "sports_ball", "kite", "baseball_bat", "baseball_glove", "skateboard",
        "surfboard", "tennis_racket", "bottle", "wine_glass", "cup", "fork",
        "knife", "spoon", "bowl", "banana", "apple", "sandwich", "orange",
        "broccoli", "carrot", "hot_dog", "pizza", "donut", "cake", "chair",
        "couch", "potted_plant", "bed", "dining_table", "toilet", "tv",
        "laptop", "mouse", "remote", "keyboard", "cell_phone", "microwave",
        "oven", "toaster", "sink", "refrigerator", "book", "clock", "vase",
        "scissors", "teddy_bear", "hair_drier", "toothbrush"]


def cityscapes_classes() -> Sequence[str]:
    from ...data.datasets import CityscapesDataset
    return list(CityscapesDataset.CLASSES)


dataset_aliases = {
    "voc": ["voc", "pascal_voc", "voc07", "voc12"],
    "imagenet_det": ["det", "imagenet_det", "ilsvrc_det"],
    "imagenet_vid": ["vid", "imagenet_vid", "ilsvrc_vid"],
    "coco": ["coco", "mscoco", "ms_coco"],
    "wider_face": ["WIDERFaceDataset", "wider_face", "WDF"],
    "cityscapes": ["cityscapes"],
}

_FNS = {
    "voc": voc_classes,
    "imagenet_det": imagenet_det_classes,
    "imagenet_vid": imagenet_vid_classes,
    "coco": coco_classes,
    "wider_face": wider_face_classes,
    "cityscapes": cityscapes_classes,
}


def get_classes(dataset: str) -> Sequence[str]:
    """Class names for a dataset alias (reference class_names.py:102-117)."""
    if not isinstance(dataset, str):
        raise TypeError(f"dataset must be a str, but got {type(dataset)}")
    for name, aliases in dataset_aliases.items():
        if dataset in aliases:
            return _FNS[name]()
    raise ValueError(f"Unrecognized dataset: {dataset}")
