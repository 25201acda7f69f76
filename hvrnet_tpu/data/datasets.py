"""Still-image datasets for zoo parity (reference `mmdet/datasets/`):
CustomDataset/XMLDataset base behaviour (custom.py, xml_style.py),
VOCDataset (voc.py), CocoDataset (coco.py), WIDERFaceDataset (wider_face.py),
CityscapesDataset (cityscapes.py), VIDDataset (imagenet_vid.py) and
DETIMGDataset (imagenet_det_img.py) single-frame variants.
"""
from __future__ import annotations

import json
import os.path as osp
import xml.etree.ElementTree as ET
from typing import Dict, List, Optional, Sequence

import numpy as np

from .pipelines import Compose
from .vid_dataset import DATASETS, VID_WNIDS, list_from_file, parse_vid_xml


class CustomDataset:
    """Annotation-list dataset with aspect-ratio group flags
    (reference custom.py:13-143)."""

    CLASSES: Sequence[str] = ()

    def __init__(self, ann_file: str, img_prefix: str, pipeline: Sequence,
                 test_mode: bool = False, proposal_file: Optional[str] = None,
                 min_size: Optional[int] = None, **kwargs):
        self.ann_file = ann_file
        self.img_prefix = img_prefix
        self.test_mode = test_mode
        self.min_size = min_size
        self.proposals = None
        self.pipeline = Compose(pipeline)
        self.img_infos = self.load_annotations(ann_file)
        if not test_mode:
            self._set_group_flag()

    def load_annotations(self, ann_file: str) -> List[Dict]:
        raise NotImplementedError

    def get_ann_info(self, idx: int) -> Dict:
        raise NotImplementedError

    def _set_group_flag(self):
        self.flag = np.zeros(len(self.img_infos), np.uint8)
        for i, info in enumerate(self.img_infos):
            if info["width"] / info["height"] > 1:
                self.flag[i] = 1

    def pre_pipeline(self, results: Dict):
        results["img_prefix"] = self.img_prefix
        results["bbox_fields"] = []

    def _rand_another(self, idx):
        return int(np.random.randint(len(self)))

    def __len__(self):
        return len(self.img_infos)

    def __getitem__(self, idx):
        if self.test_mode:
            results = dict(img_info=self.img_infos[idx])
            self.pre_pipeline(results)
            return self.pipeline(results)
        while True:
            results = dict(img_info=self.img_infos[idx],
                           ann_info=self.get_ann_info(idx))
            self.pre_pipeline(results)
            data = self.pipeline(results)
            if data is None or (len(data.get("gt_bboxes", [1])) == 0):
                idx = self._rand_another(idx)
                continue
            return data


@DATASETS.register_module
class XMLDataset(CustomDataset):
    """VOC-style XML annotations (reference xml_style.py:12-80)."""

    def __init__(self, **kwargs):
        super().__init__(**kwargs)
        self.cat2label = {c: i + 1 for i, c in enumerate(self.CLASSES)}

    def load_annotations(self, ann_file):
        img_infos = []
        for img_id in list_from_file(ann_file):
            img_id = img_id.strip().split(" ")[0]
            xml_path = osp.join(self.img_prefix, "Annotations", img_id + ".xml")
            tree = ET.parse(xml_path)
            size = tree.getroot().find("size")
            img_infos.append(dict(
                id=img_id, filename=f"JPEGImages/{img_id}.jpg",
                width=int(size.find("width").text),
                height=int(size.find("height").text)))
        return img_infos

    def get_ann_info(self, idx):
        img_id = self.img_infos[idx]["id"]
        xml_path = osp.join(self.img_prefix, "Annotations", img_id + ".xml")
        class_to_index = {c: i + 1 for i, c in enumerate(self.CLASSES)}
        ann, _, _ = parse_vid_xml(xml_path, class_to_index)
        return ann


@DATASETS.register_module
class VOCDataset(XMLDataset):
    CLASSES = ("aeroplane", "bicycle", "bird", "boat", "bottle", "bus", "car",
               "cat", "chair", "cow", "diningtable", "dog", "horse",
               "motorbike", "person", "pottedplant", "sheep", "sofa", "train",
               "tvmonitor")

    def __init__(self, **kwargs):
        super().__init__(**kwargs)
        if "VOC2007" in self.img_prefix:
            self.year = 2007
        elif "VOC2012" in self.img_prefix:
            self.year = 2012
        else:
            self.year = None


@DATASETS.register_module
class WIDERFaceDataset(XMLDataset):
    CLASSES = ("face",)


@DATASETS.register_module
class CocoDataset(CustomDataset):
    """COCO-json annotations without pycocotools (reference coco.py)."""

    CLASSES = ()

    def load_annotations(self, ann_file):
        with open(ann_file) as f:
            coco = json.load(f)
        self.cat_ids = [c["id"] for c in coco.get("categories", [])]
        self.cat2label = {cid: i + 1 for i, cid in enumerate(self.cat_ids)}
        if not self.CLASSES:
            self.CLASSES = tuple(c["name"] for c in coco.get("categories", []))
        self._anns_by_img: Dict[int, list] = {}
        for a in coco.get("annotations", []):
            self._anns_by_img.setdefault(a["image_id"], []).append(a)
        img_infos = []
        for img in coco.get("images", []):
            img_infos.append(dict(id=img["id"], filename=img["file_name"],
                                  width=img["width"], height=img["height"]))
        return img_infos

    def get_ann_info(self, idx):
        info = self.img_infos[idx]
        anns = self._anns_by_img.get(info["id"], [])
        bboxes, labels = [], []
        bboxes_ignore = []
        for a in anns:
            if a.get("iscrowd", 0):
                x, y, w, h = a["bbox"]
                bboxes_ignore.append([x, y, x + w - 1, y + h - 1])
                continue
            x, y, w, h = a["bbox"]
            if w < 1 or h < 1:
                continue
            bboxes.append([x, y, x + w - 1, y + h - 1])
            labels.append(self.cat2label[a["category_id"]])
        to_np = lambda lst, shape: (np.asarray(lst, np.float32)
                                    if lst else np.zeros(shape, np.float32))
        return dict(bboxes=to_np(bboxes, (0, 4)),
                    labels=np.asarray(labels, np.int64) if labels
                    else np.zeros((0,), np.int64),
                    bboxes_ignore=to_np(bboxes_ignore, (0, 4)),
                    labels_ignore=np.zeros((len(bboxes_ignore),), np.int64))


@DATASETS.register_module
class CityscapesDataset(CocoDataset):
    CLASSES = ("person", "rider", "car", "truck", "bus", "train",
               "motorcycle", "bicycle")


@DATASETS.register_module
class VIDDataset(XMLDataset):
    """Single-frame ImageNet-VID (reference imagenet_vid.py)."""
    CLASSES = VID_WNIDS

    def load_annotations(self, ann_file):
        img_infos = []
        for raw in list_from_file(ann_file):
            parts = raw.strip().split(" ")
            img_id = parts[0] if len(parts) < 3 else "%s/%06d" % (parts[0], int(parts[2]))
            xml_path = osp.join(self.img_prefix, "Annotations", img_id + ".xml")
            tree = ET.parse(xml_path)
            size = tree.getroot().find("size")
            img_infos.append(dict(
                id=img_id, filename=f"JPEGImages/{img_id}.JPEG",
                width=int(size.find("width").text),
                height=int(size.find("height").text)))
        return img_infos


@DATASETS.register_module
class DETIMGDataset(VIDDataset):
    """Single-frame ImageNet-DET (reference imagenet_det_img.py)."""
