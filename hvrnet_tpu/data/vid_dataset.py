"""ImageNet VID / DET sequence datasets (host side).

Behavioural re-implementation of
`/root/reference/mmdet/datasets/imagenet_vid_sequence.py` (453 LoC) and
`imagenet_det_sequence.py`:

  * 30-class VID label space (WordNet ids ↔ names);
  * imageset files with 4 fields per line: video-path frame_id frame_seg_id
    frame_seg_len (load_annotations:402-425);
  * TRAIN: each index yields `3 × (1 + extra_cls × video_per_cls)` pipelined
    frames — a key frame plus two condition frames at random offsets in
    ±1000 clamped to the segment, with re-draw of empty-annotation frames
    (prepare_train_img:312-371), and flip-synchronized condition pipelines
    (get_condition_pipeline:249-279); with ``hnl=True`` the triplet-video
    sampler adds same-class and extra-class videos (sample_videos:164-183);
  * TEST: a stateful sequential iterator over whole videos emitting
    key_frame_flag (0 start / 2 interior / 1 end), frame_offset and seg_len,
    with optional per-video frame shuffling (prepare_test_img:192-243),
    and whole-video sharding across ranks with per-rank frame_id rebasing
    (get_indices:117-158).
"""
from __future__ import annotations

import copy
import os.path as osp
import random
import xml.etree.ElementTree as ET
from typing import Dict, List, Optional, Sequence

import numpy as np

from ..utils.registry import Registry, build_from_cfg
from .pipelines import Compose

DATASETS = Registry("dataset")

VID_WNIDS = (
    "n02691156", "n02419796", "n02131653", "n02834778", "n01503061",
    "n02924116", "n02958343", "n02402425", "n02084071", "n02121808",
    "n02503517", "n02118333", "n02510455", "n02342885", "n02374451",
    "n02129165", "n01674464", "n02484322", "n03790512", "n02324045",
    "n02509815", "n02411705", "n01726692", "n02355227", "n02129604",
    "n04468005", "n01662784", "n04530566", "n02062744", "n02391049")

VID_CLASSES = (
    "airplane", "antelope", "bear", "bicycle", "bird", "bus", "car",
    "cattle", "dog", "domestic_cat", "elephant", "fox", "giant_panda",
    "hamster", "horse", "lion", "lizard", "monkey", "motorcycle", "rabbit",
    "red_panda", "sheep", "snake", "squirrel", "tiger", "train", "turtle",
    "watercraft", "whale", "zebra")


def list_from_file(path: str) -> List[str]:
    with open(path) as f:
        return [line.rstrip("\n") for line in f if line.strip()]


def parse_vid_xml(xml_path: str, class_to_index: Dict[str, int]):
    """VOC-style XML → ann dict; boxes −1 to 0-based, labels 1-based
    (reference custom.py:164-214).

    Uses the native C++ scanner (`native/libvidmeta.so`, ~10× faster on the
    176k-frame VID val GT pass) when available; ElementTree otherwise.
    """
    from .native import parse_xml_fast
    fast = parse_xml_fast(xml_path, class_to_index)
    if fast is not None:
        return fast
    tree = ET.parse(xml_path)
    root = tree.getroot()
    size = root.find("size")
    width = int(size.find("width").text)
    height = int(size.find("height").text)
    bboxes, labels = [], []
    for obj in root.findall("object"):
        name = obj.find("name").text
        if name not in class_to_index:
            continue
        bnd = obj.find("bndbox")
        bboxes.append([int(bnd.find("xmin").text), int(bnd.find("ymin").text),
                       int(bnd.find("xmax").text), int(bnd.find("ymax").text)])
        labels.append(class_to_index[name])
    if bboxes:
        bboxes_np = np.asarray(bboxes, np.float32) - 1
        labels_np = np.asarray(labels, np.int64)
    else:
        bboxes_np = np.zeros((0, 4), np.float32)
        labels_np = np.zeros((0,), np.int64)
    ann = dict(bboxes=bboxes_np, labels=labels_np,
               bboxes_ignore=np.zeros((0, 4), np.float32),
               labels_ignore=np.zeros((0,), np.int64))
    return ann, (width, height), len(bboxes)


@DATASETS.register_module
class VIDSeqDataset:
    CLASSES = VID_WNIDS
    MIN_OFFSET = -1000
    MAX_OFFSET = 1000

    def __init__(self, ann_file: str, img_prefix: str, pipeline: Sequence,
                 test_mode: bool = False, world_size: int = 1,
                 hnl: bool = False, selsa_with_aug: bool = False,
                 condition_random_flip: bool = False,
                 shuffle: bool = False, video_shuffle: bool = True,
                 has_rpn: bool = True, frame_interval: int = 0,
                 cls_map_dir: Optional[str] = None, **kwargs):
        self.ann_file = ann_file
        self.img_prefix = img_prefix
        self.pipeline_cfg = [dict(t) for t in pipeline]
        self.pipeline = Compose(self.pipeline_cfg)
        self.test_mode = test_mode
        self.selsa_with_aug = selsa_with_aug
        self.condition_random_flip = condition_random_flip
        self.classes = VID_CLASSES
        self.class_map = ("__background__",) + VID_WNIDS
        self.class_to_index = {c: i for i, c in enumerate(self.class_map)}
        self.extra_cls = 2 if hnl else 0
        self.video_per_cls = 3 if hnl else 1
        self.cls_map_dir = cls_map_dir or osp.join(img_prefix, "ImageSets")

        self.img_infos = self.load_annotations(ann_file)
        self._get_video2idx()
        if self.extra_cls:
            self._get_cls2video()

        self.slices_set = False
        if test_mode:
            self.slices_set = True
            self.shuffle = shuffle
            self.video_shuffle = video_shuffle
            self.has_rpn = has_rpn
            self.size = sum(v["frame_seg_len"] for v in self.img_infos)
            self.cur_tid = 0
            self.cur_video_index = 0
            self.key_frame_flag = 0
            self.get_indices(world_size)
        else:
            self._set_group_flag()

    # ------------------------------------------------------------- loading
    def load_annotations(self, ann_file: str) -> List[Dict]:
        """4-field imageset lines (reference load_annotations:402-425)."""
        img_infos = []
        for raw in list_from_file(ann_file):
            parts = raw.strip().split(" ")
            assert len(parts) == 4, "VIDSeq imageset lines need 4 fields"
            video_path, frame_id, seg_id, seg_len = (
                parts[0], int(parts[1]), int(parts[2]), int(parts[3]))
            image_id = "%s/%06d" % (video_path, seg_id)
            xml_path = osp.join(self.img_prefix, "Annotations", image_id + ".xml")
            tree = ET.parse(xml_path)
            size = tree.getroot().find("size")
            img_infos.append(dict(
                id=image_id,
                filename=f"JPEGImages/{image_id}.JPEG",
                width=int(size.find("width").text),
                height=int(size.find("height").text),
                num_annos=len(tree.getroot().findall("object")),
                pattern=video_path + "/%06d",
                frame_id=frame_id,
                frame_seg_id=seg_id,
                frame_seg_len=seg_len))
        return img_infos

    def _set_group_flag(self):
        self.flag = np.zeros(len(self.img_infos), np.uint8)
        for i, info in enumerate(self.img_infos):
            if info["width"] / info["height"] > 1:
                self.flag[i] = 1

    def _get_video2idx(self):
        video2idx: Dict[str, List[int]] = {}
        idx2video: Dict[int, str] = {}
        for i, info in enumerate(self.img_infos):
            vid = info["pattern"].split("/")[-2]
            video2idx.setdefault(vid, []).append(i)
            idx2video[i] = vid
        self.video_2_idx = video2idx
        self.idx_2_video = idx2video

    def _get_cls2video(self):
        """class ↔ video maps from ImageSets/VID/train_<cls>.txt lists
        (reference get_cls2video:100-114; path made configurable)."""
        video2cls: Dict[str, int] = {}
        cls2video: List[List[str]] = []
        for i in range(len(self.class_map) - 1):
            cls2video.append([])
            path = osp.join(self.cls_map_dir, "VID", f"train_{i + 1}.txt")
            for line in list_from_file(path):
                vid = line.strip().split(" ")[0].strip().split("/")[-1]
                video2cls[vid] = i
                cls2video[i].append(vid)
        self.video_2_cls = video2cls
        self.cls_2_video = cls2video

    # ------------------------------------------------------------ sharding
    def get_indices(self, world_size: int):
        """Shard WHOLE videos across ranks; rebase per-rank frame ids
        (reference get_indices:117-158)."""
        avg = -(-self.size // world_size)
        indices_list = [[] for _ in range(world_size)]
        local_video_list = [[] for _ in range(world_size)]
        self.global_video_list: List[int] = []
        tmp_len, tmp_rank, pos, local_vid = 0, 0, 0, 0
        for i, info in enumerate(self.img_infos):
            n = info["frame_seg_len"]
            self.global_video_list.extend([i] * n)
            if tmp_len + n > avg and tmp_rank != world_size - 1:
                tmp_rank += 1
                local_vid = 0
                tmp_len = 0
            base = sum(len(l) for l in local_video_list[:tmp_rank])
            self.img_infos[i]["frame_id"] -= 0 if tmp_rank == 0 else base
            indices_list[tmp_rank].extend(list(np.arange(n) + pos))
            local_video_list[tmp_rank].extend([local_vid] * n)
            local_vid += 1
            tmp_len += n
            pos += n
        self.indices_list = indices_list
        self.local_video_list = local_video_list
        self.local_frame_size_list = [len(x) for x in indices_list]
        self.global_video_size_list = [len(np.unique(x)) if x else 0
                                       for x in local_video_list]
        return indices_list

    # ------------------------------------------------------------- lengths
    def __len__(self):
        return self.size if self.test_mode else len(self.img_infos)

    # ------------------------------------------------- train-side sampling
    def sample_videos(self, idx: int, extra_cls_num: int = 0,
                      video_per_cls: int = 1) -> List[int]:
        """Triplet-video sampling (reference sample_videos:164-183)."""
        sampled = [idx]
        if extra_cls_num:
            vid = self.idx_2_video[idx]
            cls = self.video_2_cls[vid]
            same = [v for v in self.cls_2_video[cls] if v != vid]
            for v in random.sample(same, video_per_cls - 1):
                sampled.extend(random.sample(self.video_2_idx[v], 1))
            other_cls = [c for c in range(len(self.class_map) - 1) if c != cls]
            for c in random.sample(other_cls, extra_cls_num):
                for v in random.sample(self.cls_2_video[c], video_per_cls):
                    sampled.extend(random.sample(self.video_2_idx[v], 1))
        return sampled

    def get_ann_info(self, idx: int) -> Dict:
        if not self.test_mode:
            xml = osp.join(self.img_prefix, "Annotations",
                           self.img_infos[idx]["id"] + ".xml")
            ann, _, _ = parse_vid_xml(xml, self.class_to_index)
            return ann
        # stateful frame-order iterator (reference get_ann_info:429-453)
        self.cur_video_index = self.global_video_list[idx]
        info = self.img_infos[self.cur_video_index]
        seg_len = info["frame_seg_len"]
        offset = self.cur_tid
        xml = osp.join(self.img_prefix, "Annotations",
                       (info["pattern"] % offset) + ".xml")
        ann, _, _ = parse_vid_xml(xml, self.class_to_index)
        self.cur_tid += 1
        if self.cur_tid == seg_len:
            self.cur_video_index += 1
            self.cur_tid = 0
        return ann

    def _frame_info(self, video_info: Dict, seg_id: int, with_ann: bool):
        info = video_info.copy()
        image_id = video_info["pattern"] % seg_id
        info["id"] = image_id
        info["filename"] = f"JPEGImages/{image_id}.JPEG"
        info["frame_seg_id"] = seg_id
        ann, discard = None, False
        if with_ann:
            xml = osp.join(self.img_prefix, "Annotations", image_id + ".xml")
            ann, (w, h), n = parse_vid_xml(xml, self.class_to_index)
            info["width"], info["height"] = w, h
            discard = self.selsa_with_aug and n == 0
        return info, ann, discard

    def _condition_pipeline(self, key_flipped: bool) -> Compose:
        """Flip-synchronized condition pipeline (reference :249-279)."""
        cfg = []
        for t in self.pipeline_cfg:
            t = dict(t)
            if t.get("type") == "RandomFlip":
                t["flip_ratio"] = (0.5 if self.condition_random_flip
                                   else float(key_flipped))
            cfg.append(t)
        return Compose(cfg)

    def pre_pipeline(self, results: Dict):
        results["img_prefix"] = self.img_prefix
        results["bbox_fields"] = []

    def _rand_another(self, idx):
        return np.random.randint(len(self.img_infos))

    def prepare_train_img(self, idx: int, extra_cls: int = 0,
                          video_per_cls: int = 1) -> Optional[List[Dict]]:
        """Key + 2 condition frames per sampled video (reference :312-371)."""
        res_list = []
        for vid_idx in self.sample_videos(idx, extra_cls, video_per_cls):
            info = self.img_infos[vid_idx]
            ann = self.get_ann_info(vid_idx)
            results = dict(img_info=info, ann_info=ann)
            self.pre_pipeline(results)
            key_res = self.pipeline(results)
            if key_res is None:
                return None
            key_flipped = bool(key_res["img_meta"]["flip"])

            span = self.MAX_OFFSET - self.MIN_OFFSET + 1
            offsets = np.random.choice(span, 2, replace=False) + self.MIN_OFFSET
            ids = [int(np.clip(info["frame_seg_id"] + o, 0,
                               info["frame_seg_len"] - 1)) for o in offsets]
            con = [self._frame_info(info, i, with_ann=True) for i in ids]
            if ids[0] == ids[1] and self.selsa_with_aug:
                i = np.random.randint(0, 2)
                con[i] = (con[i][0], con[i][1], True)
            fixed = []
            for ci, (cinfo, cann, discard) in enumerate(con):
                while discard:   # re-draw empty-annotation frames (:337-349)
                    o = (np.random.choice(span, 2, replace=False)
                         + self.MIN_OFFSET)[ci]
                    nid = int(np.clip(info["frame_seg_id"] + o, 0,
                                      info["frame_seg_len"] - 1))
                    cinfo, cann, discard = self._frame_info(info, nid,
                                                            with_ann=True)
                fixed.append((cinfo, cann))

            pipe = self._condition_pipeline(key_flipped)
            for cinfo, cann in fixed:
                r = dict(img_info=cinfo,
                         ann_info=cann if self.selsa_with_aug else ann)
                self.pre_pipeline(r)
                out = pipe(r)
                if out is None:
                    return None
                res_list.append(out)
            res_list.insert(len(res_list) - 2, key_res)
        return res_list

    # ----------------------------------------------------------- test side
    def prepare_test_img(self, idx: int) -> Dict:
        """Stateful sequential frame iterator (reference :192-243)."""
        self.cur_video_index = self.global_video_list[idx]
        if self.cur_tid == 0:
            self.key_frame_flag = 0
            self.cur_video = self.img_infos[self.cur_video_index].copy()
            self.cur_seg_len = self.cur_video["frame_seg_len"]
            self.video_index = np.arange(self.cur_seg_len).tolist()
            if self.video_shuffle:
                np.random.shuffle(self.video_index)
        else:
            self.key_frame_flag = 2
        offset = (self.video_index[self.cur_tid] if self.video_shuffle
                  else self.cur_tid)
        finfo, _, _ = self._frame_info(self.cur_video, offset, with_ann=False)
        results = dict(img_info=finfo)
        self.pre_pipeline(results)
        out = self.pipeline(results)
        out["img_meta"].update(dict(
            frame_offset=offset,
            key_frame_flag=self.key_frame_flag,
            seg_len=self.cur_video["frame_seg_len"],
            frame_start_id=self.cur_video["frame_id"]))
        return out

    def __getitem__(self, idx: int):
        if self.test_mode:
            out = self.prepare_test_img(idx)
            self.cur_tid += 1
            if self.cur_tid == self.cur_seg_len:
                self.cur_video_index += 1
                self.cur_tid = 0
                self.key_frame_flag = 1
                out["img_meta"]["key_frame_flag"] = 1
            return out
        while True:
            data = self.prepare_train_img(idx, self.extra_cls,
                                          self.video_per_cls)
            if data is None:
                idx = self._rand_another(idx)
                continue
            return data


@DATASETS.register_module
class DETSeqDataset(VIDSeqDataset):
    """Still-image DET data behind the sequence interface: each image acts as
    a 1-frame pseudo-video duplicated into the condition slots
    (`/root/reference/mmdet/datasets/imagenet_det_sequence.py`)."""

    def load_annotations(self, ann_file: str) -> List[Dict]:
        img_infos = []
        for raw in list_from_file(ann_file):
            parts = raw.strip().split(" ")
            image_id = parts[0]
            xml_path = osp.join(self.img_prefix, "Annotations", image_id + ".xml")
            tree = ET.parse(xml_path)
            size = tree.getroot().find("size")
            img_infos.append(dict(
                id=image_id,
                filename=f"JPEGImages/{image_id}.JPEG",
                width=int(size.find("width").text),
                height=int(size.find("height").text),
                num_annos=len(tree.getroot().findall("object")),
                pattern=image_id + "%.0s",   # pattern % i == image_id
                frame_id=1,
                frame_seg_id=0,
                frame_seg_len=1))
        return img_infos

    def _get_cls2video(self):
        # DET images play no part in triplet-video mining
        self.video_2_cls = {}
        self.cls_2_video = [[] for _ in range(len(self.class_map) - 1)]


def build_dataset(cfg, default_args=None):
    """`/root/reference/mmdet/datasets/builder.py:30` — list → concat."""
    if isinstance(cfg, (list, tuple)):
        return ConcatDataset([build_dataset(c, default_args) for c in cfg])
    return build_from_cfg(cfg, DATASETS, default_args)


class ConcatDataset:
    """dataset_wrappers.py Concat equivalent (train only)."""

    def __init__(self, datasets):
        self.datasets = list(datasets)
        self.cumulative_sizes = np.cumsum([len(d) for d in self.datasets])
        if all(hasattr(d, "flag") for d in self.datasets):
            self.flag = np.concatenate([d.flag for d in self.datasets])

    def __len__(self):
        return int(self.cumulative_sizes[-1])

    def __getitem__(self, idx):
        ds = int(np.searchsorted(self.cumulative_sizes, idx, side="right"))
        base = 0 if ds == 0 else int(self.cumulative_sizes[ds - 1])
        return self.datasets[ds][idx - base]


class RepeatDataset:
    def __init__(self, dataset, times):
        self.dataset = dataset
        self.times = times
        if hasattr(dataset, "flag"):
            self.flag = np.tile(dataset.flag, times)

    def __len__(self):
        return self.times * len(self.dataset)

    def __getitem__(self, idx):
        return self.dataset[idx % len(self.dataset)]
