"""VID dataset end-to-end on a synthetic on-disk mini-dataset: XML parsing,
test-mode iterator semantics (flags/offsets/sharding), train-mode triplet
sampling, and the full inference→eval path with random weights."""
import os
import os.path as osp
import xml.etree.ElementTree as ET

import cv2
import numpy as np
import pytest

from hvrnet_tpu.data import VIDSeqDataset, build_dataset

TEST_PIPELINE = [
    dict(type='LoadImageFromFile'),
    dict(type='Resize', img_scale=(96, 64), keep_ratio=True),
    dict(type='RandomFlip', flip_ratio=0),
    dict(type='Normalize', mean=[103.06, 115.90, 123.15], std=[1.0, 1.0, 1.0],
         to_rgb=False),
    dict(type='Pad', size_divisor=16),
    dict(type='Collect', keys=['img']),
]

TRAIN_PIPELINE = [
    dict(type='LoadImageFromFile', to_float32=True),
    dict(type='LoadAnnotations', with_bbox=True),
    dict(type='Resize', img_scale=(96, 64), keep_ratio=True),
    dict(type='RandomFlip', flip_ratio=0.5),
    dict(type='Normalize', mean=[103.06, 115.90, 123.15], std=[1.0, 1.0, 1.0],
         to_rgb=False),
    dict(type='Pad', size_divisor=16),
    dict(type='Collect', keys=['img', 'gt_bboxes', 'gt_labels']),
]


def write_xml(path, w, h, objs):
    root = ET.Element("annotation")
    size = ET.SubElement(root, "size")
    ET.SubElement(size, "width").text = str(w)
    ET.SubElement(size, "height").text = str(h)
    for name, box in objs:
        obj = ET.SubElement(root, "object")
        ET.SubElement(obj, "name").text = name
        bnd = ET.SubElement(obj, "bndbox")
        for k, v in zip(("xmin", "ymin", "xmax", "ymax"), box):
            ET.SubElement(bnd, k).text = str(v)
    os.makedirs(osp.dirname(path), exist_ok=True)
    ET.ElementTree(root).write(path)


def build_mini_vid(root, videos):
    """Write a tiny on-disk VID tree: JPEGs + XMLs + val imageset for the
    given ``[(video_path, n_frames, wnid), ...]``, one moving box each."""
    lines = []
    frame_id = 1
    rng = np.random.default_rng(0)
    for vpath, n, wnid in videos:
        for i in range(n):
            img = rng.integers(0, 255, (48, 72, 3)).astype(np.uint8)
            box = (10 + 2 * i, 8, 40 + 2 * i, 32)
            img[box[1]:box[3], box[0]:box[2]] = (250, 30, 30)
            ipath = osp.join(root, "JPEGImages", vpath, f"{i:06d}.JPEG")
            os.makedirs(osp.dirname(ipath), exist_ok=True)
            cv2.imwrite(ipath, img)
            write_xml(osp.join(root, "Annotations", vpath, f"{i:06d}.xml"),
                      72, 48, [(wnid, box)])
        lines.append(f"{vpath} {frame_id} 0 {n}")
        frame_id += n
    os.makedirs(osp.join(root, "ImageSets"), exist_ok=True)
    ann_file = osp.join(root, "ImageSets", "VID_val_videos.txt")
    with open(ann_file, "w") as f:
        f.write("\n".join(lines) + "\n")
    # train imageset: one key frame per video
    train_file = osp.join(root, "ImageSets", "VID_train_15frames.txt")
    with open(train_file, "w") as f:
        f.write("\n".join(f"{vpath} 1 {max(n // 2, 1)} {n}"
                          for vpath, n, _ in videos) + "\n")
    return root


@pytest.fixture(scope="module")
def mini_vid(tmp_path_factory):
    """Two tiny videos (5 and 3 frames) with one moving box each."""
    root = str(tmp_path_factory.mktemp("VID"))
    wnids = ["n02691156", "n02958343"]  # airplane, car
    return build_mini_vid(root, [("val/ILSVRC2015_val_00000000", 5, wnids[0]),
                                 ("val/ILSVRC2015_val_00000001", 3, wnids[1])])


def test_test_iterator_flags_and_offsets(mini_vid):
    ds = VIDSeqDataset(ann_file=osp.join(mini_vid, "ImageSets/VID_val_videos.txt"),
                       img_prefix=mini_vid, pipeline=TEST_PIPELINE,
                       test_mode=True, world_size=1, video_shuffle=True)
    assert len(ds) == 8
    flags, offsets = [], []
    for i in range(len(ds)):
        item = ds[i]
        flags.append(item["img_meta"]["key_frame_flag"])
        offsets.append(item["img_meta"]["frame_offset"])
    # flag pattern: video starts at 0 and 5; last frames flagged 1
    assert flags[0] == 0 and flags[5] == 0
    assert flags[4] == 1 and flags[7] == 1
    assert all(f == 2 for f in (flags[1], flags[2], flags[3], flags[6]))
    # shuffled offsets cover each video exactly once
    assert sorted(offsets[:5]) == list(range(5))
    assert sorted(offsets[5:]) == list(range(3))


def test_video_sharding_rebases_frame_ids(mini_vid):
    ds = VIDSeqDataset(ann_file=osp.join(mini_vid, "ImageSets/VID_val_videos.txt"),
                       img_prefix=mini_vid, pipeline=TEST_PIPELINE,
                       test_mode=True, world_size=2)
    # reference get_indices semantics (imagenet_vid_sequence.py:117-158):
    # avg = ceil(8/2) = 4; the 5-frame first video exceeds it, so the greedy
    # packer advances to rank 1 immediately and both videos land there.
    assert ds.local_frame_size_list == [0, 8]
    assert ds.img_infos[0]["frame_id"] == 1
    assert ds.img_infos[1]["frame_id"] == 6


def test_stateful_gt_iterator_matches_frames(mini_vid):
    ds = VIDSeqDataset(ann_file=osp.join(mini_vid, "ImageSets/VID_val_videos.txt"),
                       img_prefix=mini_vid, pipeline=TEST_PIPELINE,
                       test_mode=True, world_size=1)
    anns = [ds.get_ann_info(i) for i in range(len(ds))]
    # frame 2 of video 0 has the box at x1=10+2*2-1 (xml −1 convention)
    np.testing.assert_allclose(anns[2]["bboxes"][0][0], 13.0)
    assert anns[5]["labels"][0] == 7  # car = wnid idx 7 (1-based)


def test_train_triplet_frames(mini_vid):
    ds = VIDSeqDataset(ann_file=osp.join(mini_vid, "ImageSets/VID_train_15frames.txt"),
                       img_prefix=mini_vid, pipeline=TRAIN_PIPELINE,
                       selsa_with_aug=True)
    frames = ds[0]
    assert len(frames) == 3  # key + 2 condition frames
    for fr in frames:
        assert fr["img"].shape[2] == 3
        assert fr["gt_bboxes"].shape[1] == 4
        assert len(fr["gt_labels"]) == len(fr["gt_bboxes"])
    # flip synchronization: condition frames share the key frame's flip
    key_flip = frames[0]["img_meta"]["flip"]
    assert frames[1]["img_meta"]["flip"] == key_flip
    assert frames[2]["img_meta"]["flip"] == key_flip


def test_end_to_end_mini_inference_and_eval(mini_vid):
    """Random-weight SELSA over the mini dataset → vid_eval runs end to end."""
    import jax
    from hvrnet_tpu.engine import SelsaRCNN, SlidingWindowRunner
    from hvrnet_tpu.engine.stream import test_frame_stream
    from hvrnet_tpu.core.evaluation import eval_map
    import sys
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from tests.test_engine_selsa import tiny_selsa_cfg

    model_cfg, test_cfg = tiny_selsa_cfg(window_interval=1, proposals=8)
    engine = SelsaRCNN(model_cfg, None, test_cfg)
    params = engine.init_params(jax.random.PRNGKey(0))
    ds = VIDSeqDataset(ann_file=osp.join(mini_vid, "ImageSets/VID_val_videos.txt"),
                       img_prefix=mini_vid, pipeline=TEST_PIPELINE,
                       test_mode=True, world_size=1)
    runner = SlidingWindowRunner(engine, params)
    results = runner.run(
        test_frame_stream(ds, rank=0, max_long=96, max_short=64),
        num_frames=len(ds))
    assert all(r is not None for r in results)

    ds2 = VIDSeqDataset(ann_file=osp.join(mini_vid, "ImageSets/VID_val_videos.txt"),
                        img_prefix=mini_vid, pipeline=TEST_PIPELINE,
                        test_mode=True, world_size=1)
    gt_bboxes = []
    gt_labels = []
    for i in range(len(ds2)):
        ann = ds2.get_ann_info(i)
        gt_bboxes.append(ann["bboxes"])
        gt_labels.append(ann["labels"])
    mean_ap, _ = eval_map(results, gt_bboxes, gt_labels, print_summary=False)
    assert 0.0 <= mean_ap <= 1.0
