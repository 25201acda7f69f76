"""Tool-level smoke tests on the mini fixture: vid_eval, cls_video_map,
analyze_logs, collect_env, robustness corruptions."""
import json
import os
import os.path as osp
import pickle
import subprocess
import sys

import numpy as np
import pytest

from tests.test_vid_dataset import mini_vid  # noqa: F401

REPO = osp.dirname(osp.dirname(osp.abspath(__file__)))


def make_results_pickle(mini_vid, path):  # noqa: F811
    """Perfect-detection results for the fixture's 8 frames."""
    from hvrnet_tpu.data import VIDSeqDataset
    from tests.test_vid_dataset import TEST_PIPELINE
    ds = VIDSeqDataset(ann_file=osp.join(mini_vid, "ImageSets/VID_val_videos.txt"),
                       img_prefix=mini_vid, pipeline=TEST_PIPELINE,
                       test_mode=True, world_size=1)
    results = []
    for i in range(len(ds)):
        ann = ds.get_ann_info(i)
        per_class = [np.zeros((0, 5), np.float32) for _ in range(30)]
        for box, lab in zip(ann["bboxes"], ann["labels"]):
            det = np.concatenate([box, [0.95]]).astype(np.float32)[None]
            c = int(lab) - 1
            per_class[c] = np.concatenate([per_class[c], det])
        results.append(per_class)
    with open(path, "wb") as f:
        pickle.dump(results, f)
    return path


def write_mini_config(mini_vid, path):  # noqa: F811
    cfg = f'''
data = dict(
    test=dict(type='VIDSeqDataset',
              ann_file='{mini_vid}/ImageSets/VID_val_videos.txt',
              img_prefix='{mini_vid}',
              pipeline=[
                  dict(type='LoadImageFromFile'),
                  dict(type='Resize', img_scale=(96, 64), keep_ratio=True),
                  dict(type='RandomFlip', flip_ratio=0),
                  dict(type='Normalize', mean=[103.06, 115.90, 123.15],
                       std=[1.0, 1.0, 1.0], to_rgb=False),
                  dict(type='Pad', size_divisor=16),
                  dict(type='Collect', keys=['img'])]))
'''
    with open(path, "w") as f:
        f.write(cfg)
    return path


def test_vid_eval_perfect_results(mini_vid, tmp_path):  # noqa: F811
    sys.path.insert(0, REPO)
    from tools.vid_eval import evaluate_results
    res = make_results_pickle(mini_vid, str(tmp_path / "res.pkl"))
    cfg = write_mini_config(mini_vid, str(tmp_path / "cfg.py"))
    mean_ap, _ = evaluate_results(res, cfg)
    assert mean_ap > 0.99


def test_cls_video_map_builds_lists(mini_vid, tmp_path):  # noqa: F811
    out = str(tmp_path / "maps")
    subprocess.run(
        [sys.executable, osp.join(REPO, "cls_video_map.py"),
         "--data-root", mini_vid,
         "--ann-file", osp.join(mini_vid, "ImageSets/VID_val_videos.txt"),
         "--out-dir", out],
        check=True, capture_output=True, timeout=120, cwd=REPO)
    # fixture video 0 is an airplane (class 1)
    with open(osp.join(out, "train_1.txt")) as f:
        assert "ILSVRC2015_val_00000000" in f.read()


def test_analyze_logs(tmp_path):
    sys.path.insert(0, REPO)
    from tools.analyze_logs import cal_train_time, load_log
    log = tmp_path / "log.jsonl"
    with open(log, "w") as f:
        for i in range(3):
            f.write(json.dumps(dict(epoch=0, iter=i, loss=1.0 - 0.1 * i,
                                    time=float(i))) + "\n")
    entries = load_log(str(log))
    assert len(entries) == 3
    cal_train_time(entries)


def test_collect_env():
    sys.path.insert(0, REPO)
    from tools.collect_env import collect_env
    info = collect_env()
    assert "jax" in info and "numpy" in info


def test_robustness_corruptions():
    sys.path.insert(0, REPO)
    from tools.test_robustness import BENCHMARK_SETS, corrupt
    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, (32, 48, 3)).astype(np.uint8)
    for cset in BENCHMARK_SETS.values():
        for c in cset:
            out = corrupt(img, c, 3)
            assert out.shape == img.shape and out.dtype == np.uint8
            assert not np.array_equal(out, img)
