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
    from tools.analyze_logs import (cal_train_time, load_log, merge_logs,
                                    plot_curve)
    logs = []
    for li in range(2):                      # multi-log comparison surface
        log = tmp_path / f"log{li}.jsonl"
        with open(log, "w") as f:
            for ep in (1, 2):
                for i in range(1, 4):
                    f.write(json.dumps(dict(
                        epoch=ep, iter=i, loss=1.0 - 0.1 * i - 0.05 * li,
                        time=float(i))) + "\n")
                f.write(json.dumps(dict(epoch=ep, mAP=0.5 + 0.1 * ep)) + "\n")
        logs.append(str(log))
    loaded = [load_log(p) for p in logs]
    assert set(loaded[0]) == {1, 2}
    assert loaded[0][1]["loss"] == [0.9, 0.8, 0.7]
    cal_train_time(loaded, logs)
    cal_train_time(loaded, logs, include_outliers=True)
    out = str(tmp_path / "curves.png")
    plot_curve(loaded, logs, ["loss", "mAP"], out=out)
    assert osp.isfile(out)
    merged = str(tmp_path / "merged.jsonl")
    merge_logs(logs, merged)
    m = load_log(merged)
    # second log's epoch-1 iters rebased past the first log's end
    assert max(m[1]["iter"]) > 3


def test_collect_env():
    sys.path.insert(0, REPO)
    from tools.collect_env import collect_env
    info = collect_env()
    assert "jax" in info and "numpy" in info


def test_robustness_eval_table_and_summary(mini_vid, tmp_path, capsys):  # noqa: F811
    """robustness_eval: per-corruption × per-severity table + P/mPC/rPC
    (reference robustness_eval.py:164-186 surface)."""
    sys.path.insert(0, REPO)
    from tools.robustness_eval import collect, print_table, summarize
    cfg = write_mini_config(mini_vid, str(tmp_path / "cfg.py"))
    for c, s in (("gaussian_noise", 1), ("gaussian_noise", 3),
                 ("contrast", 1)):
        make_results_pickle(mini_vid, str(tmp_path / f"rob_{c}_s{s}.pkl"))
    clean = make_results_pickle(mini_vid, str(tmp_path / "clean.pkl"))
    table = collect(str(tmp_path / "rob"), cfg)
    assert set(table) == {"gaussian_noise", "contrast"}
    assert set(table["gaussian_noise"]) == {1, 3}
    print_table(table)
    from tools.vid_eval import evaluate_results
    clean_ap, _ = evaluate_results(clean, cfg, quiet=True)
    summarize(table, float(clean_ap), ("P", "mPC", "rPC"), "benchmark")
    out = capsys.readouterr().out
    assert "gaussian_noise" in out and "mPC" in out and "rPC" in out
    # perfect dets everywhere → mPC == P → rPC 100%
    assert "= 100.0" in out


def test_coco_error_analysis_bands(mini_vid, tmp_path):  # noqa: F811
    """coco_error_analysis: the 7-band decomposition is monotone
    (C75 ≤ C50 ≤ Loc ≤ Oth ≤ BG ≤ FN) and plots are written."""
    sys.path.insert(0, REPO)
    res = make_results_pickle(mini_vid, str(tmp_path / "res.pkl"))
    cfg = write_mini_config(mini_vid, str(tmp_path / "cfg.py"))
    out_dir = str(tmp_path / "plots")
    r = subprocess.run(
        [sys.executable, "-c",
         "import jax; jax.config.update('jax_platforms','cpu');"
         "import sys; sys.argv=['coco_error_analysis.py', %r, %r,"
         "'--out', %r, '--out-dir', %r];"
         "sys.path.insert(0, %r);"
         "import runpy; runpy.run_path(%r, run_name='__main__')"
         % (res, cfg, str(tmp_path / "ea.txt"), out_dir, REPO,
            osp.join(REPO, "tools/coco_error_analysis.py"))],
        capture_output=True, timeout=300, cwd=REPO, text=True)
    assert r.returncode == 0, r.stderr[-2000:]
    report = open(str(tmp_path / "ea.txt")).read()
    assert "ALL" in report and "C75=" in report
    pngs = os.listdir(out_dir)
    assert any(p.startswith("bbox-allclass") for p in pngs)
    # band monotonicity on the ALL row
    import re
    all_line = [ln for ln in report.splitlines() if " ALL:" in ln][0]
    vals = [float(v) for v in re.findall(r"=([0-9.]+)", all_line)]
    c75, c50, loc, sim, oth, bg, fn = vals
    assert c75 <= c50 + 1e-6 <= loc + 1e-6
    assert loc <= oth + 1e-6 <= bg + 1e-6 <= fn + 1e-6
    assert fn == 1.0


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
