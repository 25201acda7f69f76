"""CLI end-to-end: tools/test.py + tools/vid_eval.py as subprocesses over the
mini fixture with a tiny model config — guards the public entry points."""
import os
import os.path as osp
import pickle
import subprocess
import sys

import numpy as np
import pytest

from tests.test_vid_dataset import mini_vid  # noqa: F401

REPO = osp.dirname(osp.dirname(osp.abspath(__file__)))

TINY_CFG = '''
model = dict(
    type='SelsaRCNN',
    backbone=dict(type='ResNet', depth=50, num_stages=3, strides=(1, 2, 2),
                  dilations=(1, 1, 1), out_indices=(2,), frozen_stages=1,
                  style='caffe', norm_eval=True),
    shared_head=dict(type='ResLayer', depth=50, stage=3, stride=1, dilation=2,
                     style='caffe', norm_eval=True, external_conv=True),
    rpn_head=dict(type='RPNHead', in_channels=1024, feat_channels=64,
                  anchor_scales=[4, 8, 16, 32], anchor_ratios=[0.5, 1.0, 2.0],
                  anchor_strides=[16]),
    bbox_roi_extractor=dict(
        type='SingleRoIExtractor',
        roi_layer=dict(type='RoIAlign', out_size=7, sample_num=2),
        out_channels=1024, featmap_strides=[16], feat_from_shared_head=True),
    bbox_head=dict(type='SelsaBBoxHead', sampler_num=8, t_dim=3,
                   in_channels=256, num_classes=31, reg_class_agnostic=True))
test_cfg = dict(
    rpn=dict(nms_pre=200, nms_post=8, max_num=8, nms_thr=0.7, min_bbox_size=0),
    rcnn=dict(score_thr=0.001, nms=dict(type='nms', iou_thr=0.3),
              max_per_img=20, key_dim=1),
    bbox_head=dict(sampler_num=8, t_dim=3, key_dim=1),
    relation_setup=dict(shuffle=False, video_shuffle=True, has_rpn=True,
                        frame_interval=1, frame_stride=1))
data = dict(
    test=dict(type='VIDSeqDataset',
              ann_file='{root}/ImageSets/VID_val_videos.txt',
              img_prefix='{root}',
              pipeline=[
                  dict(type='LoadImageFromFile'),
                  dict(type='Resize', img_scale=(96, 64), keep_ratio=True),
                  dict(type='RandomFlip', flip_ratio=0),
                  dict(type='Normalize', mean=[103.06, 115.90, 123.15],
                       std=[1.0, 1.0, 1.0], to_rgb=False),
                  dict(type='Pad', size_divisor=16),
                  dict(type='Collect', keys=['img'])]))
'''


def test_test_cli_and_vid_eval(mini_vid, tmp_path):  # noqa: F811
    cfg_path = str(tmp_path / "tiny_cfg.py")
    with open(cfg_path, "w") as f:
        f.write(TINY_CFG.format(root=mini_vid))
    out = str(tmp_path / "results.pkl")
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    # note: the harness sitecustomize re-forces axon via env; the tools run
    # whatever backend is available — on CPU this still exercises the CLI.
    r = subprocess.run(
        [sys.executable, "-c",
         "import jax; jax.config.update('jax_platforms','cpu');"
         "import sys; sys.argv=['test.py', %r, '--out', %r];"
         "sys.path.insert(0, %r);"
         "import runpy; runpy.run_path(%r, run_name='__main__')"
         % (cfg_path, out, REPO, osp.join(REPO, "tools/test.py"))],
        capture_output=True, timeout=900, cwd=REPO, text=True)
    assert r.returncode == 0, r.stderr[-2000:]
    with open(out, "rb") as f:
        results = pickle.load(f)
    assert len(results) == 8 and all(x is not None for x in results)

    r2 = subprocess.run(
        [sys.executable, "-c",
         "import jax; jax.config.update('jax_platforms','cpu');"
         "import sys; sys.argv=['vid_eval.py', %r, %r];"
         "sys.path.insert(0, %r);"
         "import runpy; runpy.run_path(%r, run_name='__main__')"
         % (out, cfg_path, REPO, osp.join(REPO, "tools/vid_eval.py"))],
        capture_output=True, timeout=300, cwd=REPO, text=True)
    assert r2.returncode == 0, r2.stderr[-2000:]
    assert "mAP" in r2.stdout


def test_test_cli_json_out_and_show(mini_vid, tmp_path):  # noqa: F811
    """tools/test.py --json_out writes a COCO-results json (reference
    test.py:791-799 results2json) and --show renders annotated frames
    (headless counterpart of test.py:685)."""
    import json
    cfg_path = str(tmp_path / "tiny_cfg.py")
    with open(cfg_path, "w") as f:
        f.write(TINY_CFG.format(root=mini_vid))
    out = str(tmp_path / "results.pkl")
    json_out = str(tmp_path / "results_json")
    show_dir = str(tmp_path / "vis")
    r = subprocess.run(
        [sys.executable, "-c",
         "import jax; jax.config.update('jax_platforms','cpu');"
         "import sys; sys.argv=['test.py', %r, '--out', %r, '--json_out', %r,"
         "'--show', '--show-dir', %r, '--show-thr', '0.0'];"
         "sys.path.insert(0, %r);"
         "import runpy; runpy.run_path(%r, run_name='__main__')"
         % (cfg_path, out, json_out, show_dir, REPO,
            osp.join(REPO, "tools/test.py"))],
        capture_output=True, timeout=900, cwd=REPO, text=True)
    assert r.returncode == 0, r.stderr[-2000:]
    with open(json_out + ".bbox.json") as f:
        dets = json.load(f)
    assert isinstance(dets, list)
    for d in dets:
        assert set(d) == {"image_id", "bbox", "score", "category_id"}
        assert len(d["bbox"]) == 4 and d["bbox"][2] > 0 and d["bbox"][3] > 0
        assert 1 <= d["category_id"] <= 30
    frames = os.listdir(show_dir)
    assert len(frames) == 8 and all(p.endswith(".jpg") for p in frames)


TRAIN_TAIL = '''
train_cfg = dict(
    rpn=dict(
        assigner=dict(type='MaxIoUAssigner', pos_iou_thr=0.7, neg_iou_thr=0.3,
                      min_pos_iou=0.3, ignore_iof_thr=-1),
        sampler=dict(type='RandomSampler', num=32, pos_fraction=0.5,
                     neg_pos_ub=-1, add_gt_as_proposals=False),
        allowed_border=0, pos_weight=-1, debug=False),
    rpn_proposal=dict(nms_across_levels=False, nms_pre=100, nms_post=16,
                      max_num=16, nms_thr=0.7, min_bbox_size=0),
    rcnn=dict(
        assigner=dict(type='MaxIoUAssigner', pos_iou_thr=0.5, neg_iou_thr=0.5,
                      min_pos_iou=0.5, ignore_iof_thr=-1),
        sampler=dict(type='RandomSampler', num=16, pos_fraction=0.25,
                     neg_pos_ub=-1, add_gt_as_proposals=True),
        key_dim=0, pos_weight=-1, debug=False))
data = dict(
    train=dict(type='VIDSeqDataset',
               ann_file='{root}/ImageSets/VID_train_15frames.txt',
               img_prefix='{root}', selsa_with_aug=True,
               pipeline=[
                   dict(type='LoadImageFromFile', to_float32=True),
                   dict(type='LoadAnnotations', with_bbox=True),
                   dict(type='Resize', img_scale=(96, 64), keep_ratio=True),
                   dict(type='RandomFlip', flip_ratio=0.5),
                   dict(type='Normalize', mean=[103.06, 115.90, 123.15],
                        std=[1.0, 1.0, 1.0], to_rgb=False),
                   dict(type='Pad', size_divisor=16),
                   dict(type='Collect',
                        keys=['img', 'gt_bboxes', 'gt_labels'])]))
optimizer = dict(lr=1e-3, momentum=0.9, weight_decay=1e-4)
lr_config = dict(step=[1], warmup_iters=2, warmup_ratio=1.0 / 3)
optimizer_config = dict(grad_clip=dict(max_norm=35))
checkpoint_config = dict(interval=1)
total_epochs = 1
'''


def test_train_cli(mini_vid, tmp_path):  # noqa: F811
    """tools/train.py end to end on the fixture: epoch loop, checkpoints,
    json log — the counterpart of the reference train CLI."""
    # the test config's model section carries test-only keys; reuse TINY_CFG's
    # model and append the train sections
    cfg_src = TINY_CFG.format(root=mini_vid).split("test_cfg")[0] \
        + TRAIN_TAIL.format(root=mini_vid)
    cfg_path = str(tmp_path / "tiny_train_cfg.py")
    with open(cfg_path, "w") as f:
        f.write(cfg_src)
    work = str(tmp_path / "run")
    r = subprocess.run(
        [sys.executable, "-c",
         "import jax; jax.config.update('jax_platforms','cpu');"
         "import sys; sys.argv=['train.py', %r, '--work-dir', %r,"
         "'--total-epochs', '1', '--max-steps-per-epoch', '2',"
         "'--canvas', '64', '96', '--n-devices', '1', '--seed', '0'];"
         "sys.path.insert(0, %r);"
         "import runpy; runpy.run_path(%r, run_name='__main__')"
         % (cfg_path, work, REPO, osp.join(REPO, "tools/train.py"))],
        capture_output=True, timeout=900, cwd=REPO, text=True)
    assert r.returncode == 0, r.stderr[-2000:]
    assert osp.isdir(osp.join(work, "epoch_1"))
    assert osp.isdir(osp.join(work, "latest"))
    with open(osp.join(work, "train_log.jsonl")) as f:
        entries = [l for l in f if l.strip()]
    assert entries


def test_train_cli_validate(mini_vid, tmp_path):  # noqa: F811
    """tools/train.py --validate: the epoch loop runs the sliding-window VID
    eval hook (reference tools/train.py:22 → DistEvalmAPHook) and logs mAP."""
    import json
    cfg_src = (TINY_CFG.format(root=mini_vid)
               + "\n_val_data = data['test']\n"
               + TRAIN_TAIL.format(root=mini_vid)
               + "\ndata['val'] = _val_data\nevaluation = dict(interval=1)\n")
    cfg_path = str(tmp_path / "tiny_train_val_cfg.py")
    with open(cfg_path, "w") as f:
        f.write(cfg_src)
    work = str(tmp_path / "run")
    r = subprocess.run(
        [sys.executable, "-c",
         "import jax; jax.config.update('jax_platforms','cpu');"
         "import sys; sys.argv=['train.py', %r, '--work-dir', %r,"
         "'--total-epochs', '1', '--max-steps-per-epoch', '2',"
         "'--canvas', '64', '96', '--n-devices', '1', '--seed', '0',"
         "'--validate'];"
         "sys.path.insert(0, %r);"
         "import runpy; runpy.run_path(%r, run_name='__main__')"
         % (cfg_path, work, REPO, osp.join(REPO, "tools/train.py"))],
        capture_output=True, timeout=900, cwd=REPO, text=True)
    assert r.returncode == 0, r.stderr[-2000:]
    with open(osp.join(work, "train_log.jsonl")) as f:
        entries = [json.loads(l) for l in f if l.strip()]
    maps = [e["mAP"] for e in entries if "mAP" in e]
    assert maps and all(0.0 <= m <= 1.0 for m in maps)


def test_robustness_cli(mini_vid, tmp_path):  # noqa: F811
    """tools/test_robustness.py end to end over the fixture: one corruption
    at one severity must run the full test loop and write result pickles."""
    cfg_path = str(tmp_path / "tiny_cfg.py")
    with open(cfg_path, "w") as f:
        f.write(TINY_CFG.format(root=mini_vid))
    prefix = str(tmp_path / "rob")
    r = subprocess.run(
        [sys.executable, "-c",
         "import jax; jax.config.update('jax_platforms','cpu');"
         "import sys; sys.argv=['test_robustness.py', %r, '--corruptions',"
         "'gaussian_noise', '--severities', '1', '--out-prefix', %r];"
         "sys.path.insert(0, %r);"
         "import runpy; runpy.run_path(%r, run_name='__main__')"
         % (cfg_path, prefix, REPO, osp.join(REPO, "tools/test_robustness.py"))],
        capture_output=True, timeout=900, cwd=REPO, text=True)
    assert r.returncode == 0, r.stderr[-2000:]
    outs = [p for p in os.listdir(tmp_path) if p.startswith("rob")]
    assert outs, r.stdout[-1000:]


def test_wait_for_parts_rendezvous(tmp_path):
    """rank-0 merge must wait for late ranks (reference test.py:568 barrier)."""
    import threading
    import time
    from tools.test import wait_for_parts

    p0 = tmp_path / "part_0.pkl"
    p1 = tmp_path / "part_1.pkl"
    p0.write_bytes(b"x")

    def late_writer():
        time.sleep(0.8)
        p1.write_bytes(b"y")

    t = threading.Thread(target=late_writer)
    t0 = time.time()
    t.start()
    wait_for_parts([str(p0), str(p1)], timeout=10.0, poll=0.05)
    t.join()
    assert time.time() - t0 >= 0.7   # it actually waited

    with pytest.raises(TimeoutError):
        wait_for_parts([str(tmp_path / "never.pkl")], timeout=0.3, poll=0.05)


def _rank_cmd(cfg_path, out, tmpdir, rank, world):
    return [sys.executable, "-c",
            "import jax; jax.config.update('jax_platforms','cpu');"
            "import sys; sys.argv=['test.py', %r, '--out', %r, '--tmpdir', %r,"
            "'--rank', '%d', '--world-size', '%d', '--merge-timeout', '600'];"
            "sys.path.insert(0, %r);"
            "import runpy; runpy.run_path(%r, run_name='__main__')"
            % (cfg_path, out, tmpdir, rank, world, REPO,
               osp.join(REPO, "tools/test.py"))]


def test_test_cli_two_process_merge(mini_vid, tmp_path):  # noqa: F811
    """Two concurrent rank processes; rank 0 must block on rank 1's part file
    and produce the fully merged result set."""
    cfg_path = str(tmp_path / "tiny_cfg.py")
    with open(cfg_path, "w") as f:
        f.write(TINY_CFG.format(root=mini_vid))
    out = str(tmp_path / "merged.pkl")
    tmpdir = str(tmp_path / "parts")
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    procs = [subprocess.Popen(_rank_cmd(cfg_path, out, tmpdir, r, 2),
                              cwd=REPO, env=env, stdout=subprocess.PIPE,
                              stderr=subprocess.PIPE, text=True)
             for r in (0, 1)]
    for p in procs:
        _, err = p.communicate(timeout=900)
        assert p.returncode == 0, err[-2000:]
    with open(out, "rb") as f:
        results = pickle.load(f)
    assert len(results) == 8 and all(x is not None for x in results)


def test_test_cli_batched(mini_vid, tmp_path):  # noqa: F811
    """tools/test.py --batched B drives the lockstep multi-stream runner
    (throughput mode for the full val sweep, BASELINE.json config 5)."""
    cfg_path = str(tmp_path / "tiny_cfg.py")
    with open(cfg_path, "w") as f:
        f.write(TINY_CFG.format(root=mini_vid))
    out = str(tmp_path / "results_batched.pkl")
    r = subprocess.run(
        [sys.executable, "-c",
         "import jax; jax.config.update('jax_platforms','cpu');"
         "import sys; sys.argv=['test.py', %r, '--out', %r, '--batched', '2'];"
         "sys.path.insert(0, %r);"
         "import runpy; runpy.run_path(%r, run_name='__main__')"
         % (cfg_path, out, REPO, osp.join(REPO, "tools/test.py"))],
        capture_output=True, timeout=900, cwd=REPO, text=True)
    assert r.returncode == 0, r.stderr[-2000:]
    with open(out, "rb") as f:
        results = pickle.load(f)
    assert len(results) == 8 and all(x is not None for x in results)


def test_test_cli_spmd_lanes(mini_vid, tmp_path):  # noqa: F811
    """tools/test.py --batched 8 --spmd-lanes shards the lockstep streams
    over the 8 virtual CPU devices in one program; results must match the
    plain run (single-process multi-chip scale-out)."""
    cfg_path = str(tmp_path / "tiny_cfg.py")
    with open(cfg_path, "w") as f:
        f.write(TINY_CFG.format(root=mini_vid))
    out = str(tmp_path / "results_spmd.pkl")
    # os._exit(0) after main: the 8-CPU-device JAX runtime intermittently
    # SIGSEGVs during interpreter teardown under parallel test load (twice
    # observed; the same command standalone exits 0 and the results file was
    # complete in every case).  Main's own failures still propagate — the
    # hard exit runs only after runpy returns cleanly.
    r = subprocess.run(
        [sys.executable, "-c",
         "import jax; jax.config.update('jax_platforms','cpu');"
         "jax.config.update('jax_num_cpu_devices', 8);"
         "import sys; sys.argv=['test.py', %r, '--out', %r, '--batched', '8',"
         " '--spmd-lanes'];"
         "sys.path.insert(0, %r);"
         "import runpy; runpy.run_path(%r, run_name='__main__');"
         "import os; os._exit(0)"
         % (cfg_path, out, REPO, osp.join(REPO, "tools/test.py"))],
        capture_output=True, timeout=900, cwd=REPO, text=True)
    assert r.returncode == 0, r.stderr[-2000:]
    with open(out, "rb") as f:
        results = pickle.load(f)
    assert len(results) == 8 and all(x is not None for x in results)


HNL_CFG = TINY_CFG.replace("type='SelsaRCNN'", "type='HNMBRCNN'").replace(
    "type='SelsaBBoxHead'", "type='HRNMPBBoxHead'")


@pytest.mark.parametrize("extra", [[], ["--multi-pass", "3"],
                                   ["--stream"],
                                   ["--pair-features", "2"]])
def test_hnl_test_cli(mini_vid, tmp_path, extra):  # noqa: F811
    """tools/hnl_test.py end to end (repeat pre-padding so the window math is
    deterministic): default exact ring, the multi-pass head graph, the
    streaming-softmax ring (the bench default), and paired features."""
    cfg_path = str(tmp_path / "tiny_hnl_cfg.py")
    with open(cfg_path, "w") as f:
        f.write(HNL_CFG.format(root=mini_vid))
    out = str(tmp_path / f"results_hnl{len(extra)}.pkl")
    argv = ["hnl_test.py", cfg_path, "--out", out, "--window", "3",
            "--pre-padding", "repeat"] + extra
    r = subprocess.run(
        [sys.executable, "-c",
         "import jax; jax.config.update('jax_platforms','cpu');"
         "import sys; sys.argv=%r;"
         "sys.path.insert(0, %r);"
         "import runpy; runpy.run_path(%r, run_name='__main__')"
         % (argv, REPO, osp.join(REPO, "tools/hnl_test.py"))],
        capture_output=True, timeout=900, cwd=REPO, text=True)
    assert r.returncode == 0, r.stderr[-2000:]
    with open(out, "rb") as f:
        results = pickle.load(f)
    assert len(results) == 8 and all(x is not None for x in results)


def test_hnl_test_cli_json_out_and_show(mini_vid, tmp_path):  # noqa: F811
    """tools/hnl_test.py --json_out/--show — the reference has them on BOTH
    harnesses (hnl_test.py:669-707 mirrors test.py:685-799)."""
    import json
    cfg_path = str(tmp_path / "tiny_hnl_cfg.py")
    with open(cfg_path, "w") as f:
        f.write(HNL_CFG.format(root=mini_vid))
    out = str(tmp_path / "results_hnl_json.pkl")
    json_out = str(tmp_path / "results_hnl")
    show_dir = str(tmp_path / "vis_hnl")
    argv = ["hnl_test.py", cfg_path, "--out", out, "--window", "3",
            "--pre-padding", "repeat", "--json_out", json_out,
            "--show", "--show-dir", show_dir, "--show-thr", "0.0"]
    r = subprocess.run(
        [sys.executable, "-c",
         "import jax; jax.config.update('jax_platforms','cpu');"
         "import sys; sys.argv=%r;"
         "sys.path.insert(0, %r);"
         "import runpy; runpy.run_path(%r, run_name='__main__')"
         % (argv, REPO, osp.join(REPO, "tools/hnl_test.py"))],
        capture_output=True, timeout=900, cwd=REPO, text=True)
    assert r.returncode == 0, r.stderr[-2000:]
    with open(json_out + ".bbox.json") as f:
        dets = json.load(f)
    assert isinstance(dets, list)
    for d in dets:
        assert set(d) == {"image_id", "bbox", "score", "category_id"}
        assert 1 <= d["category_id"] <= 30
    frames = os.listdir(show_dir)
    assert len(frames) == 8 and all(p.endswith(".jpg") for p in frames)


def test_test_cli_aug_test(mini_vid, tmp_path):  # noqa: F811
    """tools/test.py --aug-test runs the flip-augmented pipeline end to end."""
    cfg_path = str(tmp_path / "tiny_cfg.py")
    with open(cfg_path, "w") as f:
        f.write(TINY_CFG.format(root=mini_vid))
    out = str(tmp_path / "results_aug.pkl")
    r = subprocess.run(
        [sys.executable, "-c",
         "import jax; jax.config.update('jax_platforms','cpu');"
         "import sys; sys.argv=['test.py', %r, '--out', %r, '--aug-test'];"
         "sys.path.insert(0, %r);"
         "import runpy; runpy.run_path(%r, run_name='__main__')"
         % (cfg_path, out, REPO, osp.join(REPO, "tools/test.py"))],
        capture_output=True, timeout=900, cwd=REPO, text=True)
    assert r.returncode == 0, r.stderr[-2000:]
    with open(out, "rb") as f:
        results = pickle.load(f)
    assert len(results) == 8 and all(x is not None for x in results)
