"""Distributed-inference semantics: ranks over whole-video shards merge to
the same result set as a single rank (rank-local part files concatenated in
rank order — reference `tools/test.py:546-589`), and the training-time eval
hook computes the same mAP at world_size=2 as at world_size=1
(reference `mmdet/core/evaluation/eval_hooks.py:18-115`)."""
import os.path as osp

import numpy as np
import jax
import pytest

from tests.test_vid_dataset import (TEST_PIPELINE, build_mini_vid,  # noqa: F401
                                    mini_vid)
from tests.test_engine_selsa import tiny_selsa_cfg


@pytest.fixture(scope="module")
def mini_vid_44(tmp_path_factory):
    """Two 4-frame videos — with world_size=2 the greedy whole-video packer
    (avg=4) gives one video to EACH rank: a genuine split, unlike
    ``mini_vid`` whose 5+3 videos both land on rank 1."""
    root = str(tmp_path_factory.mktemp("VID44"))
    wnids = ["n02691156", "n02958343"]
    return build_mini_vid(root,
                          [("val/ILSVRC2015_val_00000000", 4, wnids[0]),
                           ("val/ILSVRC2015_val_00000001", 4, wnids[1])])


def make_dataset(root, world_size):
    from hvrnet_tpu.data import VIDSeqDataset
    return VIDSeqDataset(
        ann_file=osp.join(root, "ImageSets/VID_val_videos.txt"),
        img_prefix=root, pipeline=TEST_PIPELINE, test_mode=True,
        world_size=world_size, video_shuffle=False)


def run_rank(engine, params, root, world_size, rank):
    from hvrnet_tpu.engine import SlidingWindowRunner
    from hvrnet_tpu.engine.stream import test_frame_stream
    ds = make_dataset(root, world_size)
    runner = SlidingWindowRunner(engine, params)
    results = runner.run(test_frame_stream(ds, rank=rank, max_long=96,
                                           max_short=64), num_frames=len(ds))
    return ds, results


@pytest.fixture(scope="module")
def tiny_engine():
    from hvrnet_tpu.engine import SelsaRCNN
    model_cfg, test_cfg = tiny_selsa_cfg(window_interval=1, proposals=8)
    engine = SelsaRCNN(model_cfg, None, test_cfg)
    params = engine.init_params(jax.random.PRNGKey(0))
    return engine, params


@pytest.fixture(scope="module")
def mini_vid_8rank(tmp_path_factory):
    """Twelve videos with uneven lengths — the greedy packer (avg=5) shards
    them over 8 ranks as [5,4,5,5,5,4,5,3] frames: every rank nonempty,
    ranks carry 1 or 2 videos, three distinct shard sizes."""
    root = str(tmp_path_factory.mktemp("VID8R"))
    wnids = ["n02691156", "n02958343"]
    lengths = [3, 2, 4, 2, 3, 5, 2, 3, 4, 2, 3, 3]
    return build_mini_vid(root,
                          [(f"val/ILSVRC2015_val_{i:08d}", n, wnids[i % 2])
                           for i, n in enumerate(lengths)])


@pytest.mark.parametrize("fixture_name, split",
                         [("mini_vid", (0, 8)),      # degenerate: all→rank 1
                          ("mini_vid_44", (4, 4)),   # genuine 4+4 split
                          # 8 ranks, uneven whole-video shards
                          ("mini_vid_8rank", (5, 4, 5, 5, 5, 4, 5, 3))])
def test_two_rank_merge_equals_single_rank(fixture_name, split, tiny_engine,
                                           request):
    from hvrnet_tpu.utils.dist_io import (collect_results, dump_part,
                                          trim_to_local)
    import tempfile

    root = request.getfixturevalue(fixture_name)
    engine, params = tiny_engine
    world = len(split)

    _, single = run_rank(engine, params, root, 1, 0)

    with tempfile.TemporaryDirectory() as td:
        for r in range(world):
            ds, results = run_rank(engine, params, root, world, r)
            local = trim_to_local(results, ds, r)
            assert len(local) == split[r] == ds.local_frame_size_list[r]
            assert all(x is not None for x in local)
            dump_part(local, td, r)
        merged = collect_results(td, world, len(single))

    assert len(merged) == len(single)
    for i, (a, b) in enumerate(zip(single, merged)):
        assert b is not None
        for ca, cb in zip(a, b):
            np.testing.assert_allclose(ca, cb, rtol=1e-4, atol=1e-4,
                                       err_msg=f"frame {i}")


def test_eval_hook_two_rank_matches_single_rank(mini_vid_44, tiny_engine,
                                                tmp_path):
    """VidEvalHook at world_size=2 (both ranks driven in-process: rank 1
    writes its part and returns None, rank 0 merges + evaluates) must report
    the same mAP as the world_size=1 hook — the reference's DistEvalHook
    round-robin + tmp-pkl merge semantics (eval_hooks.py:28-71)."""
    from hvrnet_tpu.engine.eval_hook import VidEvalHook

    engine, params = tiny_engine
    ds_cfg = dict(type="VIDSeqDataset",
                  ann_file=osp.join(mini_vid_44, "ImageSets/VID_val_videos.txt"),
                  img_prefix=mini_vid_44, pipeline=TEST_PIPELINE,
                  video_shuffle=False)

    def hook(world_size, rank, work_dir):
        return VidEvalHook(engine, ds_cfg, work_dir=str(work_dir),
                           world_size=world_size, rank=rank,
                           max_long=96, max_short=64)

    single_dir = tmp_path / "ws1"
    single_dir.mkdir()
    map_single = hook(1, 0, single_dir)(params, epoch=0)
    assert map_single is not None

    dist_dir = tmp_path / "ws2"
    dist_dir.mkdir()
    assert hook(2, 1, dist_dir)(params, epoch=0) is None   # writes part only
    map_dist = hook(2, 0, dist_dir)(params, epoch=0)

    assert map_dist is not None
    np.testing.assert_allclose(map_dist, map_single, atol=1e-6)


def test_eval_hook_eight_rank_matches_single_rank(mini_vid_8rank, tiny_engine,
                                                  tmp_path):
    """Same hook semantics at world_size=8 with uneven whole-video shards:
    ranks 1-7 each persist a part file; rank 0 waits, merges in rank order
    and evaluates — mAP must equal the single-rank hook's."""
    from hvrnet_tpu.engine.eval_hook import VidEvalHook

    engine, params = tiny_engine
    ds_cfg = dict(type="VIDSeqDataset",
                  ann_file=osp.join(mini_vid_8rank,
                                    "ImageSets/VID_val_videos.txt"),
                  img_prefix=mini_vid_8rank, pipeline=TEST_PIPELINE,
                  video_shuffle=False)

    def hook(world_size, rank, work_dir):
        return VidEvalHook(engine, ds_cfg, work_dir=str(work_dir),
                           world_size=world_size, rank=rank,
                           max_long=96, max_short=64)

    single_dir = tmp_path / "ws1"
    single_dir.mkdir()
    map_single = hook(1, 0, single_dir)(params, epoch=0)
    assert map_single is not None

    dist_dir = tmp_path / "ws8"
    dist_dir.mkdir()
    for r in range(1, 8):
        assert hook(8, r, dist_dir)(params, epoch=0) is None
    map_dist = hook(8, 0, dist_dir)(params, epoch=0)

    assert map_dist is not None
    np.testing.assert_allclose(map_dist, map_single, atol=1e-6)
