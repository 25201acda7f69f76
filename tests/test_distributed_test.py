"""Distributed-inference semantics: two ranks over whole-video shards merge
to the same result set as a single rank (tools/test.py collect path)."""
import os.path as osp

import numpy as np
import jax

from tests.test_vid_dataset import TEST_PIPELINE, mini_vid  # noqa: F401
from tests.test_engine_selsa import tiny_selsa_cfg


def run_rank(engine, params, mini_vid, world_size, rank):  # noqa: F811
    from hvrnet_tpu.data import VIDSeqDataset
    from hvrnet_tpu.engine import SlidingWindowRunner
    from hvrnet_tpu.engine.stream import test_frame_stream
    ds = VIDSeqDataset(
        ann_file=osp.join(mini_vid, "ImageSets/VID_val_videos.txt"),
        img_prefix=mini_vid, pipeline=TEST_PIPELINE, test_mode=True,
        world_size=world_size, video_shuffle=False)
    runner = SlidingWindowRunner(engine, params)
    return runner.run(test_frame_stream(ds, rank=rank, max_long=96,
                                        max_short=64), num_frames=len(ds))


def test_two_rank_merge_equals_single_rank(mini_vid):  # noqa: F811
    from hvrnet_tpu.engine import SelsaRCNN
    from tools.test import collect_results
    import pickle
    import tempfile
    import os

    model_cfg, test_cfg = tiny_selsa_cfg(window_interval=1, proposals=8)
    engine = SelsaRCNN(model_cfg, None, test_cfg)
    params = engine.init_params(jax.random.PRNGKey(0))

    single = run_rank(engine, params, mini_vid, 1, 0)

    parts = [run_rank(engine, params, mini_vid, 2, r) for r in range(2)]
    # every frame covered exactly once across ranks
    covered = [sum(p[i] is not None for p in parts) for i in range(len(single))]
    assert all(c == 1 for c in covered), covered

    with tempfile.TemporaryDirectory() as td:
        for r, p in enumerate(parts):
            with open(os.path.join(td, f"part_{r}.pkl"), "wb") as f:
                pickle.dump(p, f)
        merged = collect_results(td, 2, len(single))

    for i, (a, b) in enumerate(zip(single, merged)):
        assert b is not None
        for ca, cb in zip(a, b):
            np.testing.assert_allclose(ca, cb, rtol=1e-4, atol=1e-4,
                                       err_msg=f"frame {i}")
