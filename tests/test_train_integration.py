"""Full training-loop integration: apis.train_detector over the synthetic
mini-VID dataset (epoch loop, batching, logging, orbax checkpointing)."""
import json
import os.path as osp

import numpy as np
import pytest

from tests.test_vid_dataset import TRAIN_PIPELINE, mini_vid  # noqa: F401
from tests.test_train_step import tiny_model_cfg, tiny_train_cfg


def test_train_detector_epoch_loop(mini_vid, tmp_path):  # noqa: F811
    from hvrnet_tpu.apis import train_detector
    from hvrnet_tpu.data import VIDSeqDataset
    from hvrnet_tpu.engine import SelsaRCNN

    ds = VIDSeqDataset(
        ann_file=osp.join(mini_vid, "ImageSets/VID_train_15frames.txt"),
        img_prefix=mini_vid, pipeline=TRAIN_PIPELINE, selsa_with_aug=True)
    engine = SelsaRCNN(tiny_model_cfg(sampler_num=8, t_dim=3),
                       tiny_train_cfg(two_stage_sampler=True, num=16,
                                      ohem_num=8), None)
    work_dir = str(tmp_path / "run")
    cfg = dict(optimizer=dict(lr=1e-3, momentum=0.9, weight_decay=1e-4),
               lr_config=dict(step=[1], warmup_iters=2, warmup_ratio=1 / 3),
               optimizer_config=dict(grad_clip=dict(max_norm=35)),
               checkpoint_config=dict(interval=1),
               total_epochs=1)
    state = train_detector(engine, ds, cfg, mesh=None, work_dir=work_dir,
                           total_epochs=1, canvas_hw=(64, 96),
                           max_steps_per_epoch=2, log_interval=1)
    assert int(state.step) == 2
    # checkpoints + logs written
    assert osp.isdir(osp.join(work_dir, "epoch_1"))
    assert osp.isdir(osp.join(work_dir, "latest"))
    with open(osp.join(work_dir, "train_log.jsonl")) as f:
        entries = [json.loads(l) for l in f if l.strip()]
    assert entries and np.isfinite(entries[-1]["loss"])

    # resume restores the step counter
    from hvrnet_tpu.utils.checkpoint import load_checkpoint
    restored, meta = load_checkpoint(osp.join(work_dir, "latest"), state)
    assert meta["epoch"] == 1
    assert int(restored.step) == 2


def test_selsa_overfits_fixed_batch(mini_vid):  # noqa: F811
    """Optimization sanity: repeated steps on one fixed batch reduce loss."""
    import jax
    import numpy as np
    from hvrnet_tpu.engine import SelsaRCNN
    from hvrnet_tpu.engine.train import SelsaTrainer
    from hvrnet_tpu.engine.stream import collate_train
    from hvrnet_tpu.data import VIDSeqDataset

    ds = VIDSeqDataset(
        ann_file=osp.join(mini_vid, "ImageSets/VID_train_15frames.txt"),
        img_prefix=mini_vid, pipeline=TRAIN_PIPELINE, selsa_with_aug=True)
    np.random.seed(0)
    frames = ds[0]
    sample = collate_train(frames, (64, 96))
    batch = {k: v[None] for k, v in sample.items()}

    import sys
    sys.path.insert(0, osp.dirname(osp.abspath(__file__)))
    from test_train_step import tiny_model_cfg, tiny_train_cfg
    eng = SelsaRCNN(tiny_model_cfg(sampler_num=8, t_dim=3),
                    tiny_train_cfg(two_stage_sampler=False, num=16), None)
    params = eng.init_params(jax.random.PRNGKey(0))
    trainer = SelsaTrainer(eng, dict(
        optimizer=dict(lr=5e-3, momentum=0.9, weight_decay=0.0),
        lr_config=dict(step=[], warmup_iters=0)), steps_per_epoch=100)
    state = trainer.create_state(params)
    step = trainer.make_train_step(64, 96)
    losses = []
    rng = jax.random.PRNGKey(42)
    for i in range(12):
        # fixed rng → fixed sampling → deterministic objective to descend
        state, logs = step(state, batch, rng)
        losses.append(float(logs["loss"]))
    assert losses[-1] < losses[0], losses
    assert np.mean(losses[-3:]) < np.mean(losses[:3]), losses
