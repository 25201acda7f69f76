"""RetinaNet dense-head training step: finite losses, params update."""
import numpy as np
import jax
import jax.numpy as jnp

from hvrnet_tpu.engine.single_stage import RetinaNet
from hvrnet_tpu.engine.train_single_stage import RetinaTrainer


def test_retina_train_step():
    model_cfg = dict(
        type='RetinaNet',
        backbone=dict(type='ResNet', depth=50, num_stages=4,
                      strides=(1, 2, 2, 2), dilations=(1, 1, 1, 1),
                      out_indices=(0, 1, 2, 3), frozen_stages=1,
                      style='pytorch', norm_eval=True),
        neck=dict(type='FPN', in_channels=(256, 512, 1024, 2048),
                  out_channels=32, num_outs=5, start_level=1,
                  add_extra_convs=True),
        bbox_head=dict(type='RetinaHead', num_classes=11, in_channels=32,
                       feat_channels=32, stacked_convs=1,
                       octave_base_scale=4, scales_per_octave=3,
                       anchor_ratios=[0.5, 1.0, 2.0],
                       anchor_strides=[8, 16, 32, 64, 128],
                       target_means=[0., 0., 0., 0.],
                       target_stds=[1., 1., 1., 1.]))
    train_cfg = dict(assigner=dict(type='MaxIoUAssigner', pos_iou_thr=0.5,
                                   neg_iou_thr=0.4, min_pos_iou=0.0))
    eng = RetinaNet(model_cfg, train_cfg, None)
    params = eng.init_params(jax.random.PRNGKey(0), (64, 64))
    trainer = RetinaTrainer(eng, dict(optimizer=dict(lr=1e-2)),
                            steps_per_epoch=10)
    state = trainer.create_state(params)
    step = trainer.make_train_step(64, 64)

    rng = np.random.default_rng(0)
    G = 4
    gt = np.zeros((1, G, 4), np.float32)
    gt[0, 0] = [5, 5, 40, 40]
    gt[0, 1] = [20, 25, 60, 60]
    gm = np.zeros((1, G), bool)
    gm[0, :2] = True
    gl = np.zeros((1, G), np.int64)
    gl[0, :2] = [1, 5]
    batch = dict(imgs=rng.normal(size=(1, 1, 64, 64, 3)).astype(np.float32),
                 gt_bboxes=gt[None], gt_labels=gl[None], gt_mask=gm[None],
                 img_shape=np.array([[[64.0, 64.0]]], np.float32))
    p0 = np.asarray(params["params"]["bbox_head"]["retina_cls"]["bias"])
    state2, logs = step(state, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(logs["loss"]))
    assert float(logs["num_pos"]) >= 1
    p1 = np.asarray(state2.params["params"]["bbox_head"]["retina_cls"]["bias"])
    assert not np.array_equal(p0, p1)  # focal-loss grads are tiny at init
