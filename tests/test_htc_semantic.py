"""HTC semantic-fusion: training step with seg loss + fused inference."""
import numpy as np
import jax
import jax.numpy as jnp

from hvrnet_tpu.engine.multi_stage import HybridTaskCascade
from hvrnet_tpu.engine.train_two_stage import TwoStageTrainer


def _htc_cfg():
    return dict(
        type='HybridTaskCascade',
        backbone=dict(type='ResNet', depth=50, num_stages=4,
                      strides=(1, 2, 2, 2), dilations=(1, 1, 1, 1),
                      out_indices=(0, 1, 2, 3), frozen_stages=1,
                      style='pytorch', norm_eval=True),
        neck=dict(type='FPN', in_channels=(256, 512, 1024, 2048),
                  out_channels=32, num_outs=5),
        rpn_head=dict(type='RPNHead', in_channels=32, feat_channels=32,
                      anchor_scales=[8], anchor_ratios=[0.5, 1.0, 2.0],
                      anchor_strides=[4]),
        bbox_roi_extractor=dict(
            type='SingleRoIExtractor',
            roi_layer=dict(type='RoIAlign', out_size=7, sample_num=2),
            out_channels=32, featmap_strides=[4]),
        bbox_head=[dict(
            type='SharedFCBBoxHead', in_channels=32, fc_out_channels=32,
            num_classes=9, reg_class_agnostic=True,
            target_means=[0., 0., 0., 0.],
            target_stds=[0.1, 0.1, 0.2, 0.2]) for _ in range(2)],
        mask_roi_extractor=dict(
            type='SingleRoIExtractor',
            roi_layer=dict(type='RoIAlign', out_size=14, sample_num=2),
            out_channels=32, featmap_strides=[4]),
        mask_head=[dict(type='HTCMaskHead', num_convs=1, in_channels=32,
                        conv_out_channels=32, num_classes=9)
                   for _ in range(2)],
        semantic_roi_extractor=dict(
            type='SingleRoIExtractor',
            roi_layer=dict(type='RoIAlign', out_size=14, sample_num=2),
            out_channels=32, featmap_strides=[8]),
        semantic_head=dict(type='FusedSemanticHead', num_ins=5,
                           fusion_level=1, num_convs=1, in_channels=32,
                           conv_out_channels=32, num_classes=9,
                           ignore_label=255, loss_weight=0.2),
        semantic_fusion=('bbox', 'mask'))


def _train_cfg():
    return dict(
        rpn=dict(assigner=dict(pos_iou_thr=0.7, neg_iou_thr=0.3,
                               min_pos_iou=0.3),
                 sampler=dict(num=64, pos_fraction=0.5), pos_weight=-1),
        rpn_proposal=dict(nms_pre=200, nms_post=64, max_num=64, nms_thr=0.7,
                          min_bbox_size=0),
        rcnn=[dict(
            assigner=dict(pos_iou_thr=thr, neg_iou_thr=thr, min_pos_iou=thr),
            sampler=dict(num=32, pos_fraction=0.25,
                         add_gt_as_proposals=True),
            pos_weight=-1, mask_size=28) for thr in (0.5, 0.6)],
        stage_loss_weights=[1, 0.5])


def test_htc_semantic_train_and_test():
    eng = HybridTaskCascade(_htc_cfg(), _train_cfg(),
                            dict(rpn=dict(nms_pre=100, nms_post=16,
                                          max_num=16, nms_thr=0.7,
                                          min_bbox_size=0),
                                 rcnn=dict(score_thr=0.01,
                                           nms=dict(type='nms', iou_thr=0.5),
                                           max_per_img=8)))
    assert eng.with_semantic
    params = eng.init_params(jax.random.PRNGKey(0), (64, 96))
    trainer = TwoStageTrainer(eng, dict(optimizer=dict(lr=1e-2)),
                              steps_per_epoch=10)
    state = trainer.create_state(params)
    step = trainer.make_train_step(64, 96)

    rng = np.random.default_rng(5)
    h, w = 64, 96
    G = 3
    gt = np.zeros((G, 4), np.float32)
    gt[0] = [5, 5, 40, 40]
    gt[1] = [30, 20, 80, 60]
    gm = np.array([1, 1, 0], bool)
    gl = np.array([1, 5, 0], np.int64)
    masks = np.zeros((G, h, w), np.float32)
    masks[0, 5:41, 5:41] = 1
    masks[1, 20:61, 30:81] = 1
    # gt semantic at the seg-logit resolution (fusion_level 1 → stride 8)
    seg = np.full((h // 8, w // 8, 1), 255, np.int64)
    seg[0:5, 0:5] = 1
    seg[2:8, 4:10] = 5
    batch = jax.tree_util.tree_map(
        lambda x: np.asarray(x)[None],
        dict(img=rng.normal(size=(h, w, 3)).astype(np.float32),
             gt_bboxes=gt, gt_labels=gl, gt_mask=gm, gt_masks=masks,
             gt_semantic_seg=seg[..., 0],
             img_shape=np.array([60.0, 90.0], np.float32),
             pad_shape=np.array([64.0, 96.0], np.float32)))
    sem0 = jax.tree_util.tree_map(
        np.asarray, params["params"]["semantic_head"])
    mh1_0 = jax.tree_util.tree_map(
        np.asarray, params["params"]["mask_head1"])
    state2, logs = step(state, batch, jax.random.PRNGKey(1))
    for k in ("loss", "loss_semantic_seg", "loss_mask_s0", "loss_mask_s1",
              "loss_cls_s0", "loss_cls_s1"):
        assert np.isfinite(float(logs[k])), k
    assert float(logs["loss_semantic_seg"]) > 0
    delta = sum(float(np.abs(np.asarray(a) - np.asarray(b)).sum())
                for a, b in zip(jax.tree_util.tree_leaves(sem0),
                                jax.tree_util.tree_leaves(
                                    state2.params["params"]["semantic_head"])))
    assert delta > 0   # fusion + seg loss both feed the semantic branch
    d1 = sum(float(np.abs(np.asarray(a) - np.asarray(b)).sum())
             for a, b in zip(jax.tree_util.tree_leaves(mh1_0),
                             jax.tree_util.tree_leaves(
                                 state2.params["params"]["mask_head1"])))
    assert d1 > 0      # second-stage mask head (info flow) trains too

    img = jnp.asarray(rng.normal(size=(1, 64, 96, 3)).astype(np.float32))
    out = eng.simple_test(state2.params, img,
                          np.array([60.0, 90.0], np.float32),
                          np.array([64.0, 96.0], np.float32),
                          np.array([1.0] * 4, np.float32))
    dets, labels, mask, mask_pred = out
    assert dets.shape == (8, 5)
    assert mask_pred.shape[1:] == (28, 28, 8)
    assert np.isfinite(np.asarray(dets)).all()
