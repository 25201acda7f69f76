"""HVRNet end-to-end on the fixture: the reference training recipe in
miniature, then trained-weights accuracy checks.

The reference trains HVRNet FROM a trained SELSA checkpoint
(`/root/reference/configs/faster_rcnn_r101_hrnmp_c5.py:353` load_from =
selsa epoch-18) with the backbone/RPN under no_grad
(`hnmb_rcnn.py:59-72,321-335`).  This test replays that recipe on the mini
fixture: overfit SELSA → transplant every matching-shaped parameter into the
HNMB tree (the reference's strict=False checkpoint load — fc_new_1 and the
first NL blocks carry over, the new blocks/branches start fresh) → train the
HNMB triplet step → then assert on the TRAINED model:

* the full HVRNet test path localizes (mAP ≥ 0.5 on the overfit video),
* the bf16 compute budget holds end to end (the HVRNet analogue of the
  trained SELSA budget in test_bf16_budget.py),
* the streaming ring equals the exact ring on trained weights (the
  equality tests elsewhere use random weights).
"""
import os.path as osp

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tests.test_bf16_budget import det_drift
from tests.test_train_step import tiny_model_cfg, tiny_train_cfg
from tests.test_vid_dataset import TRAIN_PIPELINE, build_mini_vid


@pytest.fixture(scope="module")
def mini_vid_triplets(tmp_path_factory):
    """3 same-class + 2 other-class videos — the HNMB triplet pool shape."""
    root = str(tmp_path_factory.mktemp("VIDT"))
    vids = [(f"train/ILSVRC2015_VID_train_a{i}", 3, "n02691156")
            for i in range(3)]
    vids += [(f"train/ILSVRC2015_VID_train_c{i}", 3, "n02958343")
             for i in range(2)]
    return build_mini_vid(root, vids)


def _transplant(dst, src):
    """strict=False checkpoint-load semantics: copy every leaf whose path
    exists in both trees with a matching shape."""
    def walk(d, s):
        out = {}
        for k, v in d.items():
            if k in s and isinstance(v, dict) and isinstance(s[k], dict):
                out[k] = walk(v, s[k])
            elif (k in s and hasattr(v, "shape") and hasattr(s[k], "shape")
                  and v.shape == s[k].shape):
                out[k] = s[k]
            else:
                out[k] = v
        return out
    return walk(dst, src)


def test_hnmb_recipe_trains_and_keeps_bf16_budget(mini_vid_triplets):
    from hvrnet_tpu.core.evaluation.mean_ap import eval_map
    from hvrnet_tpu.data import VIDSeqDataset
    from hvrnet_tpu.engine import HNMBRCNN, SelsaRCNN
    from hvrnet_tpu.engine.stream import collate_train
    from hvrnet_tpu.engine.train import HNMBTrainer, SelsaTrainer
    from hvrnet_tpu.engine.video_runner import _dets_to_result

    ds = VIDSeqDataset(
        ann_file=osp.join(mini_vid_triplets,
                          "ImageSets/VID_train_15frames.txt"),
        img_prefix=mini_vid_triplets, pipeline=TRAIN_PIPELINE,
        selsa_with_aug=True)
    assert len(ds) == 5
    np.random.seed(0)
    canvas = (64, 96)
    samples = [collate_train(ds[v], canvas) for v in range(5)]

    proposals = 16
    train_cfg = tiny_train_cfg(two_stage_sampler=False, num=proposals)
    train_cfg["rpn"]["allowed_border"] = -1
    test_cfg = dict(
        rpn=dict(nms_pre=100, nms_post=proposals, max_num=proposals,
                 nms_thr=0.7, min_bbox_size=0),
        rcnn=dict(score_thr=0.001, nms=dict(type='nms', iou_thr=0.3),
                  max_per_img=20, key_dim=1),
        bbox_head=dict(sampler_num=proposals, t_dim=3, key_dim=1),
        relation_setup=dict(shuffle=False, video_shuffle=True, has_rpn=True,
                            frame_interval=1, frame_stride=1))
    selsa_model = tiny_model_cfg(sampler_num=proposals, t_dim=3)
    selsa_model["rpn_head"]["anchor_scales"] = [1, 2, 4, 8]
    opt = dict(optimizer=dict(lr=5e-3, momentum=0.9, weight_decay=0.0),
               lr_config=dict(step=[], warmup_iters=0))

    # ---- stage 1: SELSA pretrain (overfit video 0's triplet)
    eng_s = SelsaRCNN(selsa_model, train_cfg, test_cfg, dtype=jnp.float32)
    eng_s.window, eng_s.key_dim = 3, 1
    params0 = eng_s.init_params(jax.random.PRNGKey(0))
    tr_s = SelsaTrainer(eng_s, opt, steps_per_epoch=1000)
    state = tr_s.create_state(params0)
    step_s = tr_s.make_train_step(*canvas)
    batch_s = {k: v[None] for k, v in samples[0].items()}
    rng = jax.random.PRNGKey(42)
    for _ in range(300):
        state, _ = step_s(state, batch_s, rng)
    selsa_trained = jax.device_get(state.params)

    # ---- stage 2: transplant into the HNMB tree (strict=False load)
    hnmb_model = tiny_model_cfg(head_type='HRNMPBBoxHead',
                                sampler_num=proposals, t_dim=3,
                                imgs_per_video=3)
    hnmb_model["rpn_head"]["anchor_scales"] = [1, 2, 4, 8]
    eng_h = HNMBRCNN(hnmb_model, train_cfg, test_cfg, dtype=jnp.float32)
    eng_h.window, eng_h.key_dim = 3, 1
    params_h0 = eng_h.init_params(jax.random.PRNGKey(1))
    params_h = _transplant(params_h0, selsa_trained)

    # the backbone/rpn/shared-head and the head's shared prefix (fc_new_1)
    # must carry over: walk COMMON paths (positional zip of tree leaves
    # would misalign once the HNMB head's extra blocks interleave)
    def common_equal(dst, src, path=""):
        n = eq = 0
        for k, v in dst.items():
            if k not in src:
                continue
            if isinstance(v, dict):
                a, b = common_equal(v, src[k], path + "/" + str(k))
                n += a
                eq += b
            elif v.shape == src[k].shape:
                n += 1
                eq += bool((v == src[k]).all())
        return n, eq

    n_common, n_eq = common_equal(params_h, selsa_trained)
    assert n_common > 0 and n_eq == n_common, (n_eq, n_common)
    inner_h = params_h["params"]
    inner_s = selsa_trained["params"]
    for sub in ("backbone", "rpn_head", "shared_head"):
        n, eq = common_equal(inner_h[sub], inner_s[sub])
        assert n > 0 and eq == n, (sub, eq, n)
    # the head prefix shared by both architectures transplants too
    n, eq = common_equal(inner_h["bbox_head"]["fc_new_1"],
                         inner_s["bbox_head"]["fc_new_1"])
    assert n > 0 and eq == n

    # ---- stage 3: HNMB triplet training (no-grad backbone/RPN)
    batch_h = {k: np.concatenate([s[k] for s in samples], axis=0)[None]
               for k in samples[0]}
    tr_h = HNMBTrainer(eng_h, opt, steps_per_epoch=1000)
    state_h = tr_h.create_state(params_h)
    step_h = tr_h.make_train_step(*canvas)
    logs0 = None
    for i in range(150):
        state_h, logs = step_h(state_h, batch_h, jax.random.PRNGKey(100 + i))
        if logs0 is None:
            logs0 = jax.device_get(logs)
    trained = jax.device_get(state_h.params)
    logs = jax.device_get(logs)
    assert np.isfinite(logs["loss"])
    assert logs["loss"] < logs0["loss"], (logs0["loss"], logs["loss"])

    # ---- trained-model checks on video 0's window
    sample = samples[0]

    def detect(eng, params):
        feats = [eng.frame_features(
            params, jnp.asarray(sample["imgs"][i][None]),
            sample["img_shape"][i], sample["pad_shape"][i]) for i in range(3)]
        fc1 = jnp.stack([f["fc1"] for f in feats])
        boxes = jnp.stack([f["boxes"] for f in feats])
        masks = jnp.stack([f["mask"] for f in feats])
        return eng.window_detect(params, fc1, boxes, masks,
                                 sample["img_shape"][0],
                                 np.ones((4,), np.float32), branch=-1)

    def frame_map(dets, labels, valid):
        res = _dets_to_result(np.asarray(dets), np.asarray(labels),
                              np.asarray(valid), 31)
        gt_mask = sample["gt_mask"][1]
        m, _ = eval_map([res], [sample["gt_bboxes"][1][gt_mask]],
                        [sample["gt_labels"][1][gt_mask]],
                        iou_thr=0.3, print_summary=False)
        return m

    out32 = detect(eng_h, trained)
    eng16 = HNMBRCNN(hnmb_model, train_cfg, test_cfg, dtype=jnp.bfloat16)
    eng16.window, eng16.key_dim = 3, 1
    out16 = detect(eng16, eng16.cast_head_params_bf16(trained))

    map32, map16 = frame_map(*out32), frame_map(*out16)
    frac, box_px, score_d = det_drift(*out32, *out16)
    print(f"\nHVRNet trained budget: mAP f32={map32:.4f} bf16={map16:.4f} "
          f"Δ={abs(map32 - map16):.4f}; matched={frac:.2f} "
          f"max|Δbox|={box_px:.3f}px max|Δscore|={score_d:.4f}")
    assert map32 >= 0.5                       # the recipe actually localized
    assert abs(map32 - map16) <= 0.05         # bf16 budget, HVRNet flavor
    assert frac >= 0.9
    assert box_px <= 4.0
    assert score_d <= 0.05

    # ---- streaming ring ≡ exact ring on TRAINED weights (whole video)
    from hvrnet_tpu.engine import SlidingWindowRunner

    def frames_iter():
        for i in range(3):
            yield dict(img=np.asarray(sample["imgs"][i][None]),
                       img_shape=np.asarray(sample["img_shape"][i]),
                       pad_shape=np.asarray(sample["pad_shape"][i]),
                       scale_factor=np.ones((4,), np.float32),
                       key_frame_flag=0 if i == 0 else (1 if i == 2 else 2),
                       frame_offset=i, seg_len=3, frame_start_id=1)

    eng_stream = HNMBRCNN(hnmb_model, train_cfg, test_cfg, dtype=jnp.float32)
    eng_stream.window, eng_stream.key_dim = 3, 1
    eng_stream.stream = True
    want = SlidingWindowRunner(eng_h, trained, branch=-1).run(
        frames_iter(), num_frames=3)
    got = SlidingWindowRunner(eng_stream, trained, branch=-1).run(
        frames_iter(), num_frames=3)
    for i, (a, b) in enumerate(zip(want, got)):
        for cls, (ca, cb) in enumerate(zip(a, b)):
            np.testing.assert_allclose(ca, cb, rtol=1e-4, atol=1e-4,
                                       err_msg=f"frame {i} class {cls}")
