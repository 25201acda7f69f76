"""bf16 accuracy budget: end-to-end detection deltas of the bf16 compute
path vs f32 (VERDICT round-2 item 6).

`bench.py` measures with ``dtype=bfloat16`` (bf16 MXU compute + pre-cast
head kernels); the mAP-within-0.3 target (BASELINE.md §targets) therefore
needs the bf16-vs-f32 *end-to-end* delta on record — the earlier
Δboxes == 0.0 claim covered only the parameter pre-cast
(`engine/detector.py:cast_head_params_bf16`), not bf16 compute.

Two budgets, both deterministic (fixed seeds, both paths pure functions):

* SELSA, TRAINED weights (the meaningful one): overfit the fixture batch
  exactly as `test_training_improves_map_on_fixture`, then run the full
  test path (frame_features → window_detect → multiclass NMS decode) in
  f32 and bf16 and bound the mAP delta and matched per-box drift.
* HVRNet (HRNMP 4-block head), random weights: bound the raw numeric
  drift of the deeper relation-head graph through the same path.

Measured values are printed so BASELINE.md can cite them (run with -s).
"""
import os.path as osp

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tests.test_vid_dataset import TRAIN_PIPELINE, mini_vid  # noqa: F401


def det_drift(d32, l32, v32, d16, l16, v16, match_px=8.0):
    """Greedy same-label nearest matching between two decoded det sets.

    Returns (matched_frac, max_box_px, max_score_delta) over the f32 rows:
    each valid f32 det is matched to the closest unused valid bf16 det of
    the same label within ``match_px`` (corner L∞ distance).
    """
    d32, l32, v32 = map(np.asarray, (d32, l32, v32))
    d16, l16, v16 = map(np.asarray, (d16, l16, v16))
    rows32 = np.flatnonzero(v32)
    rows16 = list(np.flatnonzero(v16))
    matched, box_px, score_d = 0, 0.0, 0.0
    for i in rows32:
        best, best_dist = None, match_px
        for j in rows16:
            if l16[j] != l32[i]:
                continue
            dist = np.max(np.abs(d16[j, :4] - d32[i, :4]))
            if dist <= best_dist:
                best, best_dist = j, dist
        if best is None:
            continue
        rows16.remove(best)
        matched += 1
        box_px = max(box_px, float(best_dist))
        score_d = max(score_d, float(abs(d16[best, 4] - d32[i, 4])))
    n32 = len(rows32)
    return (matched / n32 if n32 else 1.0), box_px, score_d


def test_selsa_bf16_budget_trained(mini_vid):  # noqa: F811
    from hvrnet_tpu.core.evaluation.mean_ap import eval_map
    from hvrnet_tpu.data import VIDSeqDataset
    from hvrnet_tpu.engine import SelsaRCNN
    from hvrnet_tpu.engine.stream import collate_train
    from hvrnet_tpu.engine.train import SelsaTrainer
    from hvrnet_tpu.engine.video_runner import _dets_to_result
    from tests.test_train_integration import tiny_model_cfg, tiny_train_cfg

    ds = VIDSeqDataset(
        ann_file=osp.join(mini_vid, "ImageSets/VID_train_15frames.txt"),
        img_prefix=mini_vid, pipeline=TRAIN_PIPELINE, selsa_with_aug=True)
    np.random.seed(0)
    sample = collate_train(ds[0], (64, 96))
    batch = {k: v[None] for k, v in sample.items()}

    proposals = 16
    model_cfg = tiny_model_cfg(sampler_num=8, t_dim=3)
    model_cfg["rpn_head"]["anchor_scales"] = [1, 2, 4, 8]
    train_cfg = tiny_train_cfg(two_stage_sampler=False, num=16)
    train_cfg["rpn"]["allowed_border"] = -1
    test_cfg = dict(
        rpn=dict(nms_pre=100, nms_post=proposals, max_num=proposals,
                 nms_thr=0.7, min_bbox_size=0),
        rcnn=dict(score_thr=0.001, nms=dict(type='nms', iou_thr=0.3),
                  max_per_img=20, key_dim=0),
        bbox_head=dict(sampler_num=proposals, t_dim=3, key_dim=0),
        relation_setup=dict(shuffle=False, video_shuffle=True, has_rpn=True,
                            frame_interval=0, frame_stride=1))

    def mkeng(dtype):
        eng = SelsaRCNN(model_cfg, train_cfg, test_cfg, dtype=dtype)
        eng.window, eng.key_dim = 3, 0
        return eng

    eng32 = mkeng(jnp.float32)
    params0 = eng32.init_params(jax.random.PRNGKey(0))
    trainer = SelsaTrainer(eng32, dict(
        optimizer=dict(lr=5e-3, momentum=0.9, weight_decay=0.0),
        lr_config=dict(step=[], warmup_iters=0)), steps_per_epoch=1000)
    state = trainer.create_state(params0)
    step = trainer.make_train_step(64, 96)
    rng = jax.random.PRNGKey(42)
    for _ in range(300):
        state, _ = step(state, batch, rng)
    trained = jax.device_get(state.params)

    def detect(eng, params):
        feats = [eng.frame_features(
            params, jnp.asarray(sample["imgs"][i][None]),
            sample["img_shape"][i], sample["pad_shape"][i]) for i in range(3)]
        fc1 = jnp.stack([f["fc1"] for f in feats])
        boxes = jnp.stack([f["boxes"] for f in feats])
        masks = jnp.stack([f["mask"] for f in feats])
        return eng.window_detect(params, fc1, boxes, masks,
                                 sample["img_shape"][0],
                                 np.ones((4,), np.float32))

    def frame_map(dets, labels, valid):
        res = _dets_to_result(np.asarray(dets), np.asarray(labels),
                              np.asarray(valid), 31)
        gt_mask = sample["gt_mask"][0]
        m, _ = eval_map([res], [sample["gt_bboxes"][0][gt_mask]],
                        [sample["gt_labels"][0][gt_mask]],
                        iou_thr=0.3, print_summary=False)
        return m

    out32 = detect(eng32, trained)
    eng16 = mkeng(jnp.bfloat16)
    out16 = detect(eng16, eng16.cast_head_params_bf16(trained))

    map32, map16 = frame_map(*out32), frame_map(*out16)
    frac, box_px, score_d = det_drift(*out32, *out16)
    print(f"\nSELSA trained bf16 budget: mAP f32={map32:.4f} "
          f"bf16={map16:.4f} Δ={abs(map32 - map16):.4f}; matched={frac:.2f} "
          f"max|Δbox|={box_px:.3f}px max|Δscore|={score_d:.4f}")

    assert map32 >= 0.5                       # training actually localized
    assert abs(map32 - map16) <= 0.05         # the budget: well inside 0.3
    assert frac >= 0.9                        # bf16 keeps the same dets
    assert box_px <= 4.0                      # on a 64×96 canvas
    assert score_d <= 0.05


def test_hvrnet_bf16_budget_random():
    """HRNMP 4-block head numeric drift, random weights.

    With random weights the multiclass scores are near-uniform ties, so any
    POST-softmax / post-decode quantity is chaotic: a 1e-3 logit flip swaps
    unrelated near-tie classes, and even the f32 proposal SET feeding the
    head shifts whenever an upstream lowering changes reduction order (the
    first version of this test compared decoded boxes downstream of the f32
    RPN NMS picks and regressed from 2.5 to 39 px when the fused s2d stem
    changed the f32 path by one ulp — pure input-selection chaos, no bf16
    accuracy change).  This version bounds what bf16 compute actually
    controls: the RAW head outputs (cls logits, reg deltas) of the full
    4-block test graph on FIXED synthetic inputs, f32 vs bf16.  It guards
    order-of-magnitude regressions (e.g. an f32 accumulation lost to a bf16
    cast); the TRAINED end-to-end budget above is the meaningful detection
    bound.
    """
    from hvrnet_tpu.engine import HNMBRCNN
    from tests.test_engine_hnmb import tiny_hnmb_cfg

    model_cfg, test_cfg = tiny_hnmb_cfg()
    eng32 = HNMBRCNN(model_cfg, None, test_cfg, dtype=jnp.float32)
    eng16 = HNMBRCNN(model_cfg, None, test_cfg, dtype=jnp.bfloat16)
    params = eng32.init_params(jax.random.PRNGKey(0))
    params16 = eng16.cast_head_params_bf16(params)

    T = eng32.window
    P = eng32.proposal_num
    D = int(model_cfg["bbox_head"].get("fc_feat_dim", 1024))
    rng = np.random.default_rng(7)
    fc1 = jnp.asarray(rng.normal(size=(T * P, D)).astype(np.float32))
    masks = jnp.asarray(rng.random((T, P)) > 0.1)

    def head(eng, p, fc1_in):
        mod = eng.module
        return jax.jit(lambda pp, x: mod.apply(
            pp, x, P, P, masks.reshape(-1),
            method=mod.bbox_forward_fc1))(p, fc1_in)

    cls32, reg32 = head(eng32, params, fc1)
    cls16, reg16 = head(eng16, params16, fc1.astype(jnp.bfloat16))

    def drift(a, b):
        return float(jnp.max(jnp.abs(jnp.asarray(a, jnp.float32)
                                     - jnp.asarray(b, jnp.float32))))

    cls_d = max(drift(a, b) for a, b in zip(
        cls32 if isinstance(cls32, (list, tuple)) else [cls32],
        cls16 if isinstance(cls16, (list, tuple)) else [cls16]))
    reg_d = max(drift(a, b) for a, b in zip(
        reg32 if isinstance(reg32, (list, tuple)) else [reg32],
        reg16 if isinstance(reg16, (list, tuple)) else [reg16]))
    scale32 = max(float(jnp.max(jnp.abs(jnp.asarray(a, jnp.float32))))
                  for a in (cls32 if isinstance(cls32, (list, tuple))
                            else [cls32]))
    print(f"\nHVRNet random bf16 budget (raw head outputs): "
          f"max|Δlogit|={cls_d:.4f} (scale {scale32:.2f}) "
          f"max|Δreg|={reg_d:.5f}")
    # bf16 relative error through the 4-block graph is ~1e-2; a lost f32
    # accumulation shows up as drift comparable to the logit scale itself
    assert cls_d <= 0.05 * max(scale32, 1.0)
    assert reg_d <= 0.05
