"""Flip-augmented testing end to end (reference test_mixins.py:15-110 +
merge_augs.py semantics on the video window machine)."""
import numpy as np
import jax
import jax.numpy as jnp

from hvrnet_tpu.engine import HNMBRCNN, SelsaRCNN, SlidingWindowRunner
from tests.test_engine_hnmb import tiny_hnmb_cfg
from tests.test_engine_selsa import tiny_selsa_cfg


def _stream(n_frames, h=96, w=128, aug=True, swap=False, seed=0):
    """Synthetic stream with flip-aug variants (mirrors test_frame_stream)."""
    rng = np.random.default_rng(seed)
    ih, iw = h - 10, w - 6
    for i in range(n_frames):
        img = rng.normal(size=(h, w, 3)).astype(np.float32)
        img[ih:] = 0.0
        img[:, iw:] = 0.0
        img_f = img.copy()
        img_f[:, :iw] = img_f[:, :iw][:, ::-1]
        flag = 0 if i == 0 else (1 if i == n_frames - 1 else 2)
        out = dict(img=jnp.asarray(img[None]),
                   img_shape=np.array([ih, iw], np.float32),
                   pad_shape=np.array([h, w], np.float32),
                   scale_factor=np.array([1.0, 1.0, 1.0, 1.0], np.float32),
                   key_frame_flag=flag, frame_offset=i, seg_len=n_frames,
                   frame_start_id=1)
        if aug:
            augs = [jnp.asarray(img[None]), jnp.asarray(img_f[None])]
            flips = (False, True)
            if swap:
                augs = augs[::-1]
                flips = (True, False)
            out["img_augs"] = augs
            out["flips"] = flips
        yield out


def _flatten(results):
    return [np.concatenate([c.reshape(-1) for c in r]) for r in results]


def test_duplicate_aug_equals_plain_path():
    """With two IDENTICAL un-flipped augs, the merged-proposal aug pipeline
    must reproduce the plain window path (duplicate proposals are suppressed
    by the merge NMS at IoU 1, scores average to themselves)."""
    model_cfg, test_cfg = tiny_selsa_cfg()
    engine = SelsaRCNN(model_cfg, None, test_cfg)
    params = engine.init_params(jax.random.PRNGKey(0))

    n = 5
    plain = SlidingWindowRunner(engine, params).run(
        _stream(n, aug=False), num_frames=n)

    def dup_stream():
        for f in _stream(n, aug=False):
            f["img_augs"] = [f["img"], f["img"]]
            f["flips"] = (False, False)
            yield f

    auged = SlidingWindowRunner(engine, params, aug=True).run(
        dup_stream(), num_frames=n)
    for i, (a, b) in enumerate(zip(_flatten(plain), _flatten(auged))):
        assert a.shape == b.shape, f"frame {i}"
        np.testing.assert_allclose(a, b, rtol=2e-3, atol=2e-3,
                                   err_msg=f"frame {i}")


def test_window_aug_order_invariance():
    """Swapping the aug axis (and the matching flip flags) must not change
    the merged detections: the per-aug decode maps back with the right flip
    and the merge is a permutation-invariant average."""
    model_cfg, test_cfg = tiny_selsa_cfg()
    engine = SelsaRCNN(model_cfg, None, test_cfg)
    params = engine.init_params(jax.random.PRNGKey(1))
    T, P = engine.window, engine.proposal_num
    rng = np.random.default_rng(3)
    fc1_stacks = jnp.asarray(
        rng.normal(size=(2, T, P, 1024)).astype(np.float32))
    x1 = rng.uniform(0, 80, (T, P)); y1 = rng.uniform(0, 60, (T, P))
    boxes = jnp.asarray(np.stack(
        [x1, y1, x1 + rng.uniform(5, 40, (T, P)),
         y1 + rng.uniform(5, 25, (T, P))], axis=-1).astype(np.float32))
    masks = jnp.ones((T, P), bool)
    ish = np.array([86.0, 122.0], np.float32)
    sf = np.array([1.0] * 4, np.float32)
    d1, l1, m1 = engine.window_detect_aug(
        params, fc1_stacks, boxes, masks, [ish] * 2, [sf] * 2, (False, True))
    d2, l2, m2 = engine.window_detect_aug(
        params, fc1_stacks[::-1], boxes, masks, [ish] * 2, [sf] * 2,
        (True, False))
    np.testing.assert_array_equal(np.asarray(m1), np.asarray(m2))
    np.testing.assert_array_equal(np.asarray(l1), np.asarray(l2))
    np.testing.assert_allclose(np.asarray(d1), np.asarray(d2),
                               rtol=1e-4, atol=1e-4)


def test_flip_aug_runs_and_differs_from_plain():
    """The flip branch is live end to end: [img, flip] detections exist for
    every frame and differ from the un-augmented pipeline."""
    model_cfg, test_cfg = tiny_selsa_cfg()
    engine = SelsaRCNN(model_cfg, None, test_cfg)
    params = engine.init_params(jax.random.PRNGKey(1))
    n = 4
    auged = SlidingWindowRunner(engine, params, aug=True).run(
        _stream(n, aug=True), num_frames=n)
    assert all(r is not None and len(r) == 30 for r in auged)
    plain = _flatten(SlidingWindowRunner(engine, params).run(
        _stream(n, aug=False), num_frames=n))
    f1 = _flatten(auged)
    assert any(a.shape != p.shape or not np.allclose(a, p)
               for a, p in zip(f1, plain))


def test_hnmb_aug_test_runs_and_selects_branch():
    model_cfg, test_cfg = tiny_hnmb_cfg()
    engine = HNMBRCNN(model_cfg, None, test_cfg)
    params = engine.init_params(jax.random.PRNGKey(2))
    n = 4
    rf = SlidingWindowRunner(engine, params, aug=True, branch=-1).run(
        _stream(n, aug=True), num_frames=n)
    rb = SlidingWindowRunner(engine, params, aug=True, branch=0).run(
        _stream(n, aug=True), num_frames=n)
    assert all(r is not None and len(r) == 30 for r in rf)
    ff, fb = _flatten(rf), _flatten(rb)
    assert any(a.shape != b.shape or not np.allclose(a, b)
               for a, b in zip(ff, fb))


def test_faster_rcnn_aug_test_duplicate_identity():
    """Still-image aug_test (two_stage.py:301 semantics): duplicate
    un-flipped augs must reproduce simple_test."""
    from hvrnet_tpu.engine.detector import FasterRCNN
    from tests.test_train_faster_ssd import _faster_cfg

    cfg = _faster_cfg()
    test_cfg = dict(
        rpn=dict(nms_pre=200, nms_post=8, max_num=8, nms_thr=0.7,
                 min_bbox_size=0),
        rcnn=dict(score_thr=0.02, nms=dict(type='nms', iou_thr=0.5),
                  max_per_img=20))
    eng = FasterRCNN(cfg, None, test_cfg)
    params = eng.init_params(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    # inflate fc_reg so per-class deltas are SIGNIFICANT — at the default
    # std=0.001 init the deltas are ~0 and the identity would pass even if
    # aug_test decoded the wrong class's boxes (it once collapsed to the
    # argmax class; this keeps that regression visible)
    p = dict(params); inner = dict(p["params"]); bh = dict(inner["bbox_head"])
    fr = dict(bh["fc_reg"])
    fr["kernel"] = jnp.asarray(
        rng.normal(0, 0.05, np.asarray(fr["kernel"]).shape).astype(np.float32))
    bh["fc_reg"] = fr; inner["bbox_head"] = bh; p["params"] = inner
    params = p
    h, w = 64, 96
    img = rng.normal(size=(1, h, w, 3)).astype(np.float32)
    ish = np.array([h - 4.0, w - 2.0], np.float32)
    psh = np.array([float(h), float(w)], np.float32)
    sf = np.array([1.0] * 4, np.float32)

    d0, l0, m0 = eng.simple_test(params, jnp.asarray(img), ish, psh, sf)
    d1, l1, m1 = eng.aug_test(params, [jnp.asarray(img)] * 2, [ish] * 2,
                              [psh] * 2, [sf] * 2, (False, False))
    a = np.asarray(d0)[np.asarray(m0)]
    b = np.asarray(d1)[np.asarray(m1)]
    assert a.shape == b.shape
    np.testing.assert_allclose(a, b, rtol=2e-3, atol=2e-3)

    # flip branch live: [img, flip] differs but stays valid
    img_f = img.copy()
    iw = int(ish[1])
    img_f[0, :, :iw] = img_f[0, :, :iw][:, ::-1]
    d2, l2, m2 = eng.aug_test(params, [jnp.asarray(img), jnp.asarray(img_f)],
                              [ish] * 2, [psh] * 2, [sf] * 2, (False, True))
    c = np.asarray(d2)[np.asarray(m2)]
    assert np.isfinite(c).all()
    assert c.shape != a.shape or not np.allclose(c, a)
