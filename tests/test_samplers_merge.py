"""Sampler variants + aug merging."""
import numpy as np
import jax
import jax.numpy as jnp

from hvrnet_tpu.core.merge_augs import merge_aug_bboxes, merge_aug_proposals
from hvrnet_tpu.core.samplers import (combined_sample, iou_balanced_neg_sample,
                                      instance_balanced_pos_sample,
                                      ohem_forward_sample, pseudo_sample)
from hvrnet_tpu.core.targets import AssignResult


def make_assign(gt_inds, ious=None):
    gt_inds = jnp.asarray(gt_inds, jnp.int32)
    ious = (jnp.asarray(ious, jnp.float32) if ious is not None
            else jnp.zeros(gt_inds.shape, jnp.float32))
    return AssignResult(gt_inds, ious, jnp.zeros_like(gt_inds))


def test_pseudo_sampler():
    ar = make_assign([1, 0, 2, -1, 0])
    pos, neg = pseudo_sample(ar)
    np.testing.assert_array_equal(np.asarray(pos), [1, 0, 1, 0, 0])
    np.testing.assert_array_equal(np.asarray(neg), [0, 1, 0, 0, 1])


def test_instance_balanced_spreads_over_gts():
    # 10 boxes on gt1, 2 boxes on gt2; expect both gts represented in top-4
    gt_inds = [1] * 10 + [2] * 2 + [0] * 4
    ar = make_assign(gt_inds)
    idx, ok = instance_balanced_pos_sample(jax.random.PRNGKey(0), ar, 4, 4)
    chosen_gts = set(int(g) for g, o in
                     zip(np.asarray(ar.gt_inds)[np.asarray(idx)],
                         np.asarray(ok)) if o)
    assert 2 in chosen_gts


def test_iou_balanced_neg_selects_eligible_only():
    gt_inds = [0] * 8 + [1] * 2
    ious = list(np.linspace(0, 0.45, 8)) + [0.9, 0.8]
    ar = make_assign(gt_inds, ious)
    idx, ok = iou_balanced_neg_sample(jax.random.PRNGKey(1), ar, 6)
    sel = np.asarray(idx)[np.asarray(ok)]
    assert (np.asarray(ar.gt_inds)[sel] == 0).all()
    assert len(sel) == 6


def test_ohem_forward_picks_hardest():
    gt_inds = [1, 1, 0, 0, 0, 0]
    loss = jnp.asarray([0.1, 5.0, 3.0, 0.2, 9.0, 1.0])
    ar = make_assign(gt_inds)
    (pidx, pok), (nidx, nok) = ohem_forward_sample(loss, ar, 3, 1 / 3)
    assert int(pidx[0]) == 1          # hardest positive
    hard_negs = set(np.asarray(nidx)[np.asarray(nok)].tolist())
    assert 4 in hard_negs and 2 in hard_negs


def test_combined_sampler_counts():
    gt_inds = [1] * 5 + [0] * 20
    ious = [0.8] * 5 + list(np.linspace(0, 0.45, 20))
    ar = make_assign(gt_inds, ious)
    (pidx, pok), (nidx, nok) = combined_sample(jax.random.PRNGKey(2), ar,
                                               num=8, pos_fraction=0.25)
    assert int(np.asarray(pok).sum()) == 2
    assert int(np.asarray(nok).sum()) == 6


def test_merge_aug_bboxes_unflips():
    meta_plain = dict(img_shape=jnp.asarray([100.0, 200.0]),
                      scale_factor=1.0, flip=False)
    meta_flip = dict(img_shape=jnp.asarray([100.0, 200.0]),
                     scale_factor=1.0, flip=True)
    b = jnp.asarray([[10.0, 10.0, 50.0, 40.0]])
    b_flipped = jnp.asarray([[200 - 50 - 1, 10.0, 200 - 10 - 1, 40.0]])
    merged, _ = merge_aug_bboxes([b, b_flipped], None,
                                 [meta_plain, meta_flip])
    np.testing.assert_allclose(np.asarray(merged), np.asarray(b), atol=1e-4)


def test_merge_aug_proposals_nms():
    meta = dict(img_shape=jnp.asarray([100.0, 200.0]), scale_factor=1.0,
                flip=False)
    p1 = jnp.asarray([[10.0, 10, 50, 50, 0.9], [100, 10, 150, 60, 0.7]])
    p2 = jnp.asarray([[11.0, 11, 51, 51, 0.8], [60, 60, 90, 90, 0.6]])
    cfg = dict(nms_thr=0.5, max_num=4)
    out, keep = merge_aug_proposals([p1, p2], [meta, meta], cfg)
    kept = np.asarray(out)[np.asarray(keep)]
    assert len(kept) == 3  # overlapping pair collapses to one
    assert kept[0, 4] == 0.9
