"""Mask-branch and SSD objectives."""
import numpy as np
import jax
import jax.numpy as jnp

from hvrnet_tpu.engine.train_mask import mask_branch_loss, ssd_targets_and_loss
from hvrnet_tpu.ops.anchors import AnchorGenerator


def test_mask_branch_loss_discriminates():
    R, C = 6, 5
    rng = np.random.default_rng(0)
    gt_masks = np.zeros((R, 32, 32), np.float32)
    gt_masks[:, 8:24, 8:24] = 1.0
    rois = jnp.asarray(
        np.tile([0, 8.0, 8.0, 23.0, 23.0], (R, 1)).astype(np.float32))
    labels = jnp.asarray(np.full(R, 2))
    pos = jnp.asarray(np.ones(R, bool))
    # perfect prediction (big positive logits inside the target class)
    good = jnp.full((R, 28, 28, C), -10.0).at[..., 1].set(10.0)
    bad = jnp.full((R, 28, 28, C), -10.0).at[..., 1].set(-10.0)
    lg = float(mask_branch_loss(good, jnp.asarray(gt_masks), rois, labels, pos))
    lb = float(mask_branch_loss(bad, jnp.asarray(gt_masks), rois, labels, pos))
    # outermost-bin sampling differs from the reference's crop-resize by ≤1
    # row/col (see mask_target docstring), so "perfect" isn't exactly 0
    assert lg < 0.1 * lb
    assert lb > 5.0


def test_ssd_loss_hard_negative_mining():
    gen = AnchorGenerator(16, (1.0, 2.0), (0.5, 1.0, 2.0))
    anchors = jnp.asarray(gen.grid_anchors((8, 8), 16))
    A = anchors.shape[0]
    rng = np.random.default_rng(1)
    gt = jnp.asarray([[16.0, 16.0, 64.0, 64.0]])
    gm = jnp.asarray([True])
    gl = jnp.asarray([3])
    logits = jnp.asarray(rng.normal(size=(A, 10)).astype(np.float32))
    deltas = jnp.asarray(rng.normal(size=(A, 4)).astype(np.float32) * 0.1)
    lc, lb = ssd_targets_and_loss(logits, deltas, anchors, gt, gm, gl)
    assert np.isfinite(float(lc)) and np.isfinite(float(lb))
    assert float(lc) > 0 and float(lb) > 0

    # loss drops when logits predict the assignment correctly
    from hvrnet_tpu.core.targets import max_iou_assign
    ar = max_iou_assign(anchors, gt, gm, gl, 0.5, 0.5, 0.2)
    perfect = jax.nn.one_hot(ar.labels, 10) * 20.0
    lc2, _ = ssd_targets_and_loss(perfect, deltas, anchors, gt, gm, gl)
    assert float(lc2) < float(lc)
