"""NMS: static pick-loop vs a sequential greedy numpy oracle."""
import numpy as np
import jax.numpy as jnp

from hvrnet_tpu.ops import multiclass_nms_static, nms_static


def greedy_nms_np(boxes, scores, thr):
    order = scores.argsort()[::-1]
    keep = []
    suppressed = np.zeros(len(boxes), bool)
    area = (boxes[:, 2] - boxes[:, 0] + 1) * (boxes[:, 3] - boxes[:, 1] + 1)
    for i in order:
        if suppressed[i]:
            continue
        keep.append(i)
        xs = np.maximum(boxes[i, 0], boxes[:, 0]); xe = np.minimum(boxes[i, 2], boxes[:, 2])
        ys = np.maximum(boxes[i, 1], boxes[:, 1]); ye = np.minimum(boxes[i, 3], boxes[:, 3])
        ov = np.maximum(xe - xs + 1, 0) * np.maximum(ye - ys + 1, 0)
        iou = ov / (area[i] + area - ov)
        suppressed |= iou > thr
    return np.asarray(keep)


def rand_dets(rng, n):
    cx = rng.uniform(50, 900, n)
    cy = rng.uniform(50, 500, n)
    w = rng.uniform(10, 200, n)
    h = rng.uniform(10, 200, n)
    boxes = np.stack([cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2], -1)
    scores = rng.uniform(0, 1, n)
    return boxes.astype(np.float32), scores.astype(np.float32)


def test_nms_static_matches_greedy_oracle():
    rng = np.random.default_rng(3)
    for trial in range(5):
        boxes, scores = rand_dets(rng, 200)
        ref = greedy_nms_np(boxes, scores, 0.7)
        idx, mask = nms_static(jnp.asarray(boxes), jnp.asarray(scores), 0.7, 200)
        got = np.asarray(idx)[np.asarray(mask)]
        np.testing.assert_array_equal(got, ref)


def test_nms_static_truncates_like_reference():
    rng = np.random.default_rng(4)
    boxes, scores = rand_dets(rng, 300)
    ref = greedy_nms_np(boxes, scores, 0.5)[:30]
    idx, mask = nms_static(jnp.asarray(boxes), jnp.asarray(scores), 0.5, 30)
    got = np.asarray(idx)[np.asarray(mask)]
    np.testing.assert_array_equal(got, ref)


def test_nms_static_respects_validity_mask():
    rng = np.random.default_rng(5)
    boxes, scores = rand_dets(rng, 100)
    valid = np.zeros(100, bool)
    valid[:60] = True
    ref = greedy_nms_np(boxes[:60], scores[:60], 0.6)
    idx, mask = nms_static(jnp.asarray(boxes), jnp.asarray(scores), 0.6, 100,
                           valid=jnp.asarray(valid))
    got = np.asarray(idx)[np.asarray(mask)]
    np.testing.assert_array_equal(got, ref)


def multiclass_nms_np(bboxes, scores, score_thr, iou_thr, max_num):
    """Oracle mirroring reference bbox_nms.py:6-67 (per-class thr+nms, global cap)."""
    dets, labels = [], []
    for c in range(1, scores.shape[1]):
        inds = scores[:, c] > score_thr
        if not inds.any():
            continue
        b = bboxes[inds]
        s = scores[inds, c]
        keep = greedy_nms_np(b, s, iou_thr)
        for k in keep:
            dets.append(np.concatenate([b[k], [s[k]]]))
            labels.append(c - 1)
    if not dets:
        return np.zeros((0, 5)), np.zeros((0,), np.int64)
    dets = np.stack(dets)
    labels = np.asarray(labels)
    if len(dets) > max_num:
        order = dets[:, -1].argsort()[::-1][:max_num]
        dets, labels = dets[order], labels[order]
    return dets, labels


def test_multiclass_nms_matches_oracle():
    rng = np.random.default_rng(6)
    n, c = 120, 6
    boxes, _ = rand_dets(rng, n)
    scores = rng.uniform(0, 1, (n, c)).astype(np.float32)
    scores /= scores.sum(1, keepdims=True)
    ref_d, ref_l = multiclass_nms_np(boxes, scores, 0.05, 0.5, 40)
    dets, labels, mask = multiclass_nms_static(
        jnp.asarray(boxes), jnp.asarray(scores), 0.05, 0.5, 40)
    m = np.asarray(mask)
    got_d = np.asarray(dets)[m]
    got_l = np.asarray(labels)[m]
    assert got_d.shape[0] == ref_d.shape[0]
    # order by score descending in both (oracle keeps per-class order then sorts)
    o1 = np.lexsort((got_l, -got_d[:, -1]))
    o2 = np.lexsort((ref_l, -ref_d[:, -1]))
    np.testing.assert_allclose(got_d[o1], ref_d[o2], rtol=1e-5, atol=1e-4)
    np.testing.assert_array_equal(got_l[o1], ref_l[o2])


def test_grouped_union_equals_per_class_vmap():
    """The single grouped pick loop must reproduce per-class NMS exactly
    (fuzz over seeds; heavy overlap to force deep suppression chains)."""
    import jax

    for seed in range(3):
        rng = np.random.default_rng(seed)
        n, ncls = 60, 7
        centers = rng.random((n, 2)) * 60
        wh = rng.random((n, 2)) * 50 + 5
        boxes = np.concatenate([centers - wh / 2, centers + wh / 2],
                               1).astype(np.float32)
        scores = rng.random((n, ncls)).astype(np.float32)
        dets, labels, mask = multiclass_nms_static(
            jnp.asarray(boxes), jnp.asarray(scores), 0.3, 0.5, 25)

        # per-class reference: independent nms_static per foreground class
        fg = ncls - 1
        flat = []
        for c in range(fg):
            s = scores[:, c + 1]
            v = s > 0.3
            ki, km = nms_static(jnp.asarray(boxes), jnp.asarray(s), 0.5, 25,
                                jnp.asarray(v))
            ki, km = np.asarray(ki), np.asarray(km)
            for i, ok in zip(ki, km):
                if ok:
                    flat.append((float(s[i]), c, boxes[i]))
        flat.sort(key=lambda t: -t[0])
        flat = flat[:25]
        got = [(round(float(d[4]), 6), int(l)) for d, l, m in
               zip(np.asarray(dets), np.asarray(labels), np.asarray(mask))
               if m]
        want = [(round(s, 6), c) for s, c, _ in flat]
        assert got == want, (seed, got, want)


def test_nms_static_lanes_equals_independent_lanes():
    """One shared pick loop over B lanes must reproduce per-lane nms_static
    (which is itself oracle-exact) — both the survivors and their order."""
    from hvrnet_tpu.ops.nms import nms_static_lanes

    rng = np.random.default_rng(7)
    B, n, quota = 4, 150, 40
    boxes = np.stack([rand_dets(rng, n)[0] for _ in range(B)])
    scores = rng.uniform(0, 1, (B, n)).astype(np.float32)
    valid = rng.uniform(size=(B, n)) > 0.2
    li, lm = nms_static_lanes(jnp.asarray(boxes), jnp.asarray(scores), 0.6,
                              quota, valid=jnp.asarray(valid))
    for b in range(B):
        si, sm = nms_static(jnp.asarray(boxes[b]), jnp.asarray(scores[b]),
                            0.6, quota, valid=jnp.asarray(valid[b]))
        np.testing.assert_array_equal(np.asarray(lm[b]), np.asarray(sm))
        np.testing.assert_array_equal(np.asarray(li[b])[np.asarray(lm[b])],
                                      np.asarray(si)[np.asarray(sm)])


def test_nms_static_lanes_with_class_groups_equals_grouped_per_lane():
    """Lanes + per-class suppression groups ≡ per-lane grouped nms_static
    (the batched multiclass-decode shape)."""
    from hvrnet_tpu.ops.nms import nms_static_lanes

    rng = np.random.default_rng(8)
    B, n, quota, ncls = 3, 120, 25, 5
    boxes = np.stack([rand_dets(rng, n)[0] for _ in range(B)])
    scores = rng.uniform(0, 1, (B, n)).astype(np.float32)
    cls = rng.integers(0, ncls, (B, n)).astype(np.int32)
    li, lm = nms_static_lanes(jnp.asarray(boxes), jnp.asarray(scores), 0.5,
                              quota, sup_groups=jnp.asarray(cls))
    for b in range(B):
        si, sm = nms_static(jnp.asarray(boxes[b]), jnp.asarray(scores[b]),
                            0.5, quota, groups=jnp.asarray(cls[b]))
        np.testing.assert_array_equal(np.asarray(lm[b]), np.asarray(sm))
        np.testing.assert_array_equal(np.asarray(li[b])[np.asarray(lm[b])],
                                      np.asarray(si)[np.asarray(sm)])


def test_nms_quota_truncation_per_lane():
    """Per-lane quotas truncate exactly like per-lane greedy NMS[:quota]
    even when one lane's survivors dominate the global score order."""
    from hvrnet_tpu.ops.nms import nms_static_lanes

    rng = np.random.default_rng(9)
    B, n, quota = 2, 200, 10
    boxes = np.stack([rand_dets(rng, n)[0] for _ in range(B)])
    scores = np.stack([rng.uniform(0.5, 1.0, n),      # lane 0 dominates
                       rng.uniform(0.0, 0.5, n)]).astype(np.float32)
    li, lm = nms_static_lanes(jnp.asarray(boxes), jnp.asarray(scores), 0.6,
                              quota)
    for b in range(B):
        ref = greedy_nms_np(boxes[b], scores[b], 0.6)[:quota]
        got = np.asarray(li[b])[np.asarray(lm[b])]
        np.testing.assert_array_equal(got, ref)


def test_multiclass_nms_lanes_equals_per_lane():
    """One shared multiclass decode over B lanes must reproduce per-lane
    multiclass_nms_static exactly (dets, labels, and order)."""
    from hvrnet_tpu.ops.nms import multiclass_nms_static_lanes

    rng = np.random.default_rng(11)
    B, n, ncls, max_num = 3, 80, 6, 30
    boxes = np.stack([rand_dets(rng, n)[0] for _ in range(B)])
    scores = rng.dirichlet(np.ones(ncls), (B, n)).astype(np.float32)
    valid = rng.uniform(size=(B, n)) > 0.15
    ld, ll, lm = multiclass_nms_static_lanes(
        jnp.asarray(boxes), jnp.asarray(scores), 0.02, 0.5, max_num,
        valid=jnp.asarray(valid))
    for b in range(B):
        sd, sl, sm = multiclass_nms_static(
            jnp.asarray(boxes[b]), jnp.asarray(scores[b]), 0.02, 0.5,
            max_num, valid=jnp.asarray(valid[b]))
        np.testing.assert_array_equal(np.asarray(lm[b]), np.asarray(sm))
        np.testing.assert_allclose(np.asarray(ld[b]), np.asarray(sd),
                                   rtol=0, atol=0)
        np.testing.assert_array_equal(np.asarray(ll[b]), np.asarray(sl))


def test_multiclass_nms_lanes_class_specific_boxes():
    """(N, C*4) per-class regression boxes through the lanes decode."""
    from hvrnet_tpu.ops.nms import multiclass_nms_static_lanes

    rng = np.random.default_rng(12)
    B, n, ncls, max_num = 2, 60, 4, 20
    boxes = np.stack(
        [np.concatenate([rand_dets(rng, n)[0] for _ in range(ncls)], axis=1)
         for _ in range(B)])
    scores = rng.dirichlet(np.ones(ncls), (B, n)).astype(np.float32)
    ld, ll, lm = multiclass_nms_static_lanes(
        jnp.asarray(boxes), jnp.asarray(scores), 0.05, 0.6, max_num)
    for b in range(B):
        sd, sl, sm = multiclass_nms_static(
            jnp.asarray(boxes[b]), jnp.asarray(scores[b]), 0.05, 0.6,
            max_num)
        np.testing.assert_array_equal(np.asarray(lm[b]), np.asarray(sm))
        np.testing.assert_allclose(np.asarray(ld[b]), np.asarray(sd),
                                   rtol=0, atol=0)
        np.testing.assert_array_equal(np.asarray(ll[b]), np.asarray(sl))
