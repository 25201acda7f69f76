"""Golden tests: box geometry vs independent numpy oracles (reference math)."""
import numpy as np
import jax.numpy as jnp

from hvrnet_tpu.ops import bbox2delta, bbox_overlaps, delta2bbox


def np_bbox2delta(proposals, gt, means, stds):
    px = (proposals[:, 0] + proposals[:, 2]) * 0.5
    py = (proposals[:, 1] + proposals[:, 3]) * 0.5
    pw = proposals[:, 2] - proposals[:, 0] + 1.0
    ph = proposals[:, 3] - proposals[:, 1] + 1.0
    gx = (gt[:, 0] + gt[:, 2]) * 0.5
    gy = (gt[:, 1] + gt[:, 3]) * 0.5
    gw = gt[:, 2] - gt[:, 0] + 1.0
    gh = gt[:, 3] - gt[:, 1] + 1.0
    d = np.stack([(gx - px) / pw, (gy - py) / ph,
                  np.log(gw / pw), np.log(gh / ph)], -1)
    return (d - np.asarray(means)) / np.asarray(stds)


def rand_boxes(rng, n, w=1000, h=600):
    x1 = rng.uniform(0, w - 20, n)
    y1 = rng.uniform(0, h - 20, n)
    x2 = x1 + rng.uniform(1, w / 3, n)
    y2 = y1 + rng.uniform(1, h / 3, n)
    return np.stack([x1, y1, x2, y2], -1).astype(np.float32)


def test_bbox2delta_matches_numpy_oracle():
    rng = np.random.default_rng(0)
    p = rand_boxes(rng, 64)
    g = rand_boxes(rng, 64)
    means, stds = (0., 0., 0., 0.), (0.1, 0.1, 0.2, 0.2)
    out = np.asarray(bbox2delta(jnp.asarray(p), jnp.asarray(g), means, stds))
    ref = np_bbox2delta(p, g, means, stds)
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)


def test_delta2bbox_roundtrip_and_docstring_example():
    # The docstring example from reference transforms.py:64-76.
    rois = jnp.asarray([[0., 0., 1., 1.], [0., 0., 1., 1.],
                        [0., 0., 1., 1.], [5., 5., 5., 5.]])
    deltas = jnp.asarray([[0., 0., 0., 0.], [1., 1., 1., 1.],
                          [0., 0., 2., -1.], [0.7, -1.9, -0.5, 0.3]])
    out = np.asarray(delta2bbox(rois, deltas, max_shape=jnp.asarray([32, 32])))
    expected = np.array([[0.0000, 0.0000, 1.0000, 1.0000],
                         [0.2817, 0.2817, 4.7183, 4.7183],
                         [0.0000, 0.6321, 7.3891, 0.3679],
                         [5.8967, 2.9251, 5.5033, 3.2749]])
    np.testing.assert_allclose(out, expected, atol=1e-3)

    # encode→decode roundtrip (box sizes kept within the wh_ratio_clip range)
    rng = np.random.default_rng(1)

    def boxes(n):
        x1 = rng.uniform(0, 700, n); y1 = rng.uniform(0, 400, n)
        w = rng.uniform(40, 250, n); h = rng.uniform(40, 180, n)
        return np.stack([x1, y1, x1 + w, y1 + h], -1).astype(np.float32)

    p = boxes(128)
    g = boxes(128)
    d = bbox2delta(jnp.asarray(p), jnp.asarray(g))
    back = np.asarray(delta2bbox(jnp.asarray(p), d))
    np.testing.assert_allclose(back, g, rtol=1e-3, atol=1e-2)


def test_bbox_overlaps_matches_plus_one_convention():
    rng = np.random.default_rng(2)
    a = rand_boxes(rng, 37)
    b = rand_boxes(rng, 53)
    out = np.asarray(bbox_overlaps(jnp.asarray(a), jnp.asarray(b)))
    # independent numpy oracle (+1 convention)
    area1 = (a[:, 2] - a[:, 0] + 1) * (a[:, 3] - a[:, 1] + 1)
    area2 = (b[:, 2] - b[:, 0] + 1) * (b[:, 3] - b[:, 1] + 1)
    ref = np.zeros((37, 53), np.float32)
    for i in range(37):
        xs = np.maximum(a[i, 0], b[:, 0]); xe = np.minimum(a[i, 2], b[:, 2])
        ys = np.maximum(a[i, 1], b[:, 1]); ye = np.minimum(a[i, 3], b[:, 3])
        ov = np.maximum(xe - xs + 1, 0) * np.maximum(ye - ys + 1, 0)
        ref[i] = ov / (area1[i] + area2 - ov)
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)
