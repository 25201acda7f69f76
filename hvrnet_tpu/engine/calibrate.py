"""FrozenBN statistic calibration — the from-scratch stand-in for pretrained
running statistics.

Both reference configs freeze every BatchNorm (running stats AND affine) and
rely on the ImageNet-pretrained checkpoint to supply statistics that keep
activations O(1) through the 101-layer backbone
(`/root/reference/configs/faster_rcnn_r101_selsa_c5.py:3,28` norm_eval +
requires_grad=False; `:359` load_from).  Training that topology from random
init with frozen (mean 0, var 1) stats is numerically hopeless: the
caffe-style bottlenecks compound activation scale multiplicatively — c5 std
reaches ~1e9-1e11 at depth 101 (measured; BASELINE.md round-4 budget notes) —
and the head's cheapest descent direction is crushing its feature projection
to zero (observed on the full-canvas miniature recipe: fc1 std 3e-3, dead
prior-only predictions, mAP 0.012).

``calibrate_frozen_bn`` computes data-dependent statistics, which is exactly
what the pretrained ones are.  Design: LSUV-style IN-PASS calibration — the
forward runs with the ``calib`` collection mutable, which switches every
``FrozenBN`` (and the fused stem) to normalize with its own input's
per-channel moments and sow them out (models/layers.py).  Because each BN
already emits post-calibration activations, every downstream BN observes its
final input distribution and the whole network calibrates EXACTLY in one
forward.  (The obvious alternative — capture output moments with the stored
stats and invert the affine — was built first and diverges: simultaneous
updates overshoot by the product of all upstream corrections, a structural
ping-pong that overflows f32 by pass 3 on R50 even with clipped steps.)

Moments are averaged over the provided images.  Because the calibration
forward never reads the stored statistics, one pass is exact and extra
passes reproduce the same moments; ``passes`` exists only to re-measure
after an external change.
"""
from __future__ import annotations

from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

_EPS = 1e-5
_VAR_FLOOR = 1e-8


def _write_stats(params_tree: dict, calib: dict) -> Tuple[int, float]:
    """Copy averaged ``calib`` moments into the matching (mean, var) params
    (the calib tree mirrors the param tree: ``…/bn/{mean,m2}`` ↔
    ``…/bn/{mean,var}``).  Mutates ``params_tree`` in place; returns
    (#BNs written, max |log var-update|)."""
    n, max_step = 0, 0.0
    if "mean" in calib and "m2" in calib:
        mu = np.asarray(calib["mean"], np.float32)
        m2 = np.asarray(calib["m2"], np.float32)
        var = np.maximum(m2 - mu * mu, _VAR_FLOOR)
        old = np.asarray(params_tree["var"], np.float32)
        step = float(np.abs(np.log((var + _EPS) / (old + _EPS))).max())
        params_tree["mean"] = jnp.asarray(mu)
        params_tree["var"] = jnp.asarray(var)
        return 1, step
    for k, v in calib.items():
        if isinstance(v, dict) and k in params_tree:
            dn, ds = _write_stats(params_tree[k], v)
            n += dn
            max_step = max(max_step, ds)
    return n, max_step


def calibrate_frozen_bn(engine, params, imgs: Sequence, passes: int = 1,
                        tol: float = 0.05) -> Tuple[dict, List[dict]]:
    """Set every frozen-BN running statistic from the data.

    engine — a detection engine whose ``module`` exposes ``extract_feat`` /
    ``shared`` (the frame backbone path); params — init tree (returned
    updated, stats-only); imgs — normalized (1, H, W, 3) canvases whose
    moments are averaged.  Returns ``(params, history)``; history rows carry
    the per-pass max |log var-update| (≈0 once stats match the data) and the
    post-pass c5 std diagnostic.
    """
    mod = engine.module

    def calib_fwd(p, img):
        c4, v1 = mod.apply(p, img, method=mod.extract_feat,
                           mutable=["calib"])
        c5, v2 = mod.apply(p, c4, method=mod.shared, mutable=["calib"])
        calib = dict(v1["calib"])
        calib.update(v2["calib"])
        # the sows overwrite (reduce_fn keeps the latest raw array); unwrap
        # defensively in case a stale tuple-form entry survives
        calib = jax.tree.map(lambda t: t[-1] if isinstance(t, tuple) else t,
                             calib, is_leaf=lambda t: isinstance(t, tuple))
        return calib, c5.astype(jnp.float32).std()

    jitted = {}
    history: List[dict] = []
    params = jax.tree.map(lambda x: x, params)     # never mutate the caller's
    for i in range(passes):
        acc = None
        c5_stds = []
        for img in imgs:
            img = jnp.asarray(img)
            if img.shape not in jitted:
                jitted[img.shape] = jax.jit(calib_fwd)
            calib, c5_std = jitted[img.shape](params, img)
            calib = jax.device_get(calib)
            c5_stds.append(float(c5_std))
            acc = calib if acc is None else jax.tree.map(np.add, acc, calib)
        mean_tree = jax.tree.map(lambda a: a / len(imgs), acc)
        n_bn, max_step = _write_stats(params["params"], mean_tree)
        history.append(dict(calib_pass=i + 1, n_bn=n_bn,
                            max_log_var_update=round(max_step, 4),
                            c5_std=round(float(np.mean(c5_stds)), 4)))
        if max_step < tol:
            break
    return params, history
