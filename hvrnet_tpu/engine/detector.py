"""Detector engines — orchestration around the flax TwoStageModule.

Each engine corresponds to a reference detector class
(`/root/reference/mmdet/models/detectors/{two_stage,selsa_rcnn,hnmb_rcnn,
hnl_rcnn}.py`) but is organized TPU-first: the network is a parameter pytree
+ pure methods, and the engine compiles fixed-shape programs:

  * ``frame_features`` — per-frame work done ONCE per frame: backbone C4 →
    dilated-C5 shared head → RPN → static-NMS proposals → RoIAlign →
    fc_new_1 projection.  The reference instead caches raw C4 maps and
    re-runs shared-head + RPN + RoIAlign over the whole T-frame window for
    every output frame (`selsa_rcnn.py:56-83`, `tools/test.py:215-235`);
    per-frame quantities don't depend on the window, so hoisting them is
    numerically identical and ~T× cheaper.
  * ``window_detect`` — the only window-dependent compute: the non-local
    attention head over the cached (T×P, 1024) projections + static
    multiclass NMS.

Both are jitted per static canvas shape; the host-side video state machine
lives in ``video_runner.py``.
"""
from __future__ import annotations

import functools
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..models.anchor_heads.rpn_head import rpn_flat_scores_deltas
from ..models.bbox_heads.bbox_head import get_det_bboxes
from ..models.builder import build_model_module, build_roi_extractor
from ..models.registry import DETECTORS
from ..ops.boxes import delta2bbox
from ..ops.nms import nms_static, nms_static_lanes
from ..utils.config import unwrap
from .canvas import get_canvas


@functools.lru_cache(maxsize=512)
def _dev_const_cached(vals: Tuple[float, ...], shape: Tuple[int, ...],
                      backend: str):
    return jnp.asarray(np.array(vals, np.float32).reshape(shape))


def _dev_f32(x):
    """Device-resident f32 constant, cached by value.

    Frame metadata (img_shape / pad_shape / scale_factor) is constant within
    a video but was converted with ``jnp.asarray`` on EVERY jitted call —
    two to three tiny host→device puts per frame, measured at ~1.6 ms/frame
    on the v5e tunnel (BASELINE.md round-3).  Values repeat, so a value-keyed
    cache makes the transfer once.  jax Arrays pass through untouched; the
    backend is part of the key so CPU-mesh tests and the TPU path never share
    entries."""
    if isinstance(x, jax.Array):
        return x
    a = np.asarray(x, np.float32)
    return _dev_const_cached(tuple(a.reshape(-1).tolist()), a.shape,
                             jax.default_backend())


def _rpn_candidates(cls_map, reg_map, canvas, pad_shape, img_shape, rpn_cfg,
                    target_means=(0., 0., 0., 0.),
                    target_stds=(1., 1., 1., 1.)):
    """Pre-NMS proposal candidates: top-nms_pre decoded boxes + validity.

    Pure map/top_k work (no pick loop), so it vmaps cleanly over frame
    lanes; the NMS stage is split off so batched callers can run all lanes
    through one shared pick loop (``nms_static_lanes``)."""
    scores, deltas = rpn_flat_scores_deltas(cls_map, reg_map)
    avalid = canvas.anchor_valid(pad_shape)
    masked_scores = jnp.where(avalid, scores, -1.0)
    nms_pre = int(rpn_cfg["nms_pre"])
    k = min(nms_pre, masked_scores.shape[0])
    top_scores, topk = jax.lax.top_k(masked_scores, k)
    anchors = canvas.anchors[topk]
    deltas = deltas[topk]
    valid = avalid[topk]
    proposals = delta2bbox(anchors, deltas, target_means, target_stds,
                           max_shape=img_shape)
    min_size = float(rpn_cfg.get("min_bbox_size", 0))
    if min_size > 0:
        w = proposals[:, 2] - proposals[:, 0] + 1
        h = proposals[:, 3] - proposals[:, 1] + 1
        valid = valid & (w >= min_size) & (h >= min_size)
    return proposals, top_scores, valid


def _rpn_proposals(cls_map, reg_map, canvas, pad_shape, img_shape, rpn_cfg,
                   target_means=(0., 0., 0., 0.), target_stds=(1., 1., 1., 1.)):
    """Proposal generation on a static canvas with dynamic anchor validity."""
    proposals, top_scores, valid = _rpn_candidates(
        cls_map, reg_map, canvas, pad_shape, img_shape, rpn_cfg,
        target_means, target_stds)
    nms_post = int(rpn_cfg["nms_post"])
    keep_idx, keep_mask = nms_static(proposals, top_scores,
                                     float(rpn_cfg["nms_thr"]), nms_post,
                                     valid=valid)
    boxes = proposals[keep_idx] * keep_mask[:, None]
    out_scores = jnp.where(keep_mask, top_scores[keep_idx], 0.0)
    return boxes, out_scores, keep_mask


class BaseEngine:
    """Shared plumbing: module construction, param init, frame features."""

    def __init__(self, model_cfg: Dict[str, Any], train_cfg=None,
                 test_cfg=None, dtype=jnp.float32):
        model_cfg = unwrap(model_cfg)
        self.train_cfg = unwrap(train_cfg) if train_cfg else None
        self.test_cfg = unwrap(test_cfg) if test_cfg else None
        # test-time bbox_head overrides (selsa_rcnn.py:40-42 / hnmb_rcnn.py:44-48)
        if self.test_cfg is not None and "bbox_head" in self.test_cfg:
            bh = dict(model_cfg["bbox_head"])
            bh["t_dim"] = int(self.test_cfg["bbox_head"]["t_dim"])
            bh["sampler_num"] = int(self.test_cfg["bbox_head"]["sampler_num"])
            model_cfg = dict(model_cfg, bbox_head=bh)
        self.model_cfg = model_cfg
        self.dtype = dtype
        self.module = build_model_module(model_cfg, dtype)
        self.roi_extractor = build_roi_extractor(model_cfg["bbox_roi_extractor"])
        bh = model_cfg["bbox_head"]
        self.num_classes = int(bh["num_classes"])
        self.target_means = tuple(bh.get("target_means", (0., 0., 0., 0.)))
        self.target_stds = tuple(bh.get("target_stds", (0.1, 0.1, 0.2, 0.2)))
        rh = model_cfg["rpn_head"]
        self.rpn_means = tuple(rh.get("target_means", (0., 0., 0., 0.)))
        self.rpn_stds = tuple(rh.get("target_stds", (1., 1., 1., 1.)))
        self.anchor_scales = tuple(rh.get("anchor_scales", (8, 16, 32)))
        self.anchor_ratios = tuple(rh.get("anchor_ratios", (0.5, 1.0, 2.0)))
        self.anchor_stride = int(rh.get("anchor_strides", [16])[0])
        self.proposal_num = int(self.test_cfg["rpn"]["nms_post"]) if self.test_cfg else 300
        # uint8-transfer path: frames cross host→device as uint8 (4× less
        # PCIe/tunnel traffic) and normalization runs on device.  The values
        # mirror the shipped configs' img_norm_cfg; tools override from the
        # loaded config (both reference pipelines resize in uint8 and
        # normalize afterwards, so this is arithmetic-identical).
        self.img_norm = dict(mean=(103.06, 115.90, 123.15),
                             std=(1.0, 1.0, 1.0))
        # opt-in closure-bound steady-state programs (see bind_params)
        self._bound_params = None
        self._bind_backbone = False
        self._bound_fns: Dict[Any, Any] = {}
        # opt-in SPMD lockstep lanes (see enable_spmd_lanes)
        self.lanes_mesh = None

    # ----------------------------------------------------------------- init
    def init_params(self, rng: jax.Array, canvas_hw=(64, 64)):
        img = jnp.zeros((1, canvas_hw[0], canvas_hw[1], 3), jnp.float32)
        return self.module.init(rng, img)

    def cast_head_params_bf16(self, params):
        """bf16 copies of the relation-head kernels for inference.

        Under ``dtype=bfloat16`` the apply path casts every f32 kernel to
        bf16 at EACH call — for fc_new_1 that is a 205 MB read+convert per
        frame.  Pre-casting the bbox_head subtree is bit-identical (the same
        cast, done once) and was measured at Δboxes == 0.0 on-chip; the
        backbone stays f32-param (casting it regressed conv time).  No-op
        when the engine computes in f32."""
        if self.dtype != jnp.bfloat16:
            return params
        import jax.tree_util as jtu

        def cast(x):
            if hasattr(x, "dtype") and x.dtype == jnp.float32 and x.ndim >= 2:
                return x.astype(jnp.bfloat16)
            return x

        p = dict(params)
        inner = dict(p["params"])
        if "bbox_head" in inner:
            inner["bbox_head"] = jtu.tree_map(cast, inner["bbox_head"])
        p["params"] = inner
        return p

    # --------------------------------------------- closure-bound dispatch
    def bind_params(self, params, backbone: bool = False):
        """Closure-bind ``params`` into the steady-state inference programs.

        Host dispatch cost scales with the argument pytree's leaf count
        (the full 568-leaf param tree ≈ 0.9 ms/call over the device relay
        vs ≈ 0.02 ms for closure-bound constants — BASELINE.md round 3).
        Binding embeds the parameters as compile-time constants: the
        backbone program drops its full-tree argument and the head-side
        programs drop their 40-leaf bbox_head subtree.  The programs are
        otherwise identical (equality-tested, tests/test_bind_params.py).

        The per-frame methods use the bound variant only when called with
        the *same object* (``params is`` identity), so trainers, parity
        tests, and any caller holding different params fall back to the
        regular arg-passing programs untouched.  Each distinct bound params
        object costs a fresh XLA compile — bind once per checkpoint, not
        per step; rebinding (or rebuilding the module) drops the previous
        bound programs.

        ``backbone=True`` also binds the backbone program (the full-tree
        568-leaf argument).  That bind embeds ~240 MB of conv weights — a
        several-minute XLA compile for a dispatch that mostly overlaps
        device compute anyway; head-only binding (the default) captures the
        wall-clock win at a fraction of the compile cost (BASELINE.md
        round 3)."""
        if params is self._bound_params and backbone == self._bind_backbone:
            return params                  # already bound — keep the compiles
        self._bound_params = params
        self._bind_backbone = backbone
        self._bound_fns = {}
        return params

    def _bound_fn(self, key, build):
        fn = self._bound_fns.get(key)
        if fn is None:
            fn = self._bound_fns[key] = build()
        return fn

    @staticmethod
    def _bind_const(fn, params, donate=()):
        """jit of ``fn`` with ``params`` closure-bound as constants.

        ``optimization_barrier`` pins the embedded weights: without it XLA
        constant-folds/reassociates through them and the bound program
        drifts from the arg-passing one (~1e-3 on boxes, measured) — with
        it the two are bit-identical (tests/test_bind_params.py), and the
        dispatch still drops the param-tree argument."""
        def bound(*args):
            return fn(jax.lax.optimization_barrier(params), *args)
        return jax.jit(bound, donate_argnums=donate)

    def enable_kv_sharded_attention(self, mesh) -> None:
        """Shard the relation head's K/V axis over ``mesh`` (sequence
        parallelism for windows beyond one chip's HBM; exact — see
        ops/attention.py:masked_attention_kv_sharded).  Existing params stay
        valid (the mesh adds no parameters); compiled-program caches are
        dropped so the next call traces through the sharded blocks."""
        bh = dict(self.model_cfg["bbox_head"], attention_mesh=mesh)
        self.model_cfg = dict(self.model_cfg, bbox_head=bh)
        self.module = build_model_module(self.model_cfg, self.dtype)
        for name in dir(type(self)):
            attr = getattr(type(self), name, None)
            if hasattr(attr, "cache_clear"):
                attr.cache_clear()
        self._bound_params = None
        self._bound_fns = {}

    def enable_spmd_lanes(self, mesh) -> None:
        """Shard the lockstep batched-stream programs over ``mesh``.

        The batched runner drives B video streams in lockstep
        (``BatchedSlidingWindowRunner``); with a lanes mesh the stream axis
        shards over the devices (B must be a multiple of ``mesh.size``), so N
        video streams run on N chips in ONE program: backbone, proposals,
        ring push and window detect all execute per device on the local
        lanes with no cross-lane coupling.  The grouped NMS pick loops
        (``ops/nms.py:nms_static_lanes``) run per device over the local
        shard — exact either way; the grouping is a latency optimization,
        not a semantic coupling.  This is the single-program scale-out story
        for inference; the reference instead scales out with N processes +
        a part-file merge (`/root/reference/tools/test.py:546-589`), which
        is also supported (``tools/test.py --world-size``).

        Equality: sharded ≡ unsharded batched runner on the 8-device CPU
        mesh (tests/test_spmd_lanes.py), and the unsharded batched runner is
        schedule-exact vs the sequential reference loop
        (tests/test_batched_runner.py)."""
        self.lanes_mesh = mesh

    @staticmethod
    def _lanes_shard(body, mesh, n_lane_args: int, lead_specs=()):
        """jit(shard_map(body)) with ``lead_specs`` replicated leading args
        (the param pytree) and ``n_lane_args`` lane-sharded array args."""
        from jax import shard_map
        from jax.sharding import PartitionSpec as P
        ax = mesh.axis_names[0]
        specs = tuple(lead_specs) + (P(ax),) * n_lane_args
        return shard_map(body, mesh=mesh, in_specs=specs, out_specs=P(ax),
                         check_vma=False)

    def _lanes_put(self, tree):
        """Place a (B, …) pytree sharded on the lane axis of the lanes mesh."""
        from jax.sharding import NamedSharding, PartitionSpec as P
        s = NamedSharding(self.lanes_mesh, P(self.lanes_mesh.axis_names[0]))
        return jax.tree_util.tree_map(lambda x: jax.device_put(x, s), tree)

    def _canvas(self, h: int, w: int):
        return get_canvas(h, w, self.anchor_stride,
                          self.anchor_scales, self.anchor_ratios)

    @staticmethod
    def _bb(params):
        """bbox_head-only variables dict for the head-side programs.

        Dispatch overhead on the tunnel scales with the argument pytree's
        leaf count (~0.9 ms/call for the full 568-leaf tree vs ~0.05 ms for
        a few leaves — BASELINE.md round 3).  The post/window/ring programs
        only read bbox_head (40 leaves), so their wrappers hand them just
        that subtree; flax resolves submodules by name, so ``apply`` over
        the restricted dict is identical."""
        return {"params": {"bbox_head": params["params"]["bbox_head"]}}

    # -------------------------------------------------------- frame program
    # The per-frame work is compiled as TWO programs (backbone+maps, then
    # proposals+RoIAlign+fc1): fused into one, XLA's compile time on this
    # graph explodes (~250 s vs ~30 s split) for no measurable runtime win —
    # the intermediate C4/C5 maps stay device-resident either way.
    def _frame_backbone_body(self):
        mod = self.module

        def fn(params, img):
            c4 = mod.apply(params, img, method=mod.extract_feat)
            c5 = mod.apply(params, c4, method=mod.shared)
            cls_map, reg_map = mod.apply(params, c4, method=mod.rpn)
            return c5, cls_map, reg_map

        return fn

    @functools.lru_cache(maxsize=8)
    def _frame_backbone_fn(self, canvas_h: int, canvas_w: int):
        return jax.jit(self._frame_backbone_body())

    @functools.lru_cache(maxsize=4)
    def _frame_backbone_spmd_fn(self, canvas_h: int, canvas_w: int, mesh):
        from jax.sharding import PartitionSpec as P
        return jax.jit(self._lanes_shard(self._frame_backbone_body(), mesh,
                                         1, lead_specs=(P(),)))

    @functools.lru_cache(maxsize=8)
    def _frame_backbone_u8_fn(self, canvas_h: int, canvas_w: int,
                              mean: tuple = None, std: tuple = None):
        """Backbone program for raw uint8 canvases: normalization and the
        pad-zero mask fuse into the same jit (no extra dispatch / HBM round
        trip).  Replicates Normalize-then-Pad ordering (the reference
        normalizes the resized image and pads with literal zeros,
        transforms.py:293,240): pixels beyond img_shape are forced to 0, not
        (0−mean)/std.  mean/std are part of the cache key so a late
        engine.img_norm override can never hit a stale compiled program."""
        return jax.jit(self._frame_backbone_u8_body(canvas_h, canvas_w,
                                                    mean, std))

    @functools.lru_cache(maxsize=4)
    def _frame_backbone_u8_spmd_fn(self, canvas_h: int, canvas_w: int,
                                   mean: tuple, std: tuple, mesh):
        from jax.sharding import PartitionSpec as P
        return jax.jit(self._lanes_shard(
            self._frame_backbone_u8_body(canvas_h, canvas_w, mean, std),
            mesh, 2, lead_specs=(P(),)))

    def _frame_backbone_u8_body(self, canvas_h: int, canvas_w: int,
                                mean: tuple, std: tuple):
        mod = self.module

        def fn(params, img, img_shape):
            m = jnp.asarray(mean, jnp.float32)
            inv = 1.0 / jnp.asarray(std, jnp.float32)
            x = (img.astype(jnp.float32) - m) * inv
            ish = jnp.atleast_2d(img_shape)                 # (B, 2)
            yy = jnp.arange(canvas_h, dtype=jnp.float32)
            xx = jnp.arange(canvas_w, dtype=jnp.float32)
            valid = ((yy[None, :, None] < ish[:, 0, None, None]) &
                     (xx[None, None, :] < ish[:, 1, None, None]))  # (B, H, W)
            img = x * valid[..., None]
            c4 = mod.apply(params, img, method=mod.extract_feat)
            c5 = mod.apply(params, c4, method=mod.shared)
            cls_map, reg_map = mod.apply(params, c4, method=mod.rpn)
            return c5, cls_map, reg_map

        return fn

    def _backbone_dispatch(self, params, img, img_shape):
        h, w = img.shape[1], img.shape[2]
        bound = params is self._bound_params and self._bind_backbone
        if img.dtype == jnp.uint8:
            mean = tuple(float(v) for v in self.img_norm["mean"])
            std = tuple(float(v) for v in self.img_norm["std"])
            if bound:
                fn = self._bound_fn(
                    ("backbone_u8", h, w, mean, std),
                    lambda: self._bind_const(
                        self._frame_backbone_u8_fn(h, w, mean, std), params))
                return fn(img, _dev_f32(img_shape))
            fn = self._frame_backbone_u8_fn(h, w, mean, std)
            return fn(params, img, _dev_f32(img_shape))
        if bound:
            fn = self._bound_fn(
                ("backbone", h, w),
                lambda: self._bind_const(self._frame_backbone_fn(h, w),
                                         params))
            return fn(img)
        return self._frame_backbone_fn(h, w)(params, img)

    def _frame_post_body(self, canvas_h: int, canvas_w: int):
        canvas = self._canvas(canvas_h, canvas_w)
        rpn_cfg = self.test_cfg["rpn"]
        mod = self.module

        def fn(params, c5, cls_map, reg_map, img_shape, pad_shape):
            boxes, scores, mask = _rpn_proposals(
                cls_map[0], reg_map[0], canvas, pad_shape, img_shape, rpn_cfg,
                self.rpn_means, self.rpn_stds)
            rois = jnp.concatenate(
                [jnp.zeros((boxes.shape[0], 1), boxes.dtype), boxes], axis=1)
            pooled = self.roi_extractor([c5], rois)
            fc1 = mod.apply(params, pooled, method=mod.bbox_precompute_fc1)
            return dict(fc1=fc1, boxes=boxes, scores=scores, mask=mask)

        return fn

    @functools.lru_cache(maxsize=8)
    def _frame_post_fn(self, canvas_h: int, canvas_w: int):
        return jax.jit(self._frame_post_body(canvas_h, canvas_w))

    def frame_features(self, params, img: jnp.ndarray, img_shape, pad_shape):
        """img: (1, H, W, 3) canvas-padded — normalized float32, or raw uint8
        (normalization then fuses into the backbone program)."""
        h, w = img.shape[1], img.shape[2]
        c5, cls_map, reg_map = self._backbone_dispatch(params, img, img_shape)
        if params is self._bound_params:
            post = self._bound_fn(
                ("post", h, w),
                lambda: self._bind_const(self._frame_post_fn(h, w),
                                         self._bb(params)))
        else:
            post = functools.partial(self._frame_post_fn(h, w),
                                     self._bb(params))
        return post(c5, cls_map, reg_map,
                    _dev_f32(img_shape),
                    _dev_f32(pad_shape))

    # ---------------------------------------------------- aug frame program
    @functools.lru_cache(maxsize=4)
    def _frame_post_aug_fn(self, canvas_h: int, canvas_w: int,
                           flips: Tuple[bool, ...]):
        """Multi-aug per-frame processing (reference test_mixins.py:15-35
        `aug_test_rpn` + :71-110 `aug_test_bboxes` adapted to the window
        machine): per-aug RPN proposals merge in ORIGINAL-image coordinates
        (merge_aug_proposals), then the SAME merged set maps into every
        aug's coordinates and pools there, so per-aug head predictions can
        be geometry-consistently averaged at detect time."""
        from ..core.merge_augs import merge_aug_proposals
        from ..ops.boxes import bbox_mapping
        canvas = self._canvas(canvas_h, canvas_w)
        rpn_cfg = self.test_cfg["rpn"]
        mod = self.module

        def fn(params, c5s, cls_maps, reg_maps, img_shapes, pad_shapes,
               scale_factors):
            props, pmasks, metas = [], [], []
            for a, flip in enumerate(flips):
                b, sc, m = _rpn_proposals(
                    cls_maps[a], reg_maps[a], canvas, pad_shapes[a],
                    img_shapes[a], rpn_cfg, self.rpn_means, self.rpn_stds)
                props.append(jnp.concatenate([b, sc[:, None]], axis=1))
                pmasks.append(m)
                metas.append(dict(img_shape=img_shapes[a],
                                  scale_factor=scale_factors[a], flip=flip))
            merged, mmask = merge_aug_proposals(props, metas, rpn_cfg, pmasks)
            fc1s = []
            for a, flip in enumerate(flips):
                boxes_a = bbox_mapping(merged[:, :4], img_shapes[a],
                                       scale_factors[a], flip)
                rois = jnp.concatenate(
                    [jnp.zeros((boxes_a.shape[0], 1), boxes_a.dtype), boxes_a],
                    axis=1)
                pooled = self.roi_extractor([c5s[a:a + 1]], rois)
                fc1s.append(mod.apply(params, pooled,
                                      method=mod.bbox_precompute_fc1))
            return dict(fc1=jnp.stack(fc1s), boxes=merged[:, :4], mask=mmask)

        return jax.jit(fn)

    def frame_features_aug(self, params, imgs, img_shapes, pad_shapes,
                           scale_factors, flips):
        """imgs: list of (1, H, W, 3) canvas-padded per-aug variants of ONE
        frame.  All augs run the backbone as one batch; returns
        fc1 (A, P, D) over the frame's aug-merged proposal set, plus the
        merged boxes (P, 4) in original-image coordinates and their mask."""
        batch = jnp.concatenate(list(imgs), axis=0)
        h, w = batch.shape[1], batch.shape[2]
        c5, cls_map, reg_map = self._frame_backbone_fn(h, w)(params, batch)
        return self._frame_post_aug_fn(h, w, tuple(flips))(
            self._bb(params), c5, cls_map, reg_map,
            _dev_f32(np.asarray(img_shapes)),
            _dev_f32(np.asarray(pad_shapes)),
            _dev_f32(np.asarray(scale_factors)))

    @functools.lru_cache(maxsize=4)
    def _window_aug_fn(self, t_dim: int, key_dim: int,
                       flips: Tuple[bool, ...], branch=None):
        """Aug-merged window detection (reference test_mixins.py:102-110 +
        merge_augs.py:40-66): per-aug head predictions over the SAME merged
        proposals decode in aug coordinates, map back, average, then one
        multiclass NMS."""
        from ..core.merge_augs import merge_aug_bboxes
        from ..ops.boxes import bbox_mapping
        from ..ops.nms import multiclass_nms_static
        rcnn_cfg = self.test_cfg["rcnn"]
        P = self.proposal_num
        logits = self._window_logits(t_dim, key_dim, branch)

        def fn(params, fc1_stacks, boxes_ori, masks, img_shapes,
               scale_factors):
            valid = masks.reshape(t_dim * P)
            aug_boxes, aug_scores, metas = [], [], []
            for a, flip in enumerate(flips):
                cls, reg = logits(params,
                                  fc1_stacks[a].reshape(t_dim * P, -1), valid)
                scores = jax.nn.softmax(cls.astype(jnp.float32), axis=-1)
                key_boxes_a = bbox_mapping(boxes_ori[key_dim], img_shapes[a],
                                           scale_factors[a], flip)
                bboxes = delta2bbox(key_boxes_a, reg.astype(jnp.float32),
                                    self.target_means, self.target_stds,
                                    img_shapes[a])
                aug_boxes.append(bboxes)
                aug_scores.append(scores)
                metas.append(dict(img_shape=img_shapes[a],
                                  scale_factor=scale_factors[a], flip=flip))
            merged_b, merged_s = merge_aug_bboxes(aug_boxes, aug_scores,
                                                  metas, rcnn_cfg)
            return multiclass_nms_static(
                merged_b, merged_s, float(rcnn_cfg["score_thr"]),
                float(rcnn_cfg["nms"]["iou_thr"]),
                int(rcnn_cfg["max_per_img"]), valid=masks[key_dim])

        return jax.jit(fn)

    def window_detect_aug(self, params, fc1_stacks, boxes_ori, masks,
                          img_shapes, scale_factors, flips, branch=None,
                          key_dim: Optional[int] = None):
        """fc1_stacks: (A, T, P, D); boxes_ori: (T, P, 4) merged original-
        coordinate proposals; masks: (T, P).  Returns (dets, labels, mask)
        in original-image coordinates."""
        t = fc1_stacks.shape[1]
        fn = self._window_aug_fn(t, self.key_dim if key_dim is None
                                 else key_dim, tuple(flips), branch)
        return fn(self._bb(params), fc1_stacks, boxes_ori, masks,
                  _dev_f32(np.asarray(img_shapes)),
                  _dev_f32(np.asarray(scale_factors)))

    # ------------------------------------------------- batched frame program
    @functools.lru_cache(maxsize=8)
    def _frame_post_batched_fn(self, canvas_h: int, canvas_w: int):
        """Post-backbone stage over a frame batch (one frame per video
        stream).  The candidate generation (top_k + delta decode — no pick
        loop) vmaps over lanes, then ALL lanes share ONE ``nms_static_lanes``
        pick loop: vmapping the NMS while_loop is catastrophic on TPU
        (lockstep gathers, 264.7 ms vs 11.5 ms at B=4 — BASELINE.md) and
        the round-2 unrolled-lane variant still ran B sequential pick loops
        back to back (the ~2.8 ms latency-bound proposals stage, per lane).
        The shared loop retires candidates from every lane each round, so
        the sequential round count stays at roughly a single frame's."""
        return jax.jit(self._frame_post_batched_body(canvas_h, canvas_w))

    @functools.lru_cache(maxsize=4)
    def _frame_post_batched_spmd_fn(self, canvas_h: int, canvas_w: int, mesh):
        """SPMD post stage: each device runs the batched body over its LOCAL
        lanes (B // mesh.size streams) — the pick loop groups per device."""
        from jax.sharding import PartitionSpec as P
        return jax.jit(self._lanes_shard(
            self._frame_post_batched_body(canvas_h, canvas_w), mesh, 5,
            lead_specs=(P(),)))

    def _frame_post_batched_body(self, canvas_h: int, canvas_w: int):
        canvas = self._canvas(canvas_h, canvas_w)
        rpn_cfg = self.test_cfg["rpn"]
        mod = self.module
        nms_post = int(rpn_cfg["nms_post"])

        def cand(params, cls_hw, reg_hw, img_shape, pad_shape):
            return _rpn_candidates(cls_hw, reg_hw, canvas, pad_shape,
                                   img_shape, rpn_cfg, self.rpn_means,
                                   self.rpn_stds)

        def batched(params, c5, cls_map, reg_map, img_shapes, pad_shapes):
            B = c5.shape[0]
            props, scores, valid = jax.vmap(
                cand, in_axes=(None, 0, 0, 0, 0))(
                    params, cls_map, reg_map, img_shapes, pad_shapes)
            keep_idx, keep_mask = nms_static_lanes(
                props, scores, float(rpn_cfg["nms_thr"]), nms_post,
                valid=valid)
            boxes = jnp.take_along_axis(
                props, keep_idx[..., None], axis=1) * keep_mask[..., None]
            out_scores = jnp.where(
                keep_mask, jnp.take_along_axis(scores, keep_idx, axis=1), 0.0)
            # RoI pooling + fc1 stay unrolled per lane (batched matmul work;
            # the separable-matmul RoIAlign fast path wants B==1 inputs)
            fc1s = []
            for b in range(B):
                rois = jnp.concatenate(
                    [jnp.zeros((nms_post, 1), boxes.dtype), boxes[b]], axis=1)
                pooled = self.roi_extractor([c5[b][None]], rois)
                fc1s.append(mod.apply(params, pooled,
                                      method=mod.bbox_precompute_fc1))
            return dict(fc1=jnp.stack(fc1s), boxes=boxes, scores=out_scores,
                        mask=keep_mask)

        return batched

    def frame_features_batched(self, params, imgs: jnp.ndarray, img_shapes,
                               pad_shapes):
        """imgs: (B, H, W, 3) — one frame from each of B video streams.
        Returns dict of (B, …) per-frame caches.  With a lanes mesh
        (``enable_spmd_lanes``) the B axis shards over the mesh devices."""
        h, w = imgs.shape[1], imgs.shape[2]
        mesh = self.lanes_mesh
        if mesh is not None:
            B = imgs.shape[0]
            if B % mesh.size != 0:
                raise ValueError(f"SPMD lanes need batch % mesh.size == 0 "
                                 f"(got B={B}, {mesh.size} devices)")
            ish = np.asarray(img_shapes, np.float32)
            psh = np.asarray(pad_shapes, np.float32)
            if imgs.dtype == jnp.uint8:
                mean = tuple(float(v) for v in self.img_norm["mean"])
                std = tuple(float(v) for v in self.img_norm["std"])
                c5, cls_map, reg_map = self._frame_backbone_u8_spmd_fn(
                    h, w, mean, std, mesh)(params, imgs, ish)
            else:
                c5, cls_map, reg_map = self._frame_backbone_spmd_fn(
                    h, w, mesh)(params, imgs)
            return self._frame_post_batched_spmd_fn(h, w, mesh)(
                self._bb(params), c5, cls_map, reg_map, ish, psh)
        c5, cls_map, reg_map = self._backbone_dispatch(params, imgs, img_shapes)
        return self._frame_post_batched_fn(h, w)(
            self._bb(params), c5, cls_map, reg_map,
            _dev_f32(img_shapes),
            _dev_f32(pad_shapes))


class _RingMixin:
    """Device-resident sliding-window ring buffer.

    The per-frame caches (fc1 projections, proposal boxes, masks) live on
    device in circular (T, …) buffers; a push is one fused
    dynamic_update_slice program and a detect rolls the buffers into
    oldest→newest order before the window head — so the steady-state loop
    issues exactly one push + one detect dispatch per frame with no
    host-side stacking.  This is the TPU realization of the reference's
    python deque of feature maps (tools/test.py:202-213).
    """

    def ring_reset(self, fc1_dim: int):
        T, P = self.window, self.proposal_num
        return dict(
            fc1=jnp.zeros((T, P, fc1_dim), self.dtype),
            boxes=jnp.zeros((T, P, 4), jnp.float32),
            masks=jnp.zeros((T, P), bool),
            pos=jnp.int32(-1),
            count=jnp.int32(0))

    @functools.lru_cache(maxsize=2)
    def _ring_push_fn(self, t_dim: int):
        def fn(state, feats):
            pos = (state["pos"] + 1) % t_dim
            return dict(
                fc1=jax.lax.dynamic_update_slice(
                    state["fc1"], feats["fc1"][None].astype(state["fc1"].dtype),
                    (pos, 0, 0)),
                boxes=jax.lax.dynamic_update_slice(
                    state["boxes"], feats["boxes"][None], (pos, 0, 0)),
                masks=jax.lax.dynamic_update_slice(
                    state["masks"], feats["mask"][None], (pos, 0)),
                pos=pos,
                count=jnp.minimum(state["count"] + 1, t_dim))
        return jax.jit(fn, donate_argnums=(0,))

    def ring_push(self, state, feats, params=None):
        # ``params`` is only consumed by engines with a streaming ring
        # (HNMBRCNN.stream) whose slide updates run head projections
        return self._ring_push_fn(self.window)(state, feats)

    def _body_for(self, t_dim: int, key_dim: int, branch, passes,
                  decode=True):
        """Window body honoring an engine's multi-pass mode (HNMB only;
        engines without the option ignore a falsy ``passes``)."""
        if passes:
            return self._window_body(t_dim, key_dim, branch, passes,
                                     decode=decode)
        return self._window_body(t_dim, key_dim, branch, decode=decode)

    def _ring_detect_body(self, t_dim: int, key_dim: int, branch=None,
                          passes=None):
        body = self._body_for(t_dim, key_dim, branch, passes)

        def fn(params, state, img_shape, scale_factor):
            shift = -(state["pos"] + 1)
            fc1 = jnp.roll(state["fc1"], shift, axis=0)
            boxes = jnp.roll(state["boxes"], shift, axis=0)
            masks = jnp.roll(state["masks"], shift, axis=0)
            return body(params, fc1, boxes, masks, img_shape, scale_factor)

        return fn

    @functools.lru_cache(maxsize=4)
    def _ring_detect_fn(self, t_dim: int, key_dim: int, branch=None,
                        passes=None):
        return jax.jit(self._ring_detect_body(t_dim, key_dim, branch, passes))

    def ring_detect(self, params, state, img_shape, scale_factor,
                    key_dim: Optional[int] = None, branch=None):
        kd = self.key_dim if key_dim is None else key_dim
        passes = getattr(self, "multi_pass", None)
        if params is self._bound_params:
            fn = self._bound_fn(
                ("ring_detect", self.window, kd, branch, passes),
                lambda: self._bind_const(
                    self._ring_detect_body(self.window, kd, branch, passes),
                    self._bb(params)))
            return fn(state, _dev_f32(img_shape), _dev_f32(scale_factor))
        fn = self._ring_detect_fn(self.window, kd, branch, passes)
        return fn(self._bb(params), state, _dev_f32(img_shape),
                  _dev_f32(scale_factor))

    def _ring_step_body(self, t_dim: int, key_dim: int, branch=None,
                        passes=None):
        """Fused push + detect: one dispatch for the whole window stage."""
        body = self._body_for(t_dim, key_dim, branch, passes)

        def fn(params, state, feats, img_shape, scale_factor):
            pos = (state["pos"] + 1) % t_dim
            state = dict(
                fc1=jax.lax.dynamic_update_slice(
                    state["fc1"], feats["fc1"][None].astype(state["fc1"].dtype),
                    (pos, 0, 0)),
                boxes=jax.lax.dynamic_update_slice(
                    state["boxes"], feats["boxes"][None], (pos, 0, 0)),
                masks=jax.lax.dynamic_update_slice(
                    state["masks"], feats["mask"][None], (pos, 0)),
                pos=pos,
                count=jnp.minimum(state["count"] + 1, t_dim))
            shift = -(pos + 1)
            fc1 = jnp.roll(state["fc1"], shift, axis=0)
            boxes = jnp.roll(state["boxes"], shift, axis=0)
            masks = jnp.roll(state["masks"], shift, axis=0)
            out = body(params, fc1, boxes, masks, img_shape, scale_factor)
            return state, out

        return fn

    @functools.lru_cache(maxsize=4)
    def _ring_step_fn(self, t_dim: int, key_dim: int, branch=None,
                      passes=None):
        return jax.jit(self._ring_step_body(t_dim, key_dim, branch, passes),
                       donate_argnums=(1,))

    def ring_step(self, params, state, feats, img_shape, scale_factor,
                  key_dim: Optional[int] = None, branch=None):
        """Push a frame's caches AND detect the window center in one program."""
        kd = self.key_dim if key_dim is None else key_dim
        passes = getattr(self, "multi_pass", None)
        if params is self._bound_params:
            fn = self._bound_fn(
                ("ring_step", self.window, kd, branch, passes),
                lambda: self._bind_const(
                    self._ring_step_body(self.window, kd, branch, passes),
                    self._bb(params), donate=(0,)))
            return fn(state, feats, _dev_f32(img_shape),
                      _dev_f32(scale_factor))
        fn = self._ring_step_fn(self.window, kd, branch, passes)
        return fn(self._bb(params), state, feats,
                  _dev_f32(img_shape),
                  _dev_f32(scale_factor))

    # ------------------------------------------- fused post + window stage
    def _step_body_for(self, t_dim: int, key_dim: int, branch):
        """The window-stage body the fused program composes with (overridden
        by the streaming engine)."""
        return self._ring_step_body(t_dim, key_dim, branch,
                                    getattr(self, "multi_pass", None))

    def _poststep_core(self, canvas_h: int, canvas_w: int, t_dim: int,
                       key_dim: int, branch):
        post = self._frame_post_body(canvas_h, canvas_w)
        step = self._step_body_for(t_dim, key_dim, branch)

        def fn(params, state, c5, cls_map, reg_map, img_shape, pad_shape,
               scale_factor):
            feats = post(params, c5, cls_map, reg_map, img_shape, pad_shape)
            return step(params, state, feats, img_shape, scale_factor)

        return fn

    def _step_variant(self):
        """Hashable cache key of everything `_step_body_for` closes over
        besides (t_dim, key_dim, branch) — a later engine-flag flip must
        never serve a stale fused program."""
        return ("exact", getattr(self, "multi_pass", None))

    @functools.lru_cache(maxsize=4)
    def _poststep_fn(self, canvas_h: int, canvas_w: int, t_dim: int,
                     key_dim: int, branch, variant):
        return jax.jit(self._poststep_core(canvas_h, canvas_w, t_dim,
                                           key_dim, branch),
                       donate_argnums=(1,))

    def ring_step_fused(self, params, state, c5, cls_map, reg_map, img_shape,
                        pad_shape, scale_factor, key_dim: Optional[int] = None,
                        branch=None):
        """Proposals + RoIAlign + fc1 + window stage in ONE program (2
        dispatches/frame with the backbone instead of 3).  Takes the raw
        backbone outputs (`_backbone_dispatch`); both halves use the same
        bbox_head param subtree.  Equality-tested vs the split path
        (tests/test_fused_poststep.py)."""
        kd = self.key_dim if key_dim is None else key_dim
        ch, cw = int(c5.shape[1]) * 16, int(c5.shape[2]) * 16
        fn = self._poststep_fn(ch, cw, self.window, kd, branch,
                               self._step_variant())
        return fn(self._bb(params), state, c5, cls_map, reg_map,
                  _dev_f32(img_shape), _dev_f32(pad_shape),
                  _dev_f32(scale_factor))

    # -------------------------------------------------- batched ring buffers
    def ring_reset_batched(self, batch: int, fc1_dim: int):
        T, P = self.window, self.proposal_num
        state = dict(
            fc1=jnp.zeros((batch, T, P, fc1_dim), self.dtype),
            boxes=jnp.zeros((batch, T, P, 4), jnp.float32),
            masks=jnp.zeros((batch, T, P), bool),
            pos=jnp.full((batch,), -1, jnp.int32),
            count=jnp.zeros((batch,), jnp.int32))
        if self.lanes_mesh is not None:
            state = self._lanes_put(state)
        return state

    def _ring_push_batched_one(self, t_dim: int):
        def one(state, feats, reset):
            pos = jnp.where(reset, 0, (state["pos"] + 1) % t_dim)
            fc1_new = feats["fc1"].astype(state["fc1"].dtype)
            fc1 = jnp.where(
                reset,
                jnp.broadcast_to(fc1_new[None], state["fc1"].shape),
                jax.lax.dynamic_update_slice(state["fc1"], fc1_new[None],
                                             (pos, 0, 0)))
            boxes = jnp.where(
                reset,
                jnp.broadcast_to(feats["boxes"][None], state["boxes"].shape),
                jax.lax.dynamic_update_slice(state["boxes"],
                                             feats["boxes"][None],
                                             (pos, 0, 0)))
            masks = jnp.where(
                reset,
                jnp.broadcast_to(feats["mask"][None], state["masks"].shape),
                jax.lax.dynamic_update_slice(state["masks"],
                                             feats["mask"][None], (pos, 0)))
            return dict(fc1=fc1, boxes=boxes, masks=masks, pos=pos,
                        count=jnp.where(reset, 1,
                                        jnp.minimum(state["count"] + 1, t_dim)))

        return one

    @functools.lru_cache(maxsize=2)
    def _ring_push_batched_fn(self, t_dim: int):
        return jax.jit(jax.vmap(self._ring_push_batched_one(t_dim)),
                       donate_argnums=(0,))

    @functools.lru_cache(maxsize=2)
    def _ring_push_batched_spmd_fn(self, t_dim: int, mesh):
        return jax.jit(
            self._lanes_shard(jax.vmap(self._ring_push_batched_one(t_dim)),
                              mesh, 3),
            donate_argnums=(0,))

    def ring_push_batched(self, state, feats, reset):
        """state: (B, …) ring buffers; feats: (B, …) frame caches;
        reset: (B,) bool — True fills the whole ring with this frame
        (video-start front padding in one shot)."""
        if self.lanes_mesh is not None:
            return self._ring_push_batched_spmd_fn(
                self.window, self.lanes_mesh)(state, feats,
                                              np.asarray(reset, bool))
        return self._ring_push_batched_fn(self.window)(state, feats, reset)

    @functools.lru_cache(maxsize=4)
    def _ring_detect_batched_fn(self, t_dim: int, key_dim: int,
                                branch=None, passes=None):
        """Batched window detect: the head forwards vmap over lanes (pure
        matmul work with clean batching rules), then every lane's multiclass
        decode shares ONE grouped pick loop (``multiclass_nms_static_lanes``)
        — vmapping the NMS while_loop is the measured 20×+ lockstep-gather
        pathology (BASELINE.md)."""
        return jax.jit(self._ring_detect_batched_body(t_dim, key_dim,
                                                      branch, passes))

    @functools.lru_cache(maxsize=4)
    def _ring_detect_batched_spmd_fn(self, t_dim: int, key_dim: int,
                                     branch, passes, mesh):
        from jax.sharding import PartitionSpec as P
        return jax.jit(self._lanes_shard(
            self._ring_detect_batched_body(t_dim, key_dim, branch, passes),
            mesh, 3, lead_specs=(P(),)))

    def _ring_detect_batched_body(self, t_dim: int, key_dim: int,
                                  branch=None, passes=None):
        from ..ops.nms import multiclass_nms_static_lanes
        body = self._body_for(t_dim, key_dim, branch, passes, decode=False)
        rcnn_cfg = self.test_cfg["rcnn"]
        single = (branch is not None or bool(passes)
                  or not getattr(self, "multi_branch", False))

        def one(params, state, img_shape, scale_factor):
            shift = -(state["pos"] + 1)
            fc1 = jnp.roll(state["fc1"], shift, axis=0)
            boxes = jnp.roll(state["boxes"], shift, axis=0)
            masks = jnp.roll(state["masks"], shift, axis=0)
            return body(params, fc1, boxes, masks, img_shape, scale_factor)

        def batched(params, state, img_shapes, scale_factors):
            pairs, valid = jax.vmap(one, in_axes=(None, 0, 0, 0))(
                params, state, img_shapes, scale_factors)
            outs = [multiclass_nms_static_lanes(
                        bb, sc, float(rcnn_cfg["score_thr"]),
                        float(rcnn_cfg["nms"]["iou_thr"]),
                        int(rcnn_cfg["max_per_img"]), valid=valid)
                    for bb, sc in pairs]
            return outs[0] if single else outs

        return batched

    def ring_detect_batched(self, params, state, img_shapes, scale_factors,
                            key_dim: Optional[int] = None, branch=None):
        kd = self.key_dim if key_dim is None else key_dim
        passes = getattr(self, "multi_pass", None)
        if self.lanes_mesh is not None:
            fn = self._ring_detect_batched_spmd_fn(self.window, kd, branch,
                                                   passes, self.lanes_mesh)
            return fn(self._bb(params), state,
                      np.asarray(img_shapes, np.float32),
                      np.asarray(scale_factors, np.float32))
        fn = self._ring_detect_batched_fn(self.window, kd, branch, passes)
        return fn(self._bb(params), state, _dev_f32(img_shapes),
                  _dev_f32(scale_factors))


@DETECTORS.register_module
class SelsaRCNN(_RingMixin, BaseEngine):
    """SELSA video detector (`/root/reference/mmdet/models/detectors/selsa_rcnn.py`)."""

    def __init__(self, model_cfg, train_cfg=None, test_cfg=None, dtype=jnp.float32):
        super().__init__(model_cfg, train_cfg, test_cfg, dtype)
        if self.train_cfg is not None:
            self.key_dim = int(self.train_cfg["rcnn"]["key_dim"])
        else:
            self.key_dim = int(self.test_cfg["relation_setup"]["frame_interval"])
        self.window = (2 * int(self.test_cfg["relation_setup"]["frame_interval"]) + 1
                       if self.test_cfg else None)

    def _window_logits(self, t_dim: int, key_dim: int, branch=None):
        mod = self.module
        P = self.proposal_num

        def fn(params, fc1, valid):
            return mod.apply(params, fc1, key_dim * P, P, valid,
                             method=mod.bbox_forward_fc1)

        return fn

    def _window_body(self, t_dim: int, key_dim: int, branch=None,
                     decode=True):
        mod = self.module
        rcnn_cfg = self.test_cfg["rcnn"]
        P = self.proposal_num

        def fn(params, fc1_stack, boxes, masks, img_shape, scale_factor):
            fc1 = fc1_stack.reshape(t_dim * P, -1)
            valid = masks.reshape(t_dim * P)
            cls, reg = mod.apply(params, fc1, key_dim * P, P, valid,
                                 method=mod.bbox_forward_fc1)
            if not decode:
                bb, sc = get_det_bboxes(boxes[key_dim], cls, reg, img_shape,
                                        scale_factor, self.target_means,
                                        self.target_stds, rescale=True)
                return [(bb, sc)], masks[key_dim]
            return get_det_bboxes(boxes[key_dim], cls, reg, img_shape,
                                  scale_factor, self.target_means,
                                  self.target_stds, rescale=True, cfg=rcnn_cfg,
                                  valid=masks[key_dim])

        return fn

    @functools.lru_cache(maxsize=4)
    def _window_fn(self, t_dim: int, key_dim: int, branch=None):
        return jax.jit(self._window_body(t_dim, key_dim, branch))

    def window_detect(self, params, fc1_stack, boxes, masks, img_shape,
                      scale_factor, key_dim: Optional[int] = None,
                      branch=None):
        """fc1_stack: (T, P, D); boxes: (T, P, 4); masks: (T, P).

        Returns (dets (max, 5) in ORIGINAL image coords, labels, valid).
        """
        t = fc1_stack.shape[0]
        fn = self._window_fn(t, self.key_dim if key_dim is None else key_dim,
                             branch)
        return fn(self._bb(params), fc1_stack, boxes, masks,
                  _dev_f32(img_shape),
                  _dev_f32(scale_factor))


@DETECTORS.register_module
class HNMBRCNN(_RingMixin, BaseEngine):
    """HVRNet detector (`/root/reference/mmdet/models/detectors/hnmb_rcnn.py`).

    At test time this is the SELSA machine with the HRNMP 4-block head and a
    63-frame cache; the branch and final predictions both decode through
    `get_det_bboxes` (`hrnmp_bbox_head.py:1009-1052`) and the runner stores
    the requested branch (final by default — the one the paper's mAP uses).
    """

    multi_branch = True   # head emits [branch, final] prediction pairs

    def __init__(self, model_cfg, train_cfg=None, test_cfg=None, dtype=jnp.float32):
        super().__init__(model_cfg, train_cfg, test_cfg, dtype)
        if self.train_cfg is not None:
            self.key_dim = int(self.train_cfg["rcnn"]["key_dim"])
        else:
            self.key_dim = int(self.test_cfg["bbox_head"]["key_dim"])
        self.window = (2 * int(self.test_cfg["relation_setup"]["frame_interval"]) + 1
                       if self.test_cfg else None)

    def _window_logits(self, t_dim: int, key_dim: int, branch=None):
        mod = self.module
        P = self.proposal_num
        b = -1 if branch is None else branch

        def fn(params, fc1, valid):
            cls_list, reg_list = mod.apply(params, fc1, key_dim * P, P, valid,
                                           method=mod.bbox_forward_fc1)
            return cls_list[b], reg_list[b]

        return fn

    #: when set to an int P, window_detect runs the head's multi-pass test
    #: graph (`forward_test_multi_passes`, hrnmp_bbox_head.py:911-967) with
    #: the window split into P equal frame segments; the head then emits one
    #: prediction set (no branch averaging).  None = the default spliced
    #: single-pass graph (`forward_test:800-909`).
    multi_pass: Optional[int] = None

    def _window_body(self, t_dim: int, key_dim: int, branch=None,
                     passes: Optional[int] = None, decode=True):
        """branch=None decodes every head branch (the reference decodes
        branch AND final, hrnmp_bbox_head.py:1020-1052); an int decodes only
        that branch on device — the runner stores a single branch, so the
        other multiclass-NMS is dead work in the steady-state loop."""
        mod = self.module
        rcnn_cfg = self.test_cfg["rcnn"]
        P = self.proposal_num

        def fn(params, fc1_stack, boxes, masks, img_shape, scale_factor):
            fc1 = fc1_stack.reshape(t_dim * P, -1)
            valid = masks.reshape(t_dim * P)
            if passes:
                cls_list, reg_list = mod.apply(
                    params, fc1, (t_dim // passes) * P, key_dim * P, P, valid,
                    method=mod.bbox_forward_fc1_multi_pass)
            else:
                cls_list, reg_list = mod.apply(
                    params, fc1, key_dim * P, P, valid,
                    method=mod.bbox_forward_fc1)
            pairs = list(zip(cls_list, reg_list))
            if branch is not None and not passes:
                pairs = [pairs[branch]]
            if not decode:
                return [get_det_bboxes(boxes[key_dim], cls, reg, img_shape,
                                       scale_factor, self.target_means,
                                       self.target_stds, rescale=True)
                        for cls, reg in pairs], masks[key_dim]
            outs = []
            for cls, reg in pairs:
                outs.append(get_det_bboxes(
                    boxes[key_dim], cls, reg, img_shape, scale_factor,
                    self.target_means, self.target_stds, rescale=True,
                    cfg=rcnn_cfg, valid=masks[key_dim]))
            return outs[0] if (branch is not None or passes) else outs

        return fn

    @functools.lru_cache(maxsize=4)
    def _window_fn(self, t_dim: int, key_dim: int, branch=None,
                   passes: Optional[int] = None):
        return jax.jit(self._window_body(t_dim, key_dim, branch, passes))

    def window_detect(self, params, fc1_stack, boxes, masks, img_shape,
                      scale_factor, key_dim: Optional[int] = None,
                      branch=None):
        t = fc1_stack.shape[0]
        passes = self.multi_pass
        if passes:
            assert t % passes == 0, (t, passes)
        fn = self._window_fn(t, self.key_dim if key_dim is None else key_dim,
                             branch, passes)
        return fn(self._bb(params), fc1_stack, boxes, masks,
                  _dev_f32(img_shape),
                  _dev_f32(scale_factor))

    # --------------------------------------------------- streaming ring path
    #: when True the ring buffer also carries streaming-softmax accumulators
    #: for NL1/NL3 (ops/streaming_attention.py) and each slide costs
    #: O(T·P²·D) instead of the O(T²·P²·D) full-window recompute — the TPU
    #: answer to the reference's per-frame 63-frame recompute
    #: (tools/hnl_test.py:309-475).  Exact up to streaming-softmax rounding
    #: (error bounded by the ≤T-step row lifetime; see the ops docstring).
    stream: bool = False

    #: speculative-rollback streaming: the slide commits WITHOUT the exact-
    #: repair `lax.cond` (which costs ~0.28 ms/step at T=21 and ~1.35 at
    #: T=63 as a fusion barrier even when never taken — BASELINE.md round
    #: 3); instead a sticky health flag rides in the ring state and the
    #: HOST replays flagged chunks exactly + dispatches `stream_rebuild` —
    #: SlidingWindowRunner implements the protocol (flag piggybacks on the
    #: existing once-per-16-frames chunk pull, so the steady state pays
    #: zero extra round trips).  Enabled by the runner / bench for fused
    #: stream engines; direct split ring_push/ring_detect users keep the
    #: in-program cond path.
    stream_rollback: bool = False

    def _stream_dims(self):
        bh = self.model_cfg["bbox_head"]
        dim = tuple(bh.get("dim", (1024, 1024, 1024)))
        fc_feat = int(bh.get("fc_feat_dim", 1024))
        return dim, fc_feat

    def ring_reset(self, fc1_dim: int):
        if not self.stream:
            return super().ring_reset(fc1_dim)
        T, P = self.window, self.proposal_num
        R = T * P
        # base ring minus fc1 (replaced by the flat buffer below — allocating
        # the (T, P, D) one just to drop it would be a dead ~26-74 MB fill
        # per video reset)
        state = dict(
            boxes=jnp.zeros((T, P, 4), jnp.float32),
            masks=jnp.zeros((T, P), bool),
            pos=jnp.int32(-1),
            count=jnp.int32(0))
        (dim, fc_feat) = self._stream_dims()
        bh = self.model_cfg["bbox_head"]
        key_rows = int(bh["t_dim"]) * int(bh.get("sampler_num", P))
        if key_rows < R:
            raise ValueError("streaming ring requires every cached row to be "
                             "a key (t_dim·sampler_num ≥ window·proposals; "
                             f"got {key_rows} < {R})")
        # stationary caches live FLAT (T·P, D): (T, P, D) buffers tile-pad
        # the P=300 axis to 304, so every (T,P,D)→(R,D) reshape in the slide
        # programs was a real repack (~0.15 ms/frame) — flat makes them
        # bitcasts.  fc1 is flat too (stream engines never use the base
        # ring's rolled (T,P,D) view).
        #
        # The flat row count is PRE-PADDED to the flash key-tile multiple
        # (ops/attention.KEY_TILE): the head derives fc2/fc4 (the NL2/NL4
        # K/V) row-wise from these caches, so tile-exact storage makes the
        # flash wrapper's per-call k/v pad copies (two full K/V HBM passes,
        # ~0.24 ms/step at 63×300) zero-width no-ops.  Tail rows are never
        # written (put_rows targets slot rows < R) and are masked out of
        # every key set via the padded mask (head stream methods); their
        # accumulators stay finite because any slot with a valid key makes
        # every row's anchor finite at insert time, before that slot can be
        # evicted (streaming_attention module invariant).
        from ..ops.attention import KEY_TILE
        R_pad = -(-R // KEY_TILE) * KEY_TILE
        zeros = lambda d: jnp.zeros((R_pad, d), self.dtype)
        state["fc1"] = zeros(int(fc1_dim))
        state.update(
            q1=zeros(dim[0]), k1=zeros(dim[1]),
            fc3s=zeros(fc_feat), q3=zeros(dim[0]), k3=zeros(dim[1]),
            m1=jnp.full((R_pad,), -jnp.inf, jnp.float32),
            l1=jnp.zeros((R_pad,), jnp.float32),
            a1=jnp.zeros((R_pad, fc1_dim), jnp.float32),
            m3=jnp.full((R_pad,), -jnp.inf, jnp.float32),
            l3=jnp.zeros((R_pad,), jnp.float32),
            a3=jnp.zeros((R_pad, fc_feat), jnp.float32),
            # per-(row, slot) logit-max health tables for the exact-repair
            # cond (ops/streaming_attention.py docstring)
            M1=jnp.full((R_pad, T), -jnp.inf, jnp.float32),
            M3=jnp.full((R_pad, T), -jnp.inf, jnp.float32))
        if self.stream_rollback:
            # sticky health flag for the host-replay rollback protocol
            state["flag"] = jnp.zeros((), bool)
        return state

    _STREAM_KEYS = ("fc1", "q1", "k1", "fc3s", "q3", "k3",
                    "m1", "l1", "a1", "m3", "l3", "a3", "M1", "M3")

    def _head_view(self, state):
        hst = {k: state[k] for k in self._STREAM_KEYS}
        hst["mask"] = state["masks"]
        return hst

    def _stream_push_body(self, t_dim: int, rollback: bool = False):
        mod = self.module

        def fn(params, state, feats):
            pos = (state["pos"] + 1) % t_dim
            upd = mod.apply(params, self._head_view(state),
                            feats["fc1"].astype(state["fc1"].dtype),
                            feats["mask"], pos, rollback,
                            method=mod.bbox_stream_update)
            hst, bad = upd if rollback else (upd, None)
            out = dict(state)
            out.update({k: hst[k] for k in self._STREAM_KEYS})
            out["masks"] = hst["mask"]
            out["boxes"] = jax.lax.dynamic_update_slice(
                state["boxes"], feats["boxes"][None], (pos, 0, 0))
            out["pos"] = pos
            out["count"] = jnp.minimum(state["count"] + 1, t_dim)
            if rollback:
                out["flag"] = state["flag"] | bad
            return out

        return fn

    @functools.lru_cache(maxsize=2)
    def _stream_push_fn(self, t_dim: int, rollback: bool = False):
        return jax.jit(self._stream_push_body(t_dim, rollback),
                       donate_argnums=(1,))

    def _check_stream_no_multipass(self):
        """The streaming ring caches the single-pass spliced graph; the
        multi-pass test graph must use the exact ring (hnl_test.py guards
        the CLI combination — this guards direct engine use).  A real
        exception, not an assert: silently serving the wrong graph under
        ``python -O`` would be a correctness bug."""
        if getattr(self, "multi_pass", None):
            raise ValueError("streaming ring does not support multi_pass; "
                             "use stream=False")

    def ring_push(self, state, feats, params=None):
        if not self.stream:
            return self._ring_push_fn(self.window)(state, feats)
        self._check_stream_no_multipass()
        if params is None:
            raise ValueError("streaming ring_push needs params")
        rb = self.stream_rollback
        if params is self._bound_params:
            fn = self._bound_fn(
                ("stream_push", self.window, rb),
                lambda: self._bind_const(
                    self._stream_push_body(self.window, rb),
                    self._bb(params), donate=(0,)))
            return fn(state, feats)
        return self._stream_push_fn(self.window, rb)(self._bb(params), state,
                                                     feats)

    def _stream_decode(self, params, state, img_shape, scale_factor,
                       t_dim: int, key_dim: int, branch,
                       rollback: bool = False):
        mod = self.module
        rcnn_cfg = self.test_cfg["rcnn"]
        center = (state["pos"] + 1 + key_dim) % t_dim
        fwd = mod.apply(params, self._head_view(state), center, rollback,
                        method=mod.bbox_stream_forward)
        if rollback:
            cls_list, reg_list, bad = fwd
        else:
            (cls_list, reg_list), bad = fwd, None
        boxes_c = jax.lax.dynamic_index_in_dim(state["boxes"], center, 0,
                                               keepdims=False)
        mask_c = jax.lax.dynamic_index_in_dim(state["masks"], center, 0,
                                              keepdims=False)
        pairs = list(zip(cls_list, reg_list))
        if branch is not None:
            pairs = [pairs[branch]]
        outs = [get_det_bboxes(boxes_c, cls, reg, img_shape, scale_factor,
                               self.target_means, self.target_stds,
                               rescale=True, cfg=rcnn_cfg, valid=mask_c)
                for cls, reg in pairs]
        outs = outs[0] if branch is not None else outs
        return (outs, bad) if rollback else outs

    def _stream_detect_body(self, t_dim: int, key_dim: int, branch=None):
        def fn(params, state, img_shape, scale_factor):
            return self._stream_decode(params, state, img_shape, scale_factor,
                                       t_dim, key_dim, branch)
        return fn

    @functools.lru_cache(maxsize=4)
    def _stream_detect_fn(self, t_dim: int, key_dim: int, branch=None):
        return jax.jit(self._stream_detect_body(t_dim, key_dim, branch))

    def ring_detect(self, params, state, img_shape, scale_factor,
                    key_dim: Optional[int] = None, branch=None):
        if not self.stream:
            return super().ring_detect(params, state, img_shape, scale_factor,
                                       key_dim, branch)
        self._check_stream_no_multipass()
        if self.stream_rollback:
            # the split detect has no state return to carry the health flag;
            # rollback mode detects via the fused ring_step (the runner's
            # steady state) — a silent cond-repair here would hide corrupt
            # NL1 accumulators the flag protocol is supposed to surface
            raise ValueError("stream_rollback detects via ring_step; set "
                             "stream_rollback=False for split push/detect")
        kd = self.key_dim if key_dim is None else key_dim
        if params is self._bound_params:
            fn = self._bound_fn(
                ("stream_detect", self.window, kd, branch),
                lambda: self._bind_const(
                    self._stream_detect_body(self.window, kd, branch),
                    self._bb(params)))
            return fn(state, _dev_f32(img_shape), _dev_f32(scale_factor))
        fn = self._stream_detect_fn(self.window, kd, branch)
        return fn(self._bb(params), state, _dev_f32(img_shape),
                  _dev_f32(scale_factor))

    def _stream_step_body(self, t_dim: int, key_dim: int, branch=None,
                          rollback: bool = False):
        mod = self.module

        def fn(params, state, feats, img_shape, scale_factor):
            pos = (state["pos"] + 1) % t_dim
            upd = mod.apply(params, self._head_view(state),
                            feats["fc1"].astype(state["fc1"].dtype),
                            feats["mask"], pos, rollback,
                            method=mod.bbox_stream_update)
            hst, bad_u = upd if rollback else (upd, None)
            new = dict(state)
            new.update({k: hst[k] for k in self._STREAM_KEYS})
            new["masks"] = hst["mask"]
            new["boxes"] = jax.lax.dynamic_update_slice(
                state["boxes"], feats["boxes"][None], (pos, 0, 0))
            new["pos"] = pos
            new["count"] = jnp.minimum(state["count"] + 1, t_dim)
            if rollback:
                # decode from the slid (unrepaired) state; both the slide's
                # and the decode splice's health verdicts stick in the flag
                out, bad_d = self._stream_decode(
                    params, new, img_shape, scale_factor, t_dim, key_dim,
                    branch, rollback=True)
                new["flag"] = state["flag"] | bad_u | bad_d
            else:
                out = self._stream_decode(params, new, img_shape,
                                          scale_factor, t_dim, key_dim,
                                          branch)
            return new, out

        return fn

    @functools.lru_cache(maxsize=4)
    def _stream_step_fn(self, t_dim: int, key_dim: int, branch=None,
                        rollback: bool = False):
        return jax.jit(self._stream_step_body(t_dim, key_dim, branch,
                                              rollback),
                       donate_argnums=(1,))

    # ---------------------------------------------- rollback recovery program
    def _stream_rebuild_body(self):
        mod = self.module

        def fn(params, state):
            hst = mod.apply(params, self._head_view(state),
                            method=mod.bbox_stream_rebuild)
            out = dict(state)
            out.update({k: hst[k] for k in self._STREAM_KEYS})
            if "flag" in state:
                out["flag"] = jnp.zeros((), bool)
            return out

        return fn

    @functools.lru_cache(maxsize=1)
    def _stream_rebuild_fn(self):
        return jax.jit(self._stream_rebuild_body(), donate_argnums=(1,))

    def stream_rebuild(self, params, state):
        """Exact rebuild of the streaming accumulators from the current ring
        caches, clearing the health flag — the recovery half of the rollback
        protocol (one (R, R) pass per block; dispatched by the runner only
        after a flushed chunk's flag read True, i.e. vanishingly rarely)."""
        self._check_stream_no_multipass()
        return self._stream_rebuild_fn()(self._bb(params), state)

    def ring_step(self, params, state, feats, img_shape, scale_factor,
                  key_dim: Optional[int] = None, branch=None):
        if not self.stream:
            return super().ring_step(params, state, feats, img_shape,
                                     scale_factor, key_dim, branch)
        self._check_stream_no_multipass()
        kd = self.key_dim if key_dim is None else key_dim
        rb = self.stream_rollback
        if params is self._bound_params:
            fn = self._bound_fn(
                ("stream_step", self.window, kd, branch, rb),
                lambda: self._bind_const(
                    self._stream_step_body(self.window, kd, branch, rb),
                    self._bb(params), donate=(0,)))
            return fn(state, feats, _dev_f32(img_shape),
                      _dev_f32(scale_factor))
        fn = self._stream_step_fn(self.window, kd, branch, rb)
        return fn(self._bb(params), state, feats,
                  _dev_f32(img_shape),
                  _dev_f32(scale_factor))

    def _step_body_for(self, t_dim: int, key_dim: int, branch):
        if not self.stream:
            return super()._step_body_for(t_dim, key_dim, branch)
        self._check_stream_no_multipass()
        return self._stream_step_body(t_dim, key_dim, branch,
                                      self.stream_rollback)

    def _step_variant(self):
        if not self.stream:
            return super()._step_variant()
        return ("stream", self.stream_rollback)


@DETECTORS.register_module
class HNLRCNN(HNMBRCNN):
    """Intermediate intra+inter-video variant (`hnl_rcnn.py`); shares the
    HNMB inference machinery."""


@DETECTORS.register_module
class FasterRCNN(BaseEngine):
    """Plain single-frame Faster R-CNN (zoo parity; BBoxHead head).

    `simple_test` = RPN proposals → RoIAlign → head → multiclass NMS
    (`two_stage.py:simple_test`).
    """

    def __init__(self, model_cfg, train_cfg=None, test_cfg=None, dtype=jnp.float32):
        super().__init__(model_cfg, train_cfg, test_cfg, dtype)
        self.key_dim = 0

    @functools.lru_cache(maxsize=8)
    def _simple_test_fn(self, canvas_h: int, canvas_w: int):
        canvas = self._canvas(canvas_h, canvas_w)
        rpn_cfg = self.test_cfg["rpn"]
        rcnn_cfg = self.test_cfg.get("rcnn")
        mod = self.module

        def fn(params, img, img_shape, pad_shape, scale_factor):
            c4 = mod.apply(params, img, method=mod.extract_feat)
            c5 = mod.apply(params, c4, method=mod.shared) \
                if self.model_cfg.get("shared_head") else c4
            cls_map, reg_map = mod.apply(params, c4, method=mod.rpn)
            boxes, scores, mask = _rpn_proposals(
                cls_map[0], reg_map[0], canvas, pad_shape, img_shape, rpn_cfg,
                self.rpn_means, self.rpn_stds)
            rois = jnp.concatenate(
                [jnp.zeros((boxes.shape[0], 1), boxes.dtype), boxes], axis=1)
            pooled = self.roi_extractor([c5], rois)
            P = boxes.shape[0]
            cls, reg = mod.apply(params, pooled, 0, P, mask,
                                 method=mod.bbox_forward)
            return get_det_bboxes(boxes, cls, reg, img_shape, scale_factor,
                                  self.target_means, self.target_stds,
                                  rescale=True, cfg=rcnn_cfg, valid=mask)

        return jax.jit(fn)

    def simple_test(self, params, img, img_shape, pad_shape, scale_factor):
        fn = self._simple_test_fn(img.shape[1], img.shape[2])
        return fn(params, img, _dev_f32(img_shape),
                  _dev_f32(pad_shape),
                  _dev_f32(scale_factor))


    @functools.lru_cache(maxsize=4)
    def _aug_test_fn(self, canvas_h: int, canvas_w: int,
                     flips: Tuple[bool, ...]):
        """Multi-scale-flip aug test for the still-image path (reference
        two_stage.py:301 aug_test + test_mixins.py:15-110): per-aug RPN
        proposals merge in original coords, the merged set pools in every
        aug, per-aug head outputs decode + map back + average, one NMS."""
        from ..core.merge_augs import merge_aug_bboxes, merge_aug_proposals
        from ..ops.boxes import bbox_mapping
        from ..ops.nms import multiclass_nms_static
        canvas = self._canvas(canvas_h, canvas_w)
        rpn_cfg = self.test_cfg["rpn"]
        rcnn_cfg = self.test_cfg["rcnn"]
        mod = self.module
        has_shared = bool(self.model_cfg.get("shared_head"))

        def fn(params, imgs, img_shapes, pad_shapes, scale_factors):
            c4 = mod.apply(params, imgs, method=mod.extract_feat)
            c5 = mod.apply(params, c4, method=mod.shared) if has_shared else c4
            cls_map, reg_map = mod.apply(params, c4, method=mod.rpn)
            props, pmasks, metas = [], [], []
            for a, flip in enumerate(flips):
                b, sc, m = _rpn_proposals(
                    cls_map[a], reg_map[a], canvas, pad_shapes[a],
                    img_shapes[a], rpn_cfg, self.rpn_means, self.rpn_stds)
                props.append(jnp.concatenate([b, sc[:, None]], axis=1))
                pmasks.append(m)
                metas.append(dict(img_shape=img_shapes[a],
                                  scale_factor=scale_factors[a], flip=flip))
            merged, mmask = merge_aug_proposals(props, metas, rpn_cfg, pmasks)
            aug_boxes, aug_scores = [], []
            for a, flip in enumerate(flips):
                boxes_a = bbox_mapping(merged[:, :4], img_shapes[a],
                                       scale_factors[a], flip)
                rois = jnp.concatenate(
                    [jnp.zeros((boxes_a.shape[0], 1), boxes_a.dtype),
                     boxes_a], axis=1)
                pooled = self.roi_extractor([c5[a:a + 1]], rois)
                cls, reg = mod.apply(params, pooled, 0, rois.shape[0], mmask,
                                     method=mod.bbox_forward)
                scores = jax.nn.softmax(cls.astype(jnp.float32), axis=-1)
                # decode EVERY class's deltas ((N, 4C) flows through
                # delta2bbox / merge_aug_bboxes / multiclass NMS just like
                # simple_test and the reference aug_test — collapsing to the
                # argmax class would give other classes the wrong boxes)
                bboxes = delta2bbox(boxes_a, reg.astype(jnp.float32),
                                    self.target_means, self.target_stds,
                                    img_shapes[a])
                aug_boxes.append(bboxes)
                aug_scores.append(scores)
            merged_b, merged_s = merge_aug_bboxes(aug_boxes, aug_scores,
                                                  metas, rcnn_cfg)
            return multiclass_nms_static(
                merged_b, merged_s, float(rcnn_cfg["score_thr"]),
                float(rcnn_cfg["nms"]["iou_thr"]),
                int(rcnn_cfg["max_per_img"]), valid=mmask)

        return jax.jit(fn)

    def aug_test(self, params, imgs, img_shapes, pad_shapes, scale_factors,
                 flips):
        """imgs: list of (1, H, W, 3) per-aug canvas-padded variants.
        Returns (dets, labels, mask) in original-image coordinates."""
        batch = jnp.concatenate(list(imgs), axis=0)
        fn = self._aug_test_fn(batch.shape[1], batch.shape[2], tuple(flips))
        return fn(params, batch,
                  _dev_f32(np.asarray(img_shapes)),
                  _dev_f32(np.asarray(pad_shapes)),
                  _dev_f32(np.asarray(scale_factors)))


@DETECTORS.register_module
class FastRCNN(FasterRCNN):
    """Proposal-fed variant (zoo parity)."""
