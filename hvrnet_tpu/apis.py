"""High-level APIs (reference `/root/reference/mmdet/apis/`).

``train_detector`` — epoch loop + hooks replacement (reference
apis/train.py:57-277): step-LR with warmup, intra-epoch + epoch
checkpointing, text/TensorBoard-style JSON logging, optional eval hook.
``init_detector`` / ``inference_detector`` — single-image inference API
(reference apis/inference.py:16-92).
"""
from __future__ import annotations

import json
import logging
import os
import time
from typing import Dict, Optional

import numpy as np

from .engine.stream import collate_train, train_batch_iterator
from .engine.train import HNMBTrainer, SelsaTrainer, TrainState
from .utils.checkpoint import (load_checkpoint, load_torch_checkpoint,
                               merge_params, save_checkpoint)


def set_random_seed(seed: int):
    """reference apis/train.py:set_random_seed:53."""
    import random
    random.seed(seed)
    np.random.seed(seed)


def get_root_logger(log_level=logging.INFO, rank: int = 0):
    """Rank-0-only logger (reference apis/env.py:60-69)."""
    logger = logging.getLogger("hvrnet_tpu")
    if not logger.handlers:
        logging.basicConfig(
            format="%(asctime)s - %(levelname)s - %(message)s", level=log_level)
    if rank != 0:
        logger.setLevel("ERROR")
    return logger


def load_params_for_engine(engine, path: str, rng=None):
    """Load orbax / torch checkpoints onto an initialized param tree."""
    import jax
    rng = rng if rng is not None else jax.random.PRNGKey(0)
    params = engine.init_params(rng)
    if path is None:
        return params
    if path.endswith(".pth"):
        loaded = load_torch_checkpoint(path)
        merged, missing = merge_params(params["params"], loaded["params"])
        if missing:
            logging.getLogger("hvrnet_tpu").warning(
                "checkpoint missing %d tensors (randomly initialized)",
                len(missing))
        return {"params": merged}
    restored, _ = load_checkpoint(path, params)
    return restored


def build_trainer(engine, cfg, mesh=None, steps_per_epoch: int = 1000):
    """Pick the trainer for the detector type (reference: every detector's
    forward_train; here one trainer class per objective family)."""
    det_type = engine.model_cfg["type"]
    head_type = str((engine.model_cfg.get("bbox_head") or {}).get("type", "")
                    ) if not isinstance(engine.model_cfg.get("bbox_head"),
                                        (list, tuple)) else ""
    if det_type in ("HNMBRCNN", "HNLRCNN"):
        cls = HNMBTrainer
    elif det_type in ("SelsaRCNN",):
        cls = SelsaTrainer
    elif det_type in ("FasterRCNN", "FastRCNN"):
        from .engine.train_two_stage import FasterRCNNTrainer
        cls = FasterRCNNTrainer
    elif det_type in ("CascadeRCNN", "HybridTaskCascade", "MaskRCNN",
                      "MaskScoringRCNN", "GridRCNN", "DoubleHeadRCNN"):
        from .engine.train_two_stage import TwoStageTrainer
        cls = TwoStageTrainer
    elif det_type in ("RetinaNet", "SingleStageDetector", "FCOS", "FOVEA",
                      "RepPointsDetector"):
        from .engine.train_fcos import FCOSTrainer, FoveaTrainer
        from .engine.train_guided_anchor import GATrainer
        from .engine.train_reppoints import RepPointsTrainer
        from .engine.train_single_stage import (FreeAnchorTrainer,
                                                RetinaTrainer, SSDTrainer)
        cls = {"FCOSHead": FCOSTrainer, "FoveaHead": FoveaTrainer,
               "RepPointsHead": RepPointsTrainer,
               "FreeAnchorRetinaHead": FreeAnchorTrainer,
               "SSDHead": SSDTrainer,
               "GARetinaHead": GATrainer}.get(head_type, RetinaTrainer)
    else:
        raise ValueError(
            f"no training objective registered for detector type "
            f"{det_type!r} (head {head_type!r}); supported families: "
            f"SELSA/HVRNet video detectors, Faster/Fast R-CNN, "
            f"Cascade/HTC/Mask/MaskScoring/Grid/DoubleHead R-CNN, and the "
            f"single-stage dense heads")
    return cls(engine, cfg, mesh=mesh, steps_per_epoch=steps_per_epoch)


def train_detector(engine, dataset, cfg, mesh=None, work_dir: str = "work_dir",
                   total_epochs: Optional[int] = None, canvas_hw=(608, 1008),
                   resume_from: Optional[str] = None,
                   load_from: Optional[str] = None,
                   log_interval: int = 50, max_steps_per_epoch: Optional[int] = None,
                   seed: int = 0, eval_hook=None, calibrate_bn: bool = False):
    """Epoch training loop (replaces mmcv Runner, reference apis/train.py).

    ``calibrate_bn``: set every FrozenBN running statistic from the first
    training batch before creating the optimizer state
    (engine/calibrate.py) — required for training the frozen-BN backbones
    from random init, where the default (0, 1) statistics explode deep
    activations (the reference always starts from pretrained stats via
    ``load_from``)."""
    import jax

    os.makedirs(work_dir, exist_ok=True)
    logger = get_root_logger()
    n_dev = 1 if mesh is None else int(np.prod(mesh.devices.shape))
    steps_per_epoch = max_steps_per_epoch or max(len(dataset) // n_dev, 1)
    trainer = build_trainer(engine, cfg, mesh=mesh,
                            steps_per_epoch=steps_per_epoch)
    params = load_params_for_engine(engine, load_from)
    if calibrate_bn:
        from .engine.calibrate import calibrate_frozen_bn
        probe = next(train_batch_iterator(dataset, canvas_hw, batch_size=1,
                                          seed=seed))
        n_imgs = min(4, probe["imgs"].shape[1])
        imgs = [probe["imgs"][0, f:f + 1] for f in range(n_imgs)]
        params, hist = calibrate_frozen_bn(engine, params, imgs)
        logger.info("FrozenBN calibration: %s", hist[-1])
    state = trainer.create_state(params)
    start_epoch = 0
    if resume_from:
        state, meta = load_checkpoint(resume_from, state)
        start_epoch = (meta or {}).get("epoch", 0)
        logger.info("resumed from %s at epoch %d", resume_from, start_epoch)

    step_fn = trainer.make_train_step(*canvas_hw)
    total_epochs = total_epochs or int(cfg.get("total_epochs", 12))
    ckpt_cfg = cfg.get("checkpoint_config", {}) or {}
    iter_interval = ckpt_cfg.get("iter_interval")
    log_path = os.path.join(work_dir, "train_log.jsonl")
    batches = train_batch_iterator(dataset, canvas_hw, batch_size=n_dev,
                                  seed=seed)
    rng = jax.random.PRNGKey(seed)

    for epoch in range(start_epoch, total_epochs):
        t0 = time.time()
        for it in range(steps_per_epoch):
            batch = next(batches)
            rng, *step_rngs = jax.random.split(rng, n_dev + 1)
            # the trainer compiles the single-device step whenever the mesh
            # has one device (BaseTrainer.make_train_step) — rng shape must
            # match that choice, not merely mesh-ness
            step_rng = (step_rngs[0] if n_dev == 1
                        else jax.numpy.stack(step_rngs))
            state, logs = step_fn(state, batch, step_rng)
            if it % log_interval == 0:
                logs_f = {k: float(v) for k, v in logs.items()}
                logs_f.update(epoch=epoch, iter=it,
                              time=time.time() - t0)
                logger.info("epoch %d iter %d: %s", epoch, it,
                            {k: round(v, 4) if isinstance(v, float) else v
                             for k, v in logs_f.items()})
                with open(log_path, "a") as f:
                    f.write(json.dumps(logs_f) + "\n")
            if iter_interval and it > 0 and it % iter_interval == 0:
                save_checkpoint(os.path.join(work_dir, "latest"), state,
                                meta=dict(epoch=epoch, iter=it))
        save_checkpoint(os.path.join(work_dir, f"epoch_{epoch + 1}"), state,
                        meta=dict(epoch=epoch + 1))
        save_checkpoint(os.path.join(work_dir, "latest"), state,
                        meta=dict(epoch=epoch + 1))
        if eval_hook is not None:   # DistEvalmAPHook equivalent
            m = eval_hook(state.params, epoch)
            if m is not None:
                logger.info("epoch %d mAP: %.4f", epoch, m)
    return state


def init_detector(config, checkpoint: Optional[str] = None, dtype=None):
    """reference apis/inference.py:16 — build engine + load weights."""
    import jax.numpy as jnp
    from .engine import detector as _det
    from .models.builder import build_detector
    from .utils.config import Config
    if isinstance(config, str):
        config = Config.fromfile(config)
    engine = build_detector(config.model, None, config.test_cfg,
                            dtype=dtype or jnp.float32)
    engine.params = load_params_for_engine(engine, checkpoint)
    engine.cfg = config
    return engine


def inference_detector(engine, img, canvas_hw=None):
    """Single-image inference (reference apis/inference.py:63): full test
    pipeline on one BGR numpy image → per-class det lists."""
    import cv2
    import jax.numpy as jnp
    from .data.pipelines import Normalize, Pad, Resize
    from .engine.canvas import pad_to_canvas, pick_canvas_shape
    from .ops.boxes import bbox2result_np

    cfg = engine.cfg
    norm = dict(cfg.img_norm_cfg)
    results = dict(img=img.astype(np.float32), img_shape=img.shape,
                   ori_shape=img.shape, bbox_fields=[])
    results = Resize(img_scale=(1000, 600), keep_ratio=True)(results)
    results = Normalize(**norm)(results)
    results = Pad(size_divisor=16)(results)
    ph, pw = results["pad_shape"][:2]
    ch, cw = canvas_hw or pick_canvas_shape(ph, pw)
    img_c = pad_to_canvas(results["img"], (ch, cw))

    # single-frame window (T=1 path through the video head)
    feats = engine.frame_features(engine.params, jnp.asarray(img_c[None]),
                                  np.asarray(results["img_shape"][:2], np.float32),
                                  np.asarray(results["pad_shape"][:2], np.float32))
    if hasattr(engine, "window_detect"):
        T = engine.window or 1
        fc1 = jnp.broadcast_to(feats["fc1"][None], (T,) + feats["fc1"].shape)
        boxes = jnp.broadcast_to(feats["boxes"][None], (T,) + feats["boxes"].shape)
        masks = jnp.broadcast_to(feats["mask"][None], (T,) + feats["mask"].shape)
        out = engine.window_detect(engine.params, fc1, boxes, masks,
                                   results["img_shape"][:2],
                                   results["scale_factor"])
        if isinstance(out, list):
            out = out[-1]
    else:
        out = engine.simple_test(engine.params, jnp.asarray(img_c[None]),
                                 results["img_shape"][:2],
                                 results["pad_shape"][:2],
                                 results["scale_factor"])
    dets, labels, mask = out
    dets = np.asarray(dets)[np.asarray(mask)]
    labels = np.asarray(labels)[np.asarray(mask)]
    return bbox2result_np(dets, labels, engine.num_classes)
