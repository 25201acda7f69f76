"""Host → device frame streams and train-batch assembly.

Bridges the numpy datasets to the static-canvas jitted programs:
  * ``test_frame_stream`` walks one rank's video-sharded index list
    (VIDSeqDataset.get_indices) and emits canvas-padded frames for the
    SlidingWindowRunner;
  * ``collate_train_selsa`` / ``collate_train_hnmb`` pack pipelined frame
    lists into the fixed-shape training batch (images on the canvas, GT
    padded to ``gt_max`` with masks) — the analogue of the reference's
    collate with ``samples_per_gpu=selsa_imgs``
    (`/root/reference/mmdet/datasets/loader/build_loader.py:19-56`).
"""
from __future__ import annotations

from typing import Dict, Iterator, List, Sequence

import numpy as np

from .canvas import pad_to_canvas, pick_canvas_shape

DEFAULT_CANVAS = dict(max_long=1008, max_short=608)


def _canvas_for(pad_shape, max_long=1008, max_short=608):
    h, w = int(pad_shape[0]), int(pad_shape[1])
    return pick_canvas_shape(h, w, max_long, max_short)


def test_frame_stream(dataset, rank: int = 0, max_long: int = 1008,
                      max_short: int = 608, aug_flip: bool = False
                      ) -> Iterator[Dict]:
    """Yield runner-format frames for one rank's whole-video shard.

    With ``aug_flip`` each frame also carries its horizontally-flipped
    variant (``img_augs``/``flips``) for flip-augmented testing — the
    MultiScaleFlipAug(flip=True) operating point of the reference
    (datasets/pipelines/test_aug.py:8); the flip happens on the resized,
    normalized image BEFORE canvas padding, matching the pipeline order."""
    import jax.numpy as jnp
    indices = dataset.indices_list[rank]
    for idx in indices:
        item = dataset[idx]
        meta = item["img_meta"]
        img = item["img"].astype(np.float32)
        ch, cw = _canvas_for(meta["pad_shape"], max_long, max_short)
        img_c = pad_to_canvas(img, (ch, cw))
        out = dict(
            img=jnp.asarray(img_c[None]),
            img_shape=np.asarray(meta["img_shape"][:2], np.float32),
            pad_shape=np.asarray(meta["pad_shape"][:2], np.float32),
            scale_factor=np.asarray(meta["scale_factor"], np.float32),
            key_frame_flag=int(meta["key_frame_flag"]),
            frame_offset=int(meta["frame_offset"]),
            seg_len=int(meta["seg_len"]),
            frame_start_id=int(meta["frame_start_id"]))
        if aug_flip:
            # flip around the VALID image width (the reference flips before
            # Pad, transforms.py:RandomFlip), leaving the pad at the right
            iw = int(round(float(meta["img_shape"][1])))
            img_f = img.copy()
            img_f[:, :iw] = img_f[:, :iw][:, ::-1]
            out["img_augs"] = [out["img"],
                               jnp.asarray(pad_to_canvas(img_f, (ch, cw))[None])]
            out["flips"] = (False, True)
        yield out


def parallel_test_frame_stream(dataset, rank: int = 0, workers: int = 4,
                               max_long: int = 1008, max_short: int = 608,
                               prefetch: int = 8,
                               u8_transfer: bool = False,
                               transfer_batch: int = 1) -> Iterator[Dict]:
    """Order-preserving multi-threaded variant of ``test_frame_stream``.

    The host pipeline (JPEG decode → resize → normalize → pad → H2D) is the
    throughput bound of the end-to-end runner (~45 ms/frame single-threaded
    at the (1000,600) point); cv2 releases the GIL, so a small thread pool
    scales it.  A serial schedule pass first replicates the stateful
    ``prepare_test_img`` iterator (flags/offsets/sharding); the heavy pure
    frame loads then run in the pool and are yielded strictly in order.

    Note: under ``video_shuffle`` the per-video orders are a DIFFERENT sample
    of the same distribution than the interleaved sequential iterator draws
    (the pipeline consumes np.random between video starts there) — the
    reference loop is unseeded anyway (imagenet_vid_sequence.py:204-212).

    ``u8_transfer`` drops the host Normalize and ships the canvas as uint8
    (4× less host→device traffic; normalization runs on device inside
    frame_features — arithmetic-identical because the pipeline resizes in
    uint8 before normalizing, exactly like the reference).

    ``transfer_batch`` > 1 groups that many consecutive same-canvas frames
    into ONE host→device transfer (a (B, H, W, 3) stack, sliced back to
    per-frame views on device).  On a relay/tunnel-attached host the
    per-transfer round-trip latency dominates small uploads, so batching
    amortizes it; frames are yielded unchanged and in order (a canvas-shape
    change mid-batch flushes early).  Numerically identical to the
    per-frame path.
    """
    import concurrent.futures as cf
    from collections import deque as _deque
    import jax.numpy as jnp

    pipeline = dataset.pipeline
    if u8_transfer:
        from ..data.pipelines import Compose
        pipeline = Compose([dict(t) for t in dataset.pipeline_cfg
                            if t["type"] != "Normalize"])

    # --- serial schedule pass (state machine of prepare_test_img/__getitem__)
    entries: List[Dict] = []
    cur_tid = 0
    video = None
    order = None
    for idx in dataset.indices_list[rank]:
        vid = dataset.global_video_list[idx]
        if cur_tid == 0:
            video = dataset.img_infos[vid].copy()
            order = np.arange(video["frame_seg_len"]).tolist()
            if dataset.video_shuffle:
                np.random.shuffle(order)
            flag = 0
        else:
            flag = 2
        offset = order[cur_tid] if dataset.video_shuffle else cur_tid
        cur_tid += 1
        if cur_tid == video["frame_seg_len"]:
            flag = 1
            cur_tid = 0
        finfo, _, _ = dataset._frame_info(video, offset, with_ann=False)
        entries.append(dict(finfo=finfo, offset=int(offset), flag=flag,
                            seg_len=int(video["frame_seg_len"]),
                            frame_start_id=int(video["frame_id"])))

    to_dev = transfer_batch <= 1

    def load(entry):
        results = dict(img_info=entry["finfo"])
        dataset.pre_pipeline(results)
        out = pipeline(results)
        meta = out["img_meta"]
        img = (np.ascontiguousarray(out["img"], np.uint8) if u8_transfer
               else out["img"].astype(np.float32))
        ch, cw = _canvas_for(meta["pad_shape"], max_long, max_short)
        canvas = pad_to_canvas(img, (ch, cw))
        d = dict(
            img_shape=np.asarray(meta["img_shape"][:2], np.float32),
            pad_shape=np.asarray(meta["pad_shape"][:2], np.float32),
            scale_factor=np.asarray(meta["scale_factor"], np.float32),
            key_frame_flag=entry["flag"], frame_offset=entry["offset"],
            seg_len=entry["seg_len"], frame_start_id=entry["frame_start_id"])
        if to_dev:
            # H2D issued from the worker thread (overlaps device compute)
            d["img"] = jnp.asarray(canvas[None])
        else:
            d["img_host"] = canvas
        return d

    pend: List[Dict] = []

    def flush():
        if len(pend) == 1:
            pend[0]["img"] = jnp.asarray(pend[0].pop("img_host")[None])
        else:
            dev = jnp.asarray(np.stack([p.pop("img_host") for p in pend]))
            for i, p in enumerate(pend):
                p["img"] = dev[i:i + 1]
        out, pend[:] = list(pend), []
        return out

    with cf.ThreadPoolExecutor(max_workers=workers) as ex:
        futs: "_deque" = _deque()
        it = iter(entries)
        for e in entries[:prefetch]:
            futs.append(ex.submit(load, e))
            next(it)
        while futs:
            f = futs.popleft()
            e = next(it, None)
            if e is not None:
                futs.append(ex.submit(load, e))
            r = f.result()
            if to_dev:
                yield r
                continue
            if pend and pend[0]["img_host"].shape != r["img_host"].shape:
                yield from flush()
            pend.append(r)
            if len(pend) >= transfer_batch:
                yield from flush()
        if pend:
            yield from flush()


def collate_train(frames: Sequence[Dict], canvas_hw, gt_max: int = 32) -> Dict:
    """Pack a list of pipelined frame dicts into one fixed-shape sample."""
    F = len(frames)
    ch, cw = canvas_hw
    imgs = np.zeros((F, ch, cw, 3), np.float32)
    gt_bboxes = np.zeros((F, gt_max, 4), np.float32)
    gt_labels = np.zeros((F, gt_max), np.int64)
    gt_mask = np.zeros((F, gt_max), bool)
    img_shape = np.zeros((F, 2), np.float32)
    pad_shape = np.zeros((F, 2), np.float32)
    for i, fr in enumerate(frames):
        img = fr["img"].astype(np.float32)
        imgs[i] = pad_to_canvas(img, (ch, cw))
        meta = fr["img_meta"]
        img_shape[i] = meta["img_shape"][:2]
        pad_shape[i] = meta["pad_shape"][:2]
        b = fr.get("gt_bboxes", np.zeros((0, 4), np.float32))
        l = fr.get("gt_labels", np.zeros((0,), np.int64))
        n = min(len(b), gt_max)
        gt_bboxes[i, :n] = b[:n]
        gt_labels[i, :n] = l[:n]
        gt_mask[i, :n] = True
    return dict(imgs=imgs, gt_bboxes=gt_bboxes, gt_labels=gt_labels,
                gt_mask=gt_mask, img_shape=img_shape, pad_shape=pad_shape)


def train_batch_iterator(dataset, canvas_hw=(608, 1008), gt_max: int = 32,
                         batch_size: int = 1, shuffle: bool = True,
                         seed: int = 0) -> Iterator[Dict]:
    """Yield stacked train batches (leading axis = batch_size samples).

    Each dataset item is a flat list of pipelined frames (3 per video ×
    sampled videos); frames whose canvas orientation disagrees with
    ``canvas_hw`` are padded into it anyway when they fit, else transposed
    buckets should be handled by separate iterators.
    """
    order = np.arange(len(dataset))
    rng = np.random.default_rng(seed)
    while True:
        if shuffle:
            rng.shuffle(order)
        buf = []
        for idx in order:
            frames = dataset[int(idx)]
            try:
                sample = collate_train(frames, canvas_hw, gt_max)
            except AssertionError:
                continue   # frame larger than canvas (portrait in landscape run)
            buf.append(sample)
            if len(buf) == batch_size:
                batch = {k: np.stack([s[k] for s in buf]) for k in buf[0]}
                yield batch
                buf = []


def prefetch_stream(gen, depth: int = 3):
    """Background-thread prefetcher around a frame generator — overlaps host
    decode/augment/pad with device compute (the role the reference delegates
    to torch DataLoader workers)."""
    import queue
    import threading

    q: "queue.Queue" = queue.Queue(maxsize=depth)
    END = object()

    def worker():
        try:
            for item in gen:
                q.put(item)
        finally:
            q.put(END)

    t = threading.Thread(target=worker, daemon=True)
    t.start()
    while True:
        item = q.get()
        if item is END:
            break
        yield item
