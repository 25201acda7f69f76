"""Batched multi-stream sliding-window inference.

The single-stream runner is latency-bound: one frame's backbone + one
window's attention per step leave the MXU underfed.  For throughput (the
ImageNet-VID val sweep — BASELINE.json config 5) this runner drives B video
streams in lockstep: each step batches one frame per stream through the
backbone/proposal/RoI programs and one window-detect per stream through a
vmapped ring-buffer detect — the per-step work grows ~B× while the step cost
grows far slower.

Faithfulness: each stream replays exactly the reference deque algorithm
(tools/test.py:201-294).  `make_window_schedule` *simulates* that state
machine per video and emits a flat list of (push_offset, reset, emit_offset)
actions, so the windows and emission order match the sequential runner
bit-for-bit; streams at different phases simply mask their emissions.
"""
from __future__ import annotations

from collections import deque
from typing import Dict, List, Optional, Tuple

import numpy as np


def make_window_schedule(offsets: List[int], T: int
                         ) -> List[Tuple[int, bool, Optional[int]]]:
    """Simulate the reference sliding-window loop for one video.

    Args:
        offsets: visit order of frame offsets (shuffled when video_shuffle).
        T: window length.

    Returns:
        list of (push_offset, reset, emit_offset or None); ``reset`` marks the
        video's first action (ring refilled with that frame = the reference's
        front padding, test.py:210-213).
    """
    L = len(offsets)
    half = (T + 1) // 2
    actions: List[Tuple[int, bool, Optional[int]]] = []
    window: deque = deque(maxlen=T)

    def push(off, reset=False):
        window.append(off)
        actions.append((off, reset, None))

    def emit():
        po, pr, _ = actions[-1]
        actions[-1] = (po, pr, window[half - 1])

    for i, off in enumerate(offsets):
        if i == 0:
            # reset fills the ring with `half` logical copies; the remaining
            # T-half slots are overwritten before the first emission
            for _ in range(half):
                window.append(off)
            actions.append((off, True, None))
        elif i < L - 1:
            push(off)
            if len(window) == T:
                emit()
        else:  # last frame (key_frame_flag == 1)
            while len(window) < T - 1:
                push(off)
            for _ in range(min(L, half)):
                push(off)
                emit()
    return actions


class BatchedSlidingWindowRunner:
    """Lockstep B-stream runner over one rank's whole-video shard."""

    def __init__(self, engine, params, batch: int = 4,
                 window: Optional[int] = None, branch: int = -1,
                 progress_hook=None, loader_workers: int = 0,
                 u8_transfer: bool = False):
        self.engine = engine
        self.params = params
        self.batch = batch
        self.window = window or engine.window
        self.key_dim = (self.window - 1) // 2
        self.branch = branch
        self.num_classes = engine.num_classes
        self.progress_hook = progress_hook
        # >0: per-step frame loads (one per stream) run in a thread pool —
        # the step's host work drops from B sequential decodes to ~one
        self.loader_workers = int(loader_workers)
        # ship frames as uint8, normalize on device (see stream.py docstring)
        self.u8_transfer = u8_transfer

    def run(self, dataset, rank: int = 0, max_long: int = 1008,
            max_short: int = 608) -> List:
        import jax.numpy as jnp
        from ..ops.boxes import bbox2result_np
        from .canvas import pad_to_canvas, pick_canvas_shape

        pipeline = dataset.pipeline
        if self.u8_transfer:
            from ..data.pipelines import Compose
            pipeline = Compose([dict(t) for t in dataset.pipeline_cfg
                                if t["type"] != "Normalize"])
        pool = None
        if self.loader_workers > 0:
            import concurrent.futures as cf
            pool = cf.ThreadPoolExecutor(max_workers=self.loader_workers)

        T, B = self.window, self.batch
        num_frames = len(dataset)
        results: List = [None] * num_frames

        # rank's videos (whole-video sharding, get_indices semantics)
        vids = sorted(set(dataset.global_video_list[i]
                          for i in dataset.indices_list[rank]))

        # per-video action schedules with the dataset's shuffle semantics
        jobs = []
        for v in vids:
            info = dataset.img_infos[v]
            L = info["frame_seg_len"]
            order = np.arange(L).tolist()
            if dataset.video_shuffle:
                np.random.shuffle(order)
            jobs.append((v, make_window_schedule(order, T)))

        def load_frame(video_idx: int, offset: int):
            info = dataset.img_infos[video_idx]
            finfo, _, _ = dataset._frame_info(info, offset, with_ann=False)
            r = dict(img_info=finfo)
            dataset.pre_pipeline(r)
            out = pipeline(r)
            meta = out["img_meta"]
            ch, cw = pick_canvas_shape(meta["pad_shape"][0],
                                       meta["pad_shape"][1],
                                       max_long, max_short)
            img = (np.ascontiguousarray(out["img"], np.uint8)
                   if self.u8_transfer else out["img"].astype(np.float32))
            return dict(
                img=pad_to_canvas(img, (ch, cw)),
                img_shape=np.asarray(meta["img_shape"][:2], np.float32),
                pad_shape=np.asarray(meta["pad_shape"][:2], np.float32),
                scale_factor=np.asarray(meta["scale_factor"], np.float32),
                frame_start_id=info["frame_id"])

        # stream state
        job_iter = iter(jobs)
        streams = [dict(actions=None, step=0, video=None, cache={})
                   for _ in range(B)]

        def refill(s):
            try:
                v, actions = next(job_iter)
            except StopIteration:
                s["actions"] = None
                return False
            s["video"], s["actions"], s["step"] = v, actions, 0
            s["cache"] = {}
            return True

        for s in streams:
            refill(s)

        state = None
        fc1_dim = None
        # all streams of a batch share one canvas orientation; mixed
        # portrait/landscape shards should go to separate ranks
        canvas_hw = (max_short, max_long)

        pending_out: List[Tuple] = []    # [(device (dets,labels,mask), emits)]

        def flush():
            if not pending_out:
                return
            import jax
            host = jax.device_get([p[0] for p in pending_out])
            for (_, ems), (dets, labels, mask) in zip(pending_out, host):
                for b, e in enumerate(ems):
                    if e is None:
                        continue
                    start_id, off = e
                    res = bbox2result_np(dets[b][mask[b]],
                                         labels[b][mask[b]],
                                         self.num_classes)
                    results[start_id + off - 1] = res
                    if self.progress_hook:
                        self.progress_hook(1)
            pending_out.clear()

        while any(s["actions"] is not None for s in streams):
            imgs, ishs, pshs, sfs = [], [], [], []
            resets = np.zeros(B, bool)
            emits: List[Optional[Tuple[int, int]]] = [None] * B
            # pass 1: advance every stream's state machine, queue the loads
            pending: List[Optional[Tuple]] = [None] * B   # (video, off, emit)
            frames: List[Optional[Dict]] = [None] * B
            for b, s in enumerate(streams):
                if s["actions"] is None or s["step"] >= len(s["actions"]):
                    if s["actions"] is not None and not refill(s):
                        pass
                if s["actions"] is None:
                    # exhausted stream: repeat a dummy frame, never emit
                    fr = s.get("last_frame")
                    if fr is None:
                        dt = np.uint8 if self.u8_transfer else np.float32
                        fr = dict(img=np.zeros(
                            (canvas_hw[0], canvas_hw[1], 3), dt),
                            img_shape=np.array([canvas_hw[0], canvas_hw[1]],
                                               np.float32),
                            pad_shape=np.array([canvas_hw[0], canvas_hw[1]],
                                               np.float32),
                            scale_factor=np.ones(4, np.float32),
                            frame_start_id=1)
                    frames[b] = fr
                else:
                    off, reset, emit_off = s["actions"][s["step"]]
                    s["step"] += 1
                    resets[b] = reset
                    if off in s["cache"]:
                        frames[b] = s["cache"][off]
                        if emit_off is not None:
                            emits[b] = (frames[b]["frame_start_id"], emit_off)
                    else:
                        pending[b] = (s["video"], off, emit_off)
            # pass 2: run this step's loads concurrently (decode dominates)
            if pool is not None:
                futs = {b: pool.submit(load_frame, p[0], p[1])
                        for b, p in enumerate(pending) if p is not None}
                loaded = {b: f.result() for b, f in futs.items()}
            else:
                loaded = {b: load_frame(p[0], p[1])
                          for b, p in enumerate(pending) if p is not None}
            for b, fr in loaded.items():
                video, off, emit_off = pending[b]
                streams[b]["cache"] = {off: fr}   # keep only the latest
                frames[b] = fr
                if emit_off is not None:
                    emits[b] = (fr["frame_start_id"], emit_off)
            for b, fr in enumerate(frames):
                if streams[b]["actions"] is not None:
                    streams[b]["last_frame"] = fr
                imgs.append(fr["img"])
                ishs.append(fr["img_shape"])
                pshs.append(fr["pad_shape"])
                sfs.append(fr["scale_factor"])
                canvas_hw = fr["img"].shape[:2]

            feats = self.engine.frame_features_batched(
                self.params, jnp.asarray(np.stack(imgs)),
                np.stack(ishs), np.stack(pshs))
            if state is None:
                fc1_dim = int(feats["fc1"].shape[-1])
                state = self.engine.ring_reset_batched(B, fc1_dim)
            state = self.engine.ring_push_batched(
                state, feats, jnp.asarray(resets))

            if any(e is not None for e in emits):
                out = self.engine.ring_detect_batched(
                    self.params, state, np.stack(ishs), np.stack(sfs))
                if isinstance(out, list):
                    out = out[self.branch]
                # detections stay on device; one batched device_get per
                # flush (interconnect round-trip amortization, see
                # video_runner.py)
                pending_out.append((tuple(out), list(emits)))
                if len(pending_out) >= 8:
                    flush()
        flush()
        if pool is not None:
            pool.shutdown()
        return results
