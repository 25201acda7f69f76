"""Sliding-window video inference runner.

Host-side re-implementation of the reference's stateful test loops
(`/root/reference/tools/test.py:143-302` for SELSA T=21,
`/root/reference/tools/hnl_test.py:309-475` for HVRNet T=63):

  * video start (key_frame_flag==0): fresh ring buffer, front-padded with the
    first frame to (T+1)/2 entries (test.py:201-213);
  * interior (==2): push the frame; once T entries are cached, detect the
    center frame (test.py:215-255);
  * video end (==1): pad the tail with the last frame and drain the
    remaining centers (test.py:256-294, ≤ min(seg_len, (T+1)/2) emissions).

The cache holds per-frame (fc1, proposal boxes, masks) rather than raw C4
maps — per-frame computation (backbone → shared head → RPN → RoIAlign →
fc_new_1) is window-independent, so it runs exactly once per frame (the
reference recomputes everything but the backbone for all T frames per output
frame).  When the engine provides the device-side ring-buffer API
(`_RingMixin`), the steady state is one fused push + one detect dispatch per
frame; otherwise host deques + stacking are used.  Results are placed by
absolute frame id exactly like test.py:237-248 so `vid_eval` ordering
matches.
"""
from __future__ import annotations

from collections import deque
from typing import Dict, Iterable, List, Optional

import jax.numpy as jnp
import numpy as np

from ..ops.boxes import bbox2result_np


def _dets_to_result(dets, labels, mask, num_classes: int):
    dets = np.asarray(dets)
    labels = np.asarray(labels)
    mask = np.asarray(mask)
    return bbox2result_np(dets[mask], labels[mask], num_classes)


class SlidingWindowRunner:
    """Runs a SELSA/HVRNet engine over a sequential frame stream."""

    def __init__(self, engine, params, window: Optional[int] = None,
                 branch: int = -1, progress_hook=None,
                 use_ring: Optional[bool] = None, timer=None,
                 prepad_provider=None, aug: bool = False,
                 flush_every: int = 16, pair_features: int = 1,
                 bind: bool = False,
                 speculative_stream: Optional[bool] = None):
        self.engine = engine
        self.params = params
        # Closure-bind the fixed params into the steady-state programs
        # (engine.bind_params — equality-tested).  OFF by default: the
        # per-call dispatch saving (0.099 → 0.020 ms microbenched) is fully
        # hidden by async dispatch pipelining on the device relay
        # (interleaved A/B: +0.01 ms/frame, BASELINE.md round 3) and costs
        # extra XLA compiles per checkpoint; provided for hosts where
        # per-call dispatch is exposed (synchronous callers, slow hosts).
        if bind and hasattr(engine, "bind_params"):
            engine.bind_params(params)
        # multi-scale-flip augmented testing (reference test_mixins.py:15-110
        # via MultiScaleFlipAug): frames arrive as per-aug variants, per-frame
        # proposals merge across augs, per-aug head scores average at decode
        self.aug = aug
        self.window = window or engine.window
        self.key_dim = (self.window - 1) // 2
        self.branch = branch            # which head branch to keep (HVRNet)
        # multi-branch engines decode only the stored branch ON DEVICE — the
        # reference decodes both and discards one (hrnmp get_det_bboxes),
        # which wastes a full multiclass-NMS per frame
        self.device_branch = (branch if getattr(engine, "multi_branch", False)
                              else None)
        self.num_classes = engine.num_classes
        self.progress_hook = progress_hook
        if use_ring is None:
            use_ring = (hasattr(engine, "ring_reset")
                        and self.window == engine.window)
        self.use_ring = use_ring and not aug   # aug path stacks host-side
        # Speculative-rollback streaming (the default for fused stream
        # engines): the stream step carries a sticky health flag instead of
        # the in-program exact-repair lax.cond (~0.28 ms/step fusion-barrier
        # cost at T=21 even when never taken, BASELINE.md round 3).  The
        # flag piggybacks on the existing once-per-flush_every chunk pull;
        # on the vanishingly-rare True this runner replays the chunk's
        # windows EXACTLY (window_detect over a kept feats history) and
        # dispatches engine.stream_rebuild — so emitted detections are
        # identical-or-better vs the cond path (replayed ones are exact).
        # NOTE the replay history (`hist` in run()) keeps T + flush_every
        # per-push device caches alive for exact replay: ~45-50 MB extra
        # steady-state HBM at the T=63 / 300-proposal operating point
        # (fc1 300×1024 f32 + boxes/masks per slot).  Paid on every run even
        # though replays are vanishingly rare — pass
        # speculative_stream=False (the in-program cond path) if HBM is
        # tight at larger windows.
        if speculative_stream is None:
            # honor an explicitly-set engine flag (e.g. bench.py
            # --cond-repair sets engine.stream_rollback = False before
            # constructing the runner); otherwise default on
            spec = bool(engine.__dict__.get("stream_rollback", True))
        else:
            spec = bool(speculative_stream)
        self.speculative = (spec and self.use_ring
                            and getattr(engine, "stream", False)
                            and hasattr(engine, "ring_step")
                            and hasattr(engine, "stream_rebuild"))
        # t_data/t_net-style phase accounting the reference computed but
        # never surfaced (tools/test.py:55-56,195-196)
        self.timer = timer
        # how many detections accumulate on device before one batched
        # device_get round trip pulls them (latency amortization)
        self.flush_every = max(int(flush_every), 1)
        # HVRNet start-of-video padding: the reference replaces repeated
        # first-frame copies with random same-video frames
        # (hnl_test.py:pre_padding_imgs:293).  When set, this callable maps
        # the video's first frame dict to a list of (T+1)//2 − 1 frame dicts
        # pushed before it.
        if aug and prepad_provider is not None:
            raise ValueError("aug testing and random pre-padding cannot be "
                             "combined (prepad frames carry single-variant "
                             "caches; the aug window needs per-aug stacks)")
        self.prepad_provider = prepad_provider
        # interior frames' feature stage (backbone+proposals+RoIAlign+fc1)
        # can batch P consecutive frames through frame_features_batched —
        # per-frame outputs and push/detect ORDER are unchanged (the window
        # math never batches).  NOTE: measured SLOWER on v5e (interleaved
        # A/B 8.8 vs 4.9 ms/frame at P=2 — the batched post unrolls per
        # lane; BASELINE.md round 3); provided as an equality-tested option
        # for hardware where conv batching pays.  Costs P−1 frames of
        # latency; >1 needs the ring path (non-aug).
        self.pair_features = max(int(pair_features), 1)
        if self.pair_features > 1 and (aug or not hasattr(
                engine, "frame_features_batched")):
            self.pair_features = 1

    # ------------------------------------------------------------------ run
    def run(self, frame_stream: Iterable[Dict], num_frames: int) -> List:
        """frame_stream yields dicts with keys:
        img (1,H,W,3 canvas-padded normalized), img_shape (2,), pad_shape (2,),
        scale_factor, key_frame_flag, frame_offset, seg_len, frame_start_id.

        Returns a list of per-frame per-class det lists indexed by absolute
        frame id − 1 (test.py:248).
        """
        # scope the rollback choice to this run: ring_step traces against
        # engine.stream_rollback, so it must match self.speculative while we
        # run, but callers mixing the runner with direct split
        # ring_push/ring_detect use of the same engine get their prior
        # setting back afterwards (advisor round-4 finding)
        restore = False
        if getattr(self.engine, "stream", False) and hasattr(
                self.engine, "stream_rollback"):
            prior = self.engine.__dict__.get("stream_rollback", None)
            self.engine.stream_rollback = self.speculative
            restore = True
        try:
            return self._run(frame_stream, num_frames)
        finally:
            if restore:
                if prior is None:
                    self.engine.__dict__.pop("stream_rollback", None)
                else:
                    self.engine.stream_rollback = prior

    def _run(self, frame_stream: Iterable[Dict], num_frames: int) -> List:
        T = self.window
        half = (T + 1) // 2
        results: List = [None] * num_frames

        ring_state = None
        cache = None        # host fallback
        n_cached = 0
        offsets: deque = deque(maxlen=T)
        meta: deque = deque(maxlen=T)
        # rollback protocol: per-push feats history for exact host replay of
        # a flagged chunk.  A chunk's oldest detection looks back at most
        # T + flush_every − 1 pushes (front-pad pushes only precede the
        # FIRST detection; interior/drain = one push per detection).
        hist: deque = deque(maxlen=T + self.flush_every)
        push_count = 0

        can_fuse = self.use_ring and hasattr(self.engine, "ring_step")

        def push(feats, frame, fmeta, detect: bool = False):
            """Push a frame's caches; when ``detect`` and the window is full,
            the push and the center detection run as ONE device program
            (engine.ring_step)."""
            nonlocal ring_state, cache, n_cached, push_count
            n_cached = min(n_cached + 1, T)
            offsets.append(frame["frame_offset"])
            meta.append(fmeta)
            push_count += 1
            if self.speculative:
                hist.append(feats)
            do_detect = detect and n_cached == T
            if self.use_ring:
                if do_detect and can_fuse:
                    m = meta[self.key_dim]
                    import contextlib
                    ctx = (self.timer.phase("window_detect") if self.timer
                           else contextlib.nullcontext())
                    with ctx:
                        ring_state, out = self.engine.ring_step(
                            self.params, ring_state, feats, m["img_shape"],
                            m["scale_factor"], branch=self.device_branch)
                        _handle_detection(out, m)
                    return
                ring_state = self.engine.ring_push(ring_state, feats,
                                                   params=self.params)
            else:
                cache.append(feats)
            if do_detect:
                detect_center()

        def detect_center():
            import contextlib
            ctx = (self.timer.phase("window_detect") if self.timer
                   else contextlib.nullcontext())
            with ctx:
                m = meta[self.key_dim]
                if self.use_ring:
                    out = self.engine.ring_detect(self.params, ring_state,
                                                  m["img_shape"],
                                                  m["scale_factor"],
                                                  branch=self.device_branch)
                elif self.aug:
                    fc1 = jnp.stack([c["fc1"] for c in cache], axis=1)
                    boxes = jnp.stack([c["boxes"] for c in cache])
                    masks = jnp.stack([c["mask"] for c in cache])
                    out = self.engine.window_detect_aug(
                        self.params, fc1, boxes, masks, m["img_shapes"],
                        m["scale_factors"], m["flips"],
                        branch=self.device_branch, key_dim=self.key_dim)
                else:
                    fc1 = jnp.stack([c["fc1"] for c in cache])
                    boxes = jnp.stack([c["boxes"] for c in cache])
                    masks = jnp.stack([c["mask"] for c in cache])
                    # key_dim must follow the RUNNER's window (a --window
                    # override changes it; the engine default would decode
                    # the wrong frame)
                    out = self.engine.window_detect(
                        self.params, fc1, boxes, masks, m["img_shape"],
                        m["scale_factor"], branch=self.device_branch,
                        key_dim=self.key_dim)
                _handle_detection(out, m)

        # Per-frame device→host pulls pay one tunnel/PCIe round trip EACH;
        # detections are only consumed at the end, so they stay on device and
        # are fetched in chunks with a single jax.device_get (one round trip
        # per flush_every frames).  Measured on the v5e tunnel: 3 pulls/frame
        # ≈ 84 ms → ~2 ms/frame amortized.
        pending: List = []

        def _replay_exact(push_no, m):
            """Exact full-window recompute of the detection emitted at push
            ``push_no`` from the feats history — the rollback protocol's
            replacement for a possibly-corrupt streaming output.  Equals the
            non-streaming window path by construction (the same
            window_detect program the host-cache fallback runs)."""
            newest = len(hist) - 1 - (push_count - push_no)
            window = [hist[newest - T + 1 + j] for j in range(T)]
            fc1 = jnp.stack([c["fc1"] for c in window])
            boxes = jnp.stack([c["boxes"] for c in window])
            masks = jnp.stack([c["mask"] for c in window])
            out = self.engine.window_detect(
                self.params, fc1, boxes, masks, m["img_shape"],
                m["scale_factor"], branch=self.device_branch,
                key_dim=self.key_dim)
            if isinstance(out, list):
                out = out[self.branch]
            return out

        def _flush_pending():
            nonlocal ring_state
            if not pending:
                return
            import jax
            spec = (self.speculative and ring_state is not None
                    and "flag" in ring_state)
            if spec:
                host, flagged = jax.device_get(
                    ([p[0] for p in pending], ring_state["flag"]))
            else:
                host, flagged = jax.device_get([p[0] for p in pending]), False
            if flagged:
                # a streaming accumulator degenerated somewhere in this
                # chunk: replay every window exactly, then rebuild the
                # accumulators from the ring caches (clears the flag)
                host = jax.device_get(
                    [_replay_exact(pno, m) for _, _, m, pno in pending])
                ring_state = self.engine.stream_rebuild(self.params,
                                                        ring_state)
            for (_, fid, _, _), (dets, labels, mask) in zip(pending, host):
                results[fid - 1] = _dets_to_result(dets, labels, mask,
                                                   self.num_classes)
            if self.progress_hook:
                self.progress_hook(len(pending))
            pending.clear()

        def _handle_detection(out, m):
            if isinstance(out, list):       # HVRNet: one det set per branch
                out = out[self.branch]
            fid = m["frame_start_id"] + offsets[self.key_dim]
            pending.append((tuple(out), fid, m, push_count))
            if len(pending) >= self.flush_every:
                _flush_pending()

        import contextlib
        nullctx = contextlib.nullcontext

        def _fmeta(frame):
            return dict(img_shape=frame["img_shape"],
                        scale_factor=frame["scale_factor"],
                        frame_start_id=frame["frame_start_id"])

        # interior-frame pairing: batch P consecutive flag-2 frames through
        # ONE frame_features_batched program, then push/detect each in order
        # (outputs identical to the sequential path — only the feature stage
        # batches)
        fbuf: List[Dict] = []

        def _flush_fbuf():
            if not fbuf:
                return
            with (self.timer.phase("frame_features") if self.timer
                  else nullctx()):
                if len(fbuf) == self.pair_features:
                    imgs = jnp.concatenate([fr["img"] for fr in fbuf], axis=0)
                    ishs = np.stack([np.asarray(fr["img_shape"],
                                                np.float32) for fr in fbuf])
                    pshs = np.stack([np.asarray(fr["pad_shape"],
                                                np.float32) for fr in fbuf])
                    fb = self.engine.frame_features_batched(
                        self.params, imgs, ishs, pshs)
                    flist = [
                        {k: v[j] for k, v in fb.items()}
                        for j in range(len(fbuf))]
                else:            # partial tail: per-frame (no extra compile)
                    flist = [self.engine.frame_features(
                        self.params, fr["img"], fr["img_shape"],
                        fr["pad_shape"]) for fr in fbuf]
            for fr, feats in zip(fbuf, flist):
                push(feats, fr, _fmeta(fr), detect=True)
            fbuf.clear()

        for frame in frame_stream:
            flag = frame["key_frame_flag"]
            if flag == 2 and self.pair_features > 1:
                fbuf.append(frame)
                if len(fbuf) >= self.pair_features:
                    _flush_fbuf()
                continue
            _flush_fbuf()
            with (self.timer.phase("frame_features") if self.timer else nullctx()):
                if self.aug:
                    A = len(frame["img_augs"])
                    feats = self.engine.frame_features_aug(
                        self.params, frame["img_augs"],
                        [frame["img_shape"]] * A, [frame["pad_shape"]] * A,
                        [frame["scale_factor"]] * A, frame["flips"])
                else:
                    feats = self.engine.frame_features(
                        self.params, frame["img"], frame["img_shape"],
                        frame["pad_shape"])
            fmeta = _fmeta(frame)
            if self.aug:
                A = len(frame["img_augs"])
                fmeta.update(img_shapes=[frame["img_shape"]] * A,
                             scale_factors=[frame["scale_factor"]] * A,
                             flips=tuple(frame["flips"]))
            if flag == 0:      # new video: reset + front-pad
                if self.speculative:
                    # the previous video's tail chunk must be flag-checked
                    # against ITS ring state before the reset discards it
                    _flush_pending()
                    hist.clear()
                if self.use_ring:
                    ring_state = self.engine.ring_reset(
                        int(feats["fc1"].shape[-1]))
                else:
                    cache = deque(maxlen=T)
                offsets = deque(maxlen=T)
                meta = deque(maxlen=T)
                n_cached = 0
                if self.prepad_provider is not None:
                    for pre in self.prepad_provider(frame):
                        pre_feats = self.engine.frame_features(
                            self.params, pre["img"], pre["img_shape"],
                            pre["pad_shape"])
                        push(pre_feats, pre, dict(
                            img_shape=pre["img_shape"],
                            scale_factor=pre["scale_factor"],
                            frame_start_id=pre.get("frame_start_id",
                                                   frame["frame_start_id"])))
                        if n_cached >= half - 1:
                            break
                while n_cached < half:
                    push(feats, frame, fmeta)
            elif flag == 2:    # interior
                push(feats, frame, fmeta, detect=True)
            elif flag == 1:    # video end: tail-pad and drain
                while n_cached < T - 1:
                    push(feats, frame, fmeta)
                end_counter = 0
                while end_counter < min(frame["seg_len"], half):
                    push(feats, frame, fmeta, detect=True)
                    end_counter += 1
            else:
                raise ValueError(f"bad key_frame_flag {flag}")
        _flush_fbuf()
        _flush_pending()
        return results
