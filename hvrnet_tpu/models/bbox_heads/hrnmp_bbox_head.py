"""HRNMP head — hierarchical intra/inter-video proposal relation module.

Reference `/root/reference/mmdet/models/bbox_heads/hrnmp_bbox_head.py:56-1052`.
Training graph (its ASCII diagram at 609-626): per video
fc_1→NL_1 (all frames) → fc_2→NL_2 (key rows only) → branch fc_cls/fc_reg →
fc_3→NL_3 (key rows only, input spliced from NL_2 output + fc_1 features);
then all videos concatenated → fc_4 → NL_4 with hardest-proposal mining and a
margin triplet loss over the attention similarities.  Test graph
(`forward_test:800-909`): fc1→NL1→fc2→NL2 → branch preds → fc3 (spliced
input, 865-868) → NL3 (all rows) → fc4 → NL4 (key rows only) → final preds.

Reference quirks preserved deliberately:
  * the shipped file unpacks 4 built NL modules into 6 names
    (hrnmp_bbox_head.py:100-103 vs return at 189) — we build exactly the 4
    modules the forward passes use;
  * hardest-proposal mining returns pos/neg in inverted slots
    (hrnmp_bbox_head.py:411-414,559-563, acknowledged in-code as a bug); kept
    behind ``compat_inverted_mining=True``;
  * ``TripletNonLocalLoss`` comes from a modified external package absent
    upstream; reimplemented as a margin triplet over the scaled q·k
    similarities at the mined indices (margin 10, hrnmp_bbox_head.py:741).

TPU-first notes: static per-video/per-frame row counts make every
``cur_range`` a compile-time slice; padded RoIs are masked out of key sets;
the per-row fc_new_1 projection is cacheable per frame at inference
(see selsa_bbox_head.py docstring).
"""
from __future__ import annotations

import math
from typing import Any, List, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..layers import dense
from ..registry import HEADS
from .bbox_head import flatten_roi_feats
from .selsa_bbox_head import SelsaAttention

NEG_INF = -1e30
POS_INF = 1e30


def _pad_mask(mask_flat: jnp.ndarray, rows: int) -> jnp.ndarray:
    """Extend the (T·P,) key mask with False to ``rows`` — the streaming
    ring's flat caches carry a flash-tile pad tail beyond the slot grid
    (engine ring_reset, ops/attention.KEY_TILE); the tail rows are never
    valid keys."""
    extra = rows - mask_flat.shape[0]
    if extra <= 0:
        return mask_flat
    return jnp.concatenate(
        [mask_flat, jnp.zeros((extra,), mask_flat.dtype)])


def triplet_nonlocal_loss(aff_scale: jnp.ndarray, labels: jnp.ndarray,
                          all_labels: jnp.ndarray,
                          margin: float,
                          key_mask: Optional[jnp.ndarray] = None,
                          compat_inverted_mining: bool = True) -> jnp.ndarray:
    """Hardest-proposal mining + margin triplet loss on the affinity matrix.

    Mirrors `hardest_proposal_mining` (hrnmp_bbox_head.py:357-414) and the
    TripletNonLocalLoss call (559-563): for every non-background query the
    most-similar *different-class* key ("pos_sm" slot) and the least-similar
    *same-class* key ("pos_nsm" slot) are mined from the scaled affinities;
    with the reference's inverted slot assignment the hinge is
    max(0, margin + sim_same_min − sim_diff_max).

    Args:
        aff_scale: (Q, K) scaled affinities (q·k/√d).
        labels: (Q,) query labels (0 = background).
        all_labels: (K,) key labels.
        key_mask: (K,) validity of key rows.
    """
    diff = labels[:, None] != all_labels[None, :]   # reference label_mask
    same = ~diff
    if key_mask is not None:
        diff = diff & key_mask[None, :]
        same = same & key_mask[None, :]

    anchor = labels > 0
    sim_dc = jnp.where(diff, aff_scale, NEG_INF).max(axis=1)   # hardest diff-class
    has_dc = diff.any(axis=1)
    sim_sc = jnp.where(same, aff_scale, POS_INF).min(axis=1)   # least-similar same-class
    has_sc = same.any(axis=1)

    valid = anchor & has_dc & has_sc
    if compat_inverted_mining:
        sim_pos, sim_neg = sim_dc, sim_sc     # inverted slots (reference bug)
    else:
        sim_pos, sim_neg = sim_sc, sim_dc
    per_anchor = jnp.maximum(margin + sim_neg - sim_pos, 0.0)
    per_anchor = jnp.where(valid, per_anchor, 0.0)
    return per_anchor.sum() / jnp.maximum(valid.sum().astype(jnp.float32), 1.0)


@HEADS.register_module
class HRNMPBBoxHead(nn.Module):
    sampler_num: int = 128
    t_dim: int = 9
    imgs_per_video: int = 3
    fc_feat_dim: int = 1024
    non_cur_space: bool = False
    dim: Tuple[int, int, int] = (1024, 1024, 1024)
    output_cur_only: bool = False
    conv_z: Sequence[bool] = (True,) * 8
    conv_g: Sequence[bool] = (False,) * 8
    with_avg_pool: bool = False
    with_cls: bool = True
    with_reg: bool = True
    roi_feat_size: int = 7
    in_channels: int = 256
    num_classes: int = 31
    target_means: Sequence[float] = (0., 0., 0., 0.)
    target_stds: Sequence[float] = (0.1, 0.1, 0.2, 0.2)
    reg_class_agnostic: bool = True
    loss_cls: Any = None
    loss_bbox: Any = None
    triplet_margin: float = 10.0
    compat_inverted_mining: bool = True
    attention_mesh: Any = None      # K/V sequence-parallel mesh (optional)
    #: streaming-repair anchor-gap threshold in nats (None → the ops-level
    #: default, streaming_attention.THETA).  Configurable mainly so tests
    #: can force the health flag / repair to fire on benign inputs.
    stream_theta: Any = None
    dtype: Any = jnp.float32

    def setup(self):
        D, F = self.dim, self.fc_feat_dim
        am = self.attention_mesh
        self.fc_new_1 = dense(F, 0.01, self.dtype)
        self.fc_new_2 = dense(F, 0.01, self.dtype)
        self.fc_new_3 = dense(F, 0.01, self.dtype)
        self.fc_new_4 = dense(F, 0.01, self.dtype)
        self.selsa_1 = SelsaAttention(D, F, self.conv_z[0], self.conv_g[0], am, self.dtype)
        self.selsa_2 = SelsaAttention(D, F, self.conv_z[1], self.conv_g[1], am, self.dtype)
        self.selsa_3 = SelsaAttention(D, F, self.conv_z[2], self.conv_g[2], am, self.dtype)
        self.selsa_4 = SelsaAttention(D, F, self.conv_z[3], self.conv_g[3], am, self.dtype)
        out_dim = 4 if self.reg_class_agnostic else 4 * self.num_classes
        if self.with_cls:
            self.fc_cls = dense(self.num_classes, 0.01, self.dtype)
            self.fc_cls_2 = dense(self.num_classes, 0.01, self.dtype)
        if self.with_reg:
            self.fc_reg = dense(out_dim, 0.01, self.dtype)
            self.fc_reg_2 = dense(out_dim, 0.01, self.dtype)

    def _branch(self, x, final: bool):
        cls_fc = self.fc_cls_2 if final else self.fc_cls
        reg_fc = self.fc_reg_2 if final else self.fc_reg
        cls = cls_fc(x) if self.with_cls else None
        reg = reg_fc(x) if self.with_reg else None
        return cls, reg

    def precompute_fc1(self, bbox_feat: jnp.ndarray) -> jnp.ndarray:
        """Per-row fc_new_1 projection — cacheable per frame at test time."""
        return self.fc_new_1(flatten_roi_feats(bbox_feat).astype(self.dtype))

    # ---------------------------------------------------------------- train
    def forward_train(self, bbox_feats: jnp.ndarray, labels_key: jnp.ndarray,
                      valid_mask: Optional[jnp.ndarray] = None):
        """Training forward (`hrnmp_bbox_head.py:609-795`).

        Args:
            bbox_feats: (V, N, 7, 7, C) pooled RoI features; V videos of
                N = imgs_per_video × sampler_num rows each, the key frame's
                ``sampler_num`` rows first (cur_range start=0,
                hnmb_rcnn.py:388).
            labels_key: (V × sampler_num,) key-frame labels across videos
                (``others`` = bbox_targets_key[0] in the reference).
            valid_mask: (V, N) RoI validity.

        Returns:
            ([cls_branch, cls_final], [reg_branch, reg_final], loss_trip);
            row axis of each output = V × sampler_num key rows.
        """
        V, N = bbox_feats.shape[0], bbox_feats.shape[1]
        S = self.sampler_num
        nongt = min(self.imgs_per_video * S, N)

        cls_branches, reg_branches, video_feats, video_masks = [], [], [], []
        for v in range(V):
            x = flatten_roi_feats(bbox_feats[v]).astype(self.dtype)
            vmask = valid_mask[v] if valid_mask is not None else None
            kmask = vmask[:nongt] if vmask is not None else None

            fc1 = self.fc_new_1(x)
            att1 = self.selsa_1(fc1, fc1[:nongt], kmask)
            fc_all_1 = nn.relu(fc1 + att1)

            fc2 = self.fc_new_2(fc_all_1)
            # NL2 output for key rows only (idx_output_cur_only=True, ref:683-688)
            att2 = self.selsa_2(fc2[:S], fc2[:nongt], kmask)
            fc_all_2 = nn.relu(fc2[:S] + att2)

            cls_b, reg_b = self._branch(fc_all_2, final=False)
            cls_branches.append(cls_b)
            reg_branches.append(reg_b)

            # NL3 input: [NL2-relu key rows, fc1 rows of the other frames]
            # (ref:708-710; start=0 so the leading fc1 segment is empty)
            fc3_in = jnp.concatenate([fc_all_2, fc1[S:]], axis=0)
            fc3 = self.fc_new_3(fc3_in)
            att3 = self.selsa_3(fc3[:S], fc3[:nongt], kmask)
            fc_all_3 = nn.relu(fc3[:S] + att3)
            video_feats.append(fc_all_3)
            video_masks.append(vmask[:S] if vmask is not None
                               else jnp.ones((S,), bool))

        # NL4 over concatenated key rows of all videos (ref:740-795)
        feats4 = jnp.concatenate(video_feats, axis=0)          # (V*S, D)
        mask4 = jnp.concatenate(video_masks, axis=0)           # (V*S,)
        nongt4 = min(self.sampler_num * self.t_dim, feats4.shape[0])
        fc4 = self.fc_new_4(feats4)
        att4, aff4 = self.selsa_4(fc4, fc4[:nongt4], mask4[:nongt4],
                                  return_aff=True)
        fc_all_4 = nn.relu(fc4 + att4)

        loss_trip = triplet_nonlocal_loss(
            aff4, labels_key, labels_key[:nongt4], self.triplet_margin,
            key_mask=mask4[:nongt4],
            compat_inverted_mining=self.compat_inverted_mining)

        cls_final, reg_final = self._branch(fc_all_4, final=True)
        cls_branch = jnp.concatenate(cls_branches, axis=0)
        reg_branch = jnp.concatenate(reg_branches, axis=0)
        return [cls_branch, cls_final], [reg_branch, reg_final], loss_trip

    # ----------------------------------------------------------------- test
    def forward_fc1(self, fc1: jnp.ndarray, cur_start: int, cur_len: int,
                    valid_mask: Optional[jnp.ndarray] = None):
        """Test forward body from fc_new_1 features (`forward_test:800-909`).

        Query-side computation is restricted to the rows each stage actually
        keeps (the reference computes all rows and slices afterwards —
        identical results, T× less matmul work for NL2/NL4).
        """
        N = fc1.shape[0]
        nongt = min(self.sampler_num * self.t_dim, N)
        kmask = valid_mask[:nongt] if valid_mask is not None else None
        s, l = cur_start, cur_len

        att1 = self.selsa_1(fc1, fc1[:nongt], kmask)
        fc_all_1 = nn.relu(fc1 + att1)

        fc2 = self.fc_new_2(fc_all_1)
        q2 = jax.lax.slice_in_dim(fc2, s, s + l)
        att2 = self.selsa_2(q2, fc2[:nongt], kmask)
        fc_all_2_cur = nn.relu(q2 + att2)

        cls_branch, reg_branch = self._branch(fc_all_2_cur, final=False)

        # NL3 input splice (ref:865-868)
        fc3_in = jnp.concatenate([
            jax.lax.slice_in_dim(fc1, 0, s),
            fc_all_2_cur,
            jax.lax.slice_in_dim(fc1, s + l, N),
        ], axis=0)
        fc3 = self.fc_new_3(fc3_in)
        att3 = self.selsa_3(fc3, fc3[:nongt], kmask)   # all rows (ref:870)
        fc_all_3 = nn.relu(fc3 + att3)

        fc4 = self.fc_new_4(fc_all_3)
        q4 = jax.lax.slice_in_dim(fc4, s, s + l)       # output_cur_only_4 (ref:888-894)
        att4 = self.selsa_4(q4, fc4[:nongt], kmask)
        fc_all_4 = nn.relu(q4 + att4)

        cls_final, reg_final = self._branch(fc_all_4, final=True)
        return [cls_branch, cls_final], [reg_branch, reg_final]

    def forward_test(self, bbox_feat: jnp.ndarray, cur_start: int, cur_len: int,
                     valid_mask: Optional[jnp.ndarray] = None):
        fc1 = self.precompute_fc1(bbox_feat)
        return self.forward_fc1(fc1, cur_start, cur_len, valid_mask)

    def forward_test_multi_passes(self, bbox_feat: jnp.ndarray, pass_len: int,
                                  cur_start: int, cur_len: int,
                                  valid_mask: Optional[jnp.ndarray] = None):
        """Alternative multi-pass test graph (`forward_test_multi_passes`,
        hrnmp_bbox_head.py:911-967 — present upstream but its call sites are
        commented out, hnmb_rcnn.py:601 / hnl_rcnn.py:344).

        The cached window rows are split into equal passes (the reference
        derives ``cur_range_multi`` from ``test_branches`` segments,
        hnmb_rcnn.py:592-595); NL1/NL2 run per pass independently, the pass
        outputs are concatenated, and a single NL3 with key-row queries
        (idx_output_cur_only=True) feeds the FINAL cls/reg fcs directly —
        NL4 and the branch predictions are not used, so the returned lists
        have one element and ``get_det_bboxes``'s score averaging reduces to
        the final scores.

        Args:
            bbox_feat: (N, 7, 7, C) cached RoI features, pass-major order.
            pass_len: static rows per pass (N must be divisible by it).
            cur_start/cur_len: key-frame rows in the CONCATENATED layout
                (cur_range_s[0] in the reference).
        """
        fc1_all = self.precompute_fc1(bbox_feat)
        return self.forward_fc1_multi_passes(fc1_all, pass_len, cur_start,
                                             cur_len, valid_mask)

    def forward_fc1_multi_passes(self, fc1_all: jnp.ndarray, pass_len: int,
                                 cur_start: int, cur_len: int,
                                 valid_mask: Optional[jnp.ndarray] = None):
        """Multi-pass body from cached fc_new_1 rows (fc_new_1 is row-wise, so
        per-pass projection of raw features ≡ slicing precomputed rows)."""
        N = fc1_all.shape[0]
        assert N % pass_len == 0, (N, pass_len)
        nongt_pass = min(self.sampler_num * self.t_dim, pass_len)
        pass_feats = []
        for p in range(N // pass_len):
            fc1 = jax.lax.slice_in_dim(fc1_all, p * pass_len, (p + 1) * pass_len)
            vmask = (valid_mask[p * pass_len:(p + 1) * pass_len]
                     if valid_mask is not None else None)
            kmask = vmask[:nongt_pass] if vmask is not None else None
            att1 = self.selsa_1(fc1, fc1[:nongt_pass], kmask)
            fc_all_1 = nn.relu(fc1 + att1)
            fc2 = self.fc_new_2(fc_all_1)
            att2 = self.selsa_2(fc2, fc2[:nongt_pass], kmask)
            pass_feats.append(nn.relu(fc2 + att2))

        video_feats = jnp.concatenate(pass_feats, axis=0)       # (N, D)
        nongt = min(self.sampler_num * self.t_dim, N)
        kmask3 = valid_mask[:nongt] if valid_mask is not None else None
        fc3 = self.fc_new_3(video_feats)
        q3 = jax.lax.slice_in_dim(fc3, cur_start, cur_start + cur_len)
        att3 = self.selsa_3(q3, fc3[:nongt], kmask3)
        fc_all_3 = nn.relu(q3 + att3)
        cls_final, reg_final = self._branch(fc_all_3, final=True)
        return [cls_final], [reg_final]

    # ------------------------------------------------------- streaming ring
    # The sliding-window fast path: NL1's q/k/v rows and NL3's non-key-frame
    # q/k/v rows are row-wise functions of the per-frame cached fc1 (the
    # reference's forward_test recomputes them for all T frames every output
    # frame, hnl_test.py:309-475) — so their softmaxes are kept in streaming
    # (m, l, acc) form (ops/streaming_attention.py) and updated in O(T·P²·D)
    # per slide instead of recomputed in O(T²·P²·D).  NL2/NL4 have fresh
    # key-frame queries every step and stay exact 1-row-block attentions.
    # Only valid when every row is a key (t_dim·sampler_num ≥ T·P — the
    # window↔t_dim coupling the engine enforces) and conv_g is off for
    # NL1/NL3 (both true at the reference operating points).

    def stream_project(self, fc1_new: jnp.ndarray):
        """Stationary per-frame rows for the streaming caches: NL1 q/k and
        the fc_new_3 projection (= NL3's non-key-frame input rows,
        forward_test's splice ref:865-868) with its q/k."""
        assert not self.conv_g[0] and not self.conv_g[2], \
            "streaming ring assumes v = block input (conv_g off)"
        fc3s = self.fc_new_3(fc1_new)
        return dict(q1=self.selsa_1.q_proj(fc1_new),
                    k1=self.selsa_1.k_proj(fc1_new),
                    fc3s=fc3s,
                    q3=self.selsa_3.q_proj(fc3s),
                    k3=self.selsa_3.k_proj(fc3s))

    def stream_update(self, st: dict, fc1_new: jnp.ndarray,
                      mask_new: jnp.ndarray, slot, rollback: bool = False):
        """Slide the window: evict ring slot ``slot``'s keys from the NL1/NL3
        accumulators, insert the arriving frame's (one fused pass — see
        ops/streaming_attention.slide), overwrite the stationary caches, and
        rebuild the arriving rows' accumulators exactly.

        st keys: mask (T, P) + fc1, q1, k1, fc3s, q3, k3 stored FLAT
        (T·P, D) — (T, P, D) buffers tile-pad the 300-row axis to 304 on TPU,
        so every per-step (T,P,D)→(R,D) reshape was a real repack (~0.15
        ms/frame profiled); flat storage makes them bitcasts — plus m1, l1,
        m3, l3 (T·P,), a1, a3 (T·P, D), and M1, M3 (T·P, T) per-slot
        logit-max health tables.  ``slot`` is traced.  Both blocks' exact
        rebuilds share ONE `lax.cond` (each cond boundary copies its big
        operand tuple even when the cheap branch runs — two conds cost ~0.23
        ms/step profiled).

        ``rollback=True`` is the speculative mode: NO in-program repair —
        the slid accumulators are committed as-is and the health verdict is
        returned as a scalar alongside the state, ``(out, bad)``.  The
        caller (engine ring_step + SlidingWindowRunner) carries the flag
        stickily in the ring state and replays flagged windows exactly on
        the host (the rollback protocol, engine/detector.py stream_rebuild),
        so the hot step pays neither the cond's fusion barrier nor its
        pass-through copies (~0.23-0.28 ms/step at T=21, more at T=63).
        """
        from ...ops.streaming_attention import (degenerate_rows, init_rows,
                                                slide)
        T, P = st["mask"].shape
        R = T * P
        proj = self.stream_project(fc1_new)
        row0 = slot * P
        take_rows = lambda arr: jax.lax.dynamic_slice_in_dim(arr, row0, P, 0)
        put_rows = lambda arr, new: jax.lax.dynamic_update_slice_in_dim(
            arr, new.astype(arr.dtype), row0, 0)

        out = dict(st)
        out["mask"] = jax.lax.dynamic_update_slice(
            st["mask"], mask_new[None].astype(st["mask"].dtype), (slot, 0))
        out["fc1"] = put_rows(st["fc1"], fc1_new)
        for k in ("q1", "k1", "fc3s", "q3", "k3"):
            out[k] = put_rows(st[k], proj[k])
        mask_all = _pad_mask(out["mask"].reshape(R), st["fc1"].shape[0])

        def slide_block(name, q_new, k_new, v_new, scale):
            acc = dict(m=st["m" + name], l=st["l" + name], a=st["a" + name])
            vkey = "fc1" if name == "1" else "fc3s"
            acc, col = slide(acc, st["q" + name],
                             take_rows(st["k" + name]), take_rows(st[vkey]),
                             jax.lax.dynamic_index_in_dim(
                                 st["mask"], slot, 0, keepdims=False),
                             k_new, v_new, mask_new, scale)
            M = jax.lax.dynamic_update_slice(st["M" + name], col[:, None],
                                             (0, slot))
            # fresh accumulators + health rows for the arriving frame
            fr, frM = init_rows(q_new, out["k" + name], out[vkey], mask_all,
                                scale, slots=T, slot_rows=R)
            acc = dict(m=put_rows(acc["m"], fr["m"]),
                       l=put_rows(acc["l"], fr["l"]),
                       a=put_rows(acc["a"], fr["a"]))
            M = put_rows(M, frM)
            return acc, M

        acc1, M1 = slide_block("1", proj["q1"], proj["k1"], fc1_new,
                               self.selsa_1.scale)
        acc3, M3 = slide_block("3", proj["q3"], proj["k3"], proj["fc3s"],
                               self.selsa_3.scale)

        from ...ops.streaming_attention import THETA
        th = THETA if self.stream_theta is None else float(self.stream_theta)
        if rollback:
            # speculative: commit the slid accumulators, report health —
            # the cond (and its fusion barrier) never enters the program
            bad = (degenerate_rows(acc1, M1, th).any()
                   | degenerate_rows(acc3, M3, th).any())
            out["m1"], out["l1"], out["a1"], out["M1"] = \
                acc1["m"], acc1["l"], acc1["a"], M1
            out["m3"], out["l3"], out["a3"], out["M3"] = \
                acc3["m"], acc3["l"], acc3["a"], M3
            return out, bad

        # ONE exact-rebuild cond for both blocks: rebuilding a healthy block
        # alongside a degenerate one is still exact, and repairs are rare.
        # The optimization_barrier pins the slide computation OUTSIDE the
        # cond: without it XLA sinks slide work into the pass-through branch
        # (its results' only consumer), where it serializes behind the
        # predicate instead of overlapping — profiled at 0.9 ms/step of
        # conditional time at T=63 vs ~0 with the barrier.
        acc1, M1, acc3, M3 = jax.lax.optimization_barrier((acc1, M1, acc3, M3))
        bad = (degenerate_rows(acc1, M1, th).any()
               | degenerate_rows(acc3, M3, th).any())

        def rebuild(_):
            a1, m1 = init_rows(out["q1"], out["k1"], out["fc1"], mask_all,
                               self.selsa_1.scale, slots=T, slot_rows=R)
            a3, m3 = init_rows(out["q3"], out["k3"], out["fc3s"], mask_all,
                               self.selsa_3.scale, slots=T, slot_rows=R)
            return a1, m1, a3, m3

        def keep(_):
            return acc1, M1, acc3, M3

        acc1, M1, acc3, M3 = jax.lax.cond(bad, rebuild, keep, None)
        out["m1"], out["l1"], out["a1"], out["M1"] = \
            acc1["m"], acc1["l"], acc1["a"], M1
        out["m3"], out["l3"], out["a3"], out["M3"] = \
            acc3["m"], acc3["l"], acc3["a"], M3
        return out

    def stream_forward(self, st: dict, center, rollback: bool = False):
        """Key-frame predictions from the streaming state (≡ `forward_fc1`
        with cur = ring slot ``center``, up to streaming-softmax rounding).

        NL1 outputs come straight from the accumulators; NL3 applies the
        key-frame splice (ref:865-868) as a NON-persistent evict/insert of
        the center slot's stationary rows vs the fresh fc_all_2 rows, plus
        one exact pass for the center rows' fresh queries.

        ``rollback=True``: the splice slide's repair cond is skipped and its
        health verdict returned instead — ``(cls_list, reg_list, bad)`` —
        for the host-replay rollback protocol (see stream_update).
        """
        from ...ops.streaming_attention import (degenerate_rows, finalize,
                                                init_rows, repair, slide)
        T, P = st["mask"].shape
        R = T * P
        mask_all = _pad_mask(st["mask"].reshape(R), st["fc1"].shape[0])
        row0 = center * P
        take_rows = lambda arr: jax.lax.dynamic_slice_in_dim(arr, row0, P, 0)
        put_rows = lambda arr, new: jax.lax.dynamic_update_slice_in_dim(
            arr, new.astype(arr.dtype), row0, 0)

        att1 = self.selsa_1.out_proj(
            finalize(dict(m=st["m1"], l=st["l1"], a=st["a1"])))
        fc_all_1 = nn.relu(st["fc1"].astype(self.dtype) + att1)

        fc2 = self.fc_new_2(fc_all_1)
        fc2_c = take_rows(fc2)
        att2 = self.selsa_2(fc2_c, fc2, mask_all)
        fc_all_2_cur = nn.relu(fc2_c + att2)
        cls_branch, reg_branch = self._branch(fc_all_2_cur, final=False)

        # NL3: splice = replace the center slot's stationary rows with the
        # fresh fc_all_2 rows, on both the key side (temporary fused
        # evict+insert on the accumulators) and the query side (exact pass,
        # rows spliced)
        fc3f = self.fc_new_3(fc_all_2_cur)
        q3f = self.selsa_3.q_proj(fc3f)
        k3f = self.selsa_3.k_proj(fc3f)
        scale3 = self.selsa_3.scale
        q3 = st["q3"]
        mask_c = jax.lax.dynamic_index_in_dim(st["mask"], center, 0,
                                              keepdims=False)
        k3_eff = put_rows(st["k3"], k3f)
        fc3_eff = put_rows(st["fc3s"], fc3f)
        acc3 = dict(m=st["m3"], l=st["l3"], a=st["a3"])
        acc3, col3 = slide(acc3, q3, take_rows(st["k3"]), take_rows(st["fc3s"]),
                           mask_c, k3f, fc3f, mask_c, scale3)
        M3 = jax.lax.dynamic_update_slice(st["M3"], col3[:, None], (0, center))
        from ...ops.streaming_attention import THETA
        th = THETA if self.stream_theta is None else float(self.stream_theta)
        if rollback:
            bad = degenerate_rows(acc3, M3, th).any()
        else:
            acc3, _ = repair(acc3, M3, q3, k3_eff, fc3_eff, mask_all, scale3,
                             T, theta=th, slot_rows=R)
        att3 = finalize(acc3)                                   # (R, D)

        acc_c = init_rows(q3f, k3_eff, fc3_eff, mask_all, scale3)
        att3 = put_rows(att3, finalize(acc_c))
        att3 = self.selsa_3.out_proj(att3)
        fc_all_3 = nn.relu(fc3_eff.astype(self.dtype) + att3)

        fc4 = self.fc_new_4(fc_all_3)
        fc4_c = take_rows(fc4)
        att4 = self.selsa_4(fc4_c, fc4, mask_all)
        fc_all_4 = nn.relu(fc4_c + att4)
        cls_final, reg_final = self._branch(fc_all_4, final=True)
        if rollback:
            return [cls_branch, cls_final], [reg_branch, reg_final], bad
        return [cls_branch, cls_final], [reg_branch, reg_final]

    def stream_rebuild(self, st: dict) -> dict:
        """Exact rebuild of BOTH blocks' accumulators + health tables from
        the current ring caches — the rollback protocol's recovery program
        (the repair branch of stream_update, run unconditionally).  One
        (R, R) pass per block; dispatched by the host only when a flushed
        chunk's health flag was set, i.e. vanishingly rarely."""
        from ...ops.streaming_attention import init_rows
        T, P = st["mask"].shape
        mask_all = _pad_mask(st["mask"].reshape(T * P), st["fc1"].shape[0])
        out = dict(st)
        a1, M1 = init_rows(st["q1"], st["k1"], st["fc1"], mask_all,
                           self.selsa_1.scale, slots=T, slot_rows=T * P)
        a3, M3 = init_rows(st["q3"], st["k3"], st["fc3s"], mask_all,
                           self.selsa_3.scale, slots=T, slot_rows=T * P)
        out["m1"], out["l1"], out["a1"], out["M1"] = \
            a1["m"], a1["l"], a1["a"], M1
        out["m3"], out["l3"], out["a3"], out["M3"] = \
            a3["m"], a3["l"], a3["a"], M3
        return out

    def __call__(self, bbox_feat, *args, mode: str = "test", **kw):
        if mode == "train":
            return self.forward_train(bbox_feat, *args, **kw)
        return self.forward_test(bbox_feat, *args, **kw)


# The reference package exports HNLBBoxHead / HNMBBBoxHead / HMPBBoxHead
# (`mmdet/models/bbox_heads/__init__.py`) but the implementation files
# `hnonlocal_bbox_head.py`, `hnmb_bbox_head.py`, `hmp_bbox_head.py` are
# absent from the shipped tree — importing the reference package crashes.
# The HRNMP config documents them as earlier iterations of the same
# hierarchical relation head (`faster_rcnn_r101_hrnmp_c5.py:24-26`); they are
# registered here as that head so configs naming them still build.

@HEADS.register_module
class HNLBBoxHead(HRNMPBBoxHead):
    """Intra+inter-video non-local head (upstream file missing; see above)."""


@HEADS.register_module
class HNMBBBoxHead(HRNMPBBoxHead):
    """Mini-batch video relation head (upstream file missing; see above)."""


@HEADS.register_module
class HMPBBoxHead(HRNMPBBoxHead):
    """Hierarchical message-passing head (upstream file missing; see above)."""
