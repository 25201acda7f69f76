"""SELSA non-local RoI aggregation head.

Reference `/root/reference/mmdet/models/bbox_heads/selsa_bbox_head.py:12-261`:
fc_new_1 → NL block 1 → fc_new_2 → NL block 2 → fc_cls / class-agnostic
fc_reg, where each NL block is softmax(QKᵀ/√d)·V (V = block input features)
followed by a 1×1 "linear_out" conv and a residual add.

TPU-first re-design:
  * one fused matmul+softmax+matmul chain per block (MXU);
  * `cur_range` becomes *static* slice bounds (fixed proposals/frame);
  * block 2 computes queries only for the key-frame rows — the reference
    computes the full T·300-row attention and then discards all but the key
    rows (selsa_bbox_head.py:238-254), which is mathematically identical;
  * padded proposal slots are excluded from the key/value set with an
    additive −∞ mask instead of dynamic shapes;
  * the fc_new_1 projection (`precompute_fc1`) is *per-row* and
    window-independent, so the inference runner computes it once per frame
    and caches (proposals × 1024) instead of raw 7×7×256 RoI maps — a ~12×
    smaller sliding-window cache and no recompute (the reference re-runs
    RoIAlign + fc over all T frames every output frame, tools/test.py:215-235).
"""
from __future__ import annotations

import math
from typing import Any, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..layers import dense
from ..registry import HEADS
from .bbox_head import flatten_roi_feats

NEG_INF = -1e30


class SelsaAttention(nn.Module):
    """One non-local block: q/k linear → scaled softmax → ·V → 1×1 out.

    ``attention_mesh``: when set to a `jax.sharding.Mesh`, the K/V axis of
    the block shards over the mesh's first axis (sequence parallelism for
    windows beyond one chip — `ops/attention.py:masked_attention_kv_sharded`;
    keys are −∞-padded to a multiple of the axis size, which is exact).
    """
    dim: Tuple[int, int, int] = (1024, 1024, 1024)
    fc_feat_dim: int = 1024
    conv_z: bool = True
    conv_g: bool = False
    attention_mesh: Any = None
    dtype: Any = jnp.float32

    def setup(self):
        self.q_data_fc = dense(self.dim[0], 0.01, self.dtype)
        self.k_data_fc = dense(self.dim[1], 0.01, self.dtype)
        if self.conv_g:
            self.v_data_fc = dense(self.dim[2], 0.01, self.dtype)
        if self.conv_z:
            self.linear_out = dense(self.dim[2], 0.01, self.dtype)

    # ------------------------------------------------ streaming-ring pieces
    # (the sliding-window fast path updates softmax accumulators instead of
    # recomputing the block — ops/streaming_attention.py; these expose the
    # block's projections individually so stationary rows can be cached)
    @property
    def scale(self) -> float:
        return 1.0 / math.sqrt(float(self.dim[1]))

    def q_proj(self, x):
        return self.q_data_fc(x)

    def k_proj(self, x):
        return self.k_data_fc(x)

    def v_proj(self, x):
        return self.v_data_fc(x) if self.conv_g else x

    def out_proj(self, att):
        att = att.astype(self.dtype)
        return self.linear_out(att) if self.conv_z else att

    def __call__(self, roi_feat: jnp.ndarray, nongt_feat: jnp.ndarray,
                 key_mask: Optional[jnp.ndarray] = None,
                 return_aff: bool = False):
        """roi_feat: (Q, D) queries; nongt_feat: (K, D) keys/values.

        When the affinity matrix isn't needed by the caller, the block runs
        through the fused masked-attention op (Pallas flash kernel on TPU,
        plain XLA elsewhere — ops/attention.py); the explicit-affinity path
        is kept for the HRNMP mining branch (return_aff=True).
        """
        from ...ops.attention import masked_attention
        q = self.q_data_fc(roi_feat)
        k = self.k_data_fc(nongt_feat)
        v = self.v_data_fc(nongt_feat) if self.conv_g else nongt_feat
        scale = 1.0 / math.sqrt(float(self.dim[1]))
        if not return_aff:
            bias = (jnp.where(key_mask, 0.0, NEG_INF)
                    if key_mask is not None
                    else jnp.zeros((k.shape[0],), jnp.float32))
            if self.attention_mesh is not None:
                from ...ops.attention import masked_attention_kv_sharded
                mesh = self.attention_mesh
                axis = mesh.axis_names[0]
                pad = (-k.shape[0]) % mesh.shape[axis]
                if pad:
                    k = jnp.pad(k, ((0, pad), (0, 0)))
                    v = jnp.pad(v, ((0, pad), (0, 0)))
                    bias = jnp.pad(bias, (0, pad), constant_values=NEG_INF)
                out = masked_attention_kv_sharded(q, k, v, bias, scale,
                                                  mesh, axis)
            else:
                out = masked_attention(q, k, v, bias, scale)
            out = out.astype(roi_feat.dtype)
            if self.conv_z:
                out = self.linear_out(out)
            return out
        aff = jnp.dot(q, k.T, preferred_element_type=jnp.float32) * scale
        if key_mask is not None:
            aff = jnp.where(key_mask[None, :], aff, NEG_INF)
        w = jax.nn.softmax(aff, axis=-1)
        out = jnp.dot(w.astype(v.dtype), v, preferred_element_type=jnp.float32)
        out = out.astype(roi_feat.dtype)
        if self.conv_z:
            out = self.linear_out(out)  # 1×1 conv on (N, C, 1, 1) ≡ dense
        return out, aff


@HEADS.register_module
class SelsaBBoxHead(nn.Module):
    """Two stacked SELSA blocks over concatenated multi-frame RoI features."""
    sampler_num: int = 128
    t_dim: int = 3
    fc_feat_dim: int = 1024
    non_cur_space: bool = False
    dim: Tuple[int, int, int] = (1024, 1024, 1024)
    output_cur_only: bool = False
    conv_z: Sequence[bool] = (True, True)
    conv_g: Sequence[bool] = (False, False)
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
    attention_mesh: Any = None      # K/V sequence-parallel mesh (optional)
    dtype: Any = jnp.float32

    def setup(self):
        self.fc_new_1 = dense(self.fc_feat_dim, 0.01, self.dtype)
        self.selsa_1 = SelsaAttention(self.dim, self.fc_feat_dim,
                                      self.conv_z[0], self.conv_g[0],
                                      self.attention_mesh, self.dtype)
        self.fc_new_2 = dense(self.fc_feat_dim, 0.01, self.dtype)
        self.selsa_2 = SelsaAttention(self.dim, self.fc_feat_dim,
                                      self.conv_z[1], self.conv_g[1],
                                      self.attention_mesh, self.dtype)
        if self.with_cls:
            self.fc_cls = dense(self.num_classes, 0.01, self.dtype)
        if self.with_reg:
            out_dim = 4 if self.reg_class_agnostic else 4 * self.num_classes
            self.fc_reg = dense(out_dim, 0.01, self.dtype)

    def precompute_fc1(self, bbox_feat: jnp.ndarray) -> jnp.ndarray:
        """Per-row fc_new_1 projection — cacheable per frame at test time."""
        return self.fc_new_1(flatten_roi_feats(bbox_feat).astype(self.dtype))

    def forward_fc1(self, fc1: jnp.ndarray, cur_start: int, cur_len: int,
                    valid_mask: Optional[jnp.ndarray] = None,
                    output_all: bool = False):
        """Head body from the fc_new_1 features (selsa_bbox_head.py:203-261)."""
        nongt_dim = min(self.sampler_num * self.t_dim, fc1.shape[0])
        key_mask = valid_mask[:nongt_dim] if valid_mask is not None else None

        att1 = self.selsa_1(fc1, fc1[:nongt_dim], key_mask)
        fc_all_1 = nn.relu(fc1 + att1)

        fc2 = self.fc_new_2(fc_all_1)
        q2 = fc2 if output_all else jax.lax.slice_in_dim(fc2, cur_start, cur_start + cur_len)
        att2 = self.selsa_2(q2, fc2[:nongt_dim], key_mask)
        fc_all_2 = nn.relu(q2 + att2)

        cls_score = self.fc_cls(fc_all_2) if self.with_cls else None
        bbox_pred = self.fc_reg(fc_all_2) if self.with_reg else None
        return cls_score, bbox_pred

    def __call__(self, bbox_feat: jnp.ndarray, cur_start: int, cur_len: int,
                 valid_mask: Optional[jnp.ndarray] = None,
                 output_all: bool = False):
        """Full forward from pooled RoI features.

        Args:
            bbox_feat: (N, 7, 7, C) pooled RoI features across the temporal
                window (N = t_dim × proposals/frame; fixed).
            cur_start / cur_len: STATIC key-frame row range.
            valid_mask: (N,) bool; False rows are padding, excluded from the
                key/value sets.
            output_all: emit predictions for all rows (reference all_res=True).
        """
        fc1 = self.precompute_fc1(bbox_feat)
        return self.forward_fc1(fc1, cur_start, cur_len, valid_mask, output_all)
