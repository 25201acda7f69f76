"""Fused masked attention — Pallas TPU kernel for the SELSA non-local blocks.

The relation heads compute ``softmax(QKᵀ/√d + mask) · V`` over up to
T×300 = 6300 RoI tokens (selsa_bbox_head.py:154-190).  Plain XLA
materializes the (6300, 6300) affinity twice (logits + softmax ≈ 2×160 MB of
HBM traffic per block); this kernel streams K/V tiles through VMEM with an
online (flash) softmax, so HBM sees only Q, K, V and the output.  The math is
exact (same reduction, numerically stabilized); gradients fall back to the
XLA expression via custom_vjp recomputation.

Key masking is an additive bias row (0 for valid keys, −1e30 for padded
proposal slots), matching the −∞ masking in `SelsaAttention`.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30

#: flash-kernel key-tile size (`_flash_attention` tk).  Exposed so stateful
#: callers (the streaming ring) can store K/V caches PRE-padded to the tile
#: multiple, turning the wrapper's per-call k/v pad copies (two full K/V HBM
#: passes, ~0.24 ms/step at the 63×300 point) into no-ops.
KEY_TILE = 512


def _attention_reference(q, k, v, bias, scale):
    aff = jnp.dot(q, k.T, preferred_element_type=jnp.float32) * scale
    aff = aff + bias[None, :]
    w = jax.nn.softmax(aff, axis=-1)
    return jnp.dot(w.astype(v.dtype), v,
                   preferred_element_type=jnp.float32).astype(jnp.float32)


def _flash_kernel(q_ref, k_ref, v_ref, bias_ref, o_ref,
                  m_ref, l_ref, acc_ref, *, scale: float, nk_tiles: int):
    """Grid = (q_tiles, k_tiles); k is the innermost (fastest) dimension.
    Scratch (per q-tile): running max m, normalizer l, accumulator acc.

    All operands arrive tile-divisible (host-padded).  Ragged tiles were
    tried and are a Mosaic dead end on this toolchain (BASELINE.md round-4
    negative result): unpadded blocks compile to single-buffered over-sized
    windows, and in-kernel tail masking (iota+where on the v tile) explodes
    into ~208 MB of register-allocator spill slots — both hard compile
    errors at the 300×18900 point."""
    kt = pl.program_id(1)

    @pl.when(kt == 0)
    def _():
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    q = q_ref[:]                                     # (TQ, D) bf16/f32
    k = k_ref[:]                                     # (TK, D)
    v = v_ref[:]                                     # (TK, D)
    s = jnp.dot(q, k.T, preferred_element_type=jnp.float32) * scale
    s = s + bias_ref[:]                              # (1, TK) broadcasts

    m_prev = m_ref[:]                                # (TQ, 1)
    m_cur = jnp.max(s, axis=1, keepdims=True)
    m_new = jnp.maximum(m_prev, m_cur)
    alpha = jnp.exp(m_prev - m_new)
    p = jnp.exp(s - m_new)                           # (TQ, TK)
    l_ref[:] = l_ref[:] * alpha + p.sum(axis=1, keepdims=True)
    acc_ref[:] = acc_ref[:] * alpha + jnp.dot(
        p.astype(v.dtype), v, preferred_element_type=jnp.float32)
    m_ref[:] = m_new

    @pl.when(kt == nk_tiles - 1)
    def _():
        o_ref[:] = (acc_ref[:] / l_ref[:]).astype(o_ref.dtype)


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


@functools.partial(jax.jit, static_argnames=("scale", "tq", "tk"))
def _flash_attention(q, k, v, bias, scale: float, tq: int = 256,
                     tk: int = 512):
    """Host-pads every operand to its tile (the k/v pads cost two full K/V
    HBM copies, ~0.24 ms/step at the 63×300 point — an accepted cost: both
    unpadded-block strategies fail to compile on this Mosaic, see
    _flash_kernel's docstring and the BASELINE.md round-4 negative row)."""
    nq, d = q.shape
    nk = k.shape[0]
    nq_p = _round_up(nq, tq)
    nk_p = _round_up(nk, tk)
    # when the caller pre-padded K/V to the tile multiple (KEY_TILE), these
    # pads are zero-width and XLA elides them — no HBM copies
    qp = jnp.pad(q, ((0, nq_p - nq), (0, 0)))
    kp = jnp.pad(k, ((0, nk_p - nk), (0, 0)))
    vp = jnp.pad(v, ((0, nk_p - nk), (0, 0)))
    bp = jnp.pad(bias, (0, nk_p - nk), constant_values=NEG_INF)
    bp = bp.reshape(1, nk_p)
    nq_tiles = nq_p // tq
    nk_tiles = nk_p // tk

    out = pl.pallas_call(
        functools.partial(_flash_kernel, scale=scale, nk_tiles=nk_tiles),
        grid=(nq_tiles, nk_tiles),
        in_specs=[
            pl.BlockSpec((tq, d), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tk, d), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tk, d), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tk), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tq, d), lambda i, j: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nq_p, d), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((tq, 1), jnp.float32),
            pltpu.VMEM((tq, 1), jnp.float32),
            pltpu.VMEM((tq, d), jnp.float32),
        ],
    )(qp, kp, vp, bp)
    return out[:nq]


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def masked_attention(q, k, v, bias, scale: float):
    """softmax(q·kᵀ·scale + bias)·v → (Nq, D) float32.

    Pallas flash kernel on TPU; exact XLA expression elsewhere and for
    gradients (recomputed in the VJP).
    """
    return _dispatch(q, k, v, bias, scale)


def _dispatch(q, k, v, bias, scale):
    if q.shape[-1] % 128 != 0:
        return _attention_reference(q, k, v, bias, scale)
    # The q tile divides how many times the FULL K/V set streams from HBM
    # (ceil(nq/tq) passes) — the binding term once nk is large (77 MB of
    # K/V at the 63×300 point).  Small-query calls (the streaming ring's
    # NL2/NL4: nq=300) take one pass; big-query calls (the exact ring) use
    # tq=512 → half the K/V re-reads of the round-2 tq=256.  The cap is the
    # 16 MB scoped-VMEM ceiling and is DTYPE-AWARE: double-buffered
    # q/k/v/out blocks at d=1024 cost ~12 MB in bf16 at tq=512 but ~18.5 MB
    # in f32 (each observed as a compile-time scoped-vmem OOM one notch up:
    # bf16 tq=1024 round 3, f32 tq=512 at the 63×300 point round 4), so f32
    # inputs cap at tq=256 (~13 MB).
    cap = 512 if max(q.dtype.itemsize, k.dtype.itemsize) <= 2 else 256
    tq = min(cap, max(256, _round_up(q.shape[0], 256)))
    # platform-dependent lowering: the Pallas kernel on TPU, the XLA
    # expression on CPU (e.g. host-side init / tests)
    return jax.lax.platform_dependent(
        q, k, v, bias,
        cpu=functools.partial(_attention_reference, scale=scale),
        default=functools.partial(_flash_attention, scale=scale, tq=tq))


def _fwd(q, k, v, bias, scale):
    return _dispatch(q, k, v, bias, scale), (q, k, v, bias)


def _bwd(scale, res, g):
    q, k, v, bias = res
    qf = q.astype(jnp.float32)
    kf = k.astype(jnp.float32)
    vf = v.astype(jnp.float32)
    aff = qf @ kf.T * scale + bias[None, :]
    w = jax.nn.softmax(aff, axis=-1)
    g = g.astype(jnp.float32)
    dv = w.T @ g
    dw = g @ vf.T
    tmp = (dw * w).sum(axis=-1, keepdims=True)
    ds = w * (dw - tmp) * scale
    dq = (ds @ kf).astype(q.dtype)
    dk = (ds.T @ qf).astype(k.dtype)
    dbias = ds.sum(axis=0)
    return dq, dk, dv.astype(v.dtype), dbias


masked_attention.defvjp(_fwd, _bwd)


def masked_attention_kv_sharded(q, k, v, bias, scale: float, mesh,
                                axis: str = "data"):
    """Sequence-parallel masked attention: K/V (and bias) sharded over a mesh
    axis, Q replicated — the scaling path for temporal windows too large for
    one chip's HBM/FLOPs (SURVEY §5: "shard the key/value axis over ICI with
    shard_map + psum-normalized softmax").

    Exact w.r.t. the single-device softmax: each shard computes its local
    logits, the row max is pmax'd for stability, and the exp-weighted value
    sums and normalizers are psum'd — one pmax + two psums over ICI per
    block, all O(Nq·D), never the (Nq, Nk) affinity.

    Args:
        q: (Nq, D) replicated queries.
        k, v: (Nk, D) with Nk divisible by the axis size; sharded on axis 0.
        bias: (Nk,) additive key bias (−1e30 for padded slots).
        mesh: jax.sharding.Mesh containing ``axis``.
    Returns:
        (Nq, D) float32, fully replicated.
    """
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    def local(q, k, v, bias):
        aff = jnp.dot(q, k.T, preferred_element_type=jnp.float32) * scale
        aff = aff + bias[None, :]
        m = jax.lax.pmax(aff.max(axis=1, keepdims=True), axis)
        p = jnp.exp(aff - m)
        num = jax.lax.psum(
            jnp.dot(p.astype(v.dtype), v,
                    preferred_element_type=jnp.float32), axis)
        den = jax.lax.psum(p.sum(axis=1, keepdims=True), axis)
        return (num / den).astype(jnp.float32)

    return shard_map(local, mesh=mesh,
                     in_specs=(P(), P(axis), P(axis), P(axis)),
                     out_specs=P(),
                     check_vma=False)(q, k, v, bias)
