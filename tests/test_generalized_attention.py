"""GeneralizedAttention vs a loop-based numpy oracle of the reference math
(`/root/reference/mmdet/models/plugins/generalized_attention.py:152-372`):
four energy items selected by attention_type, sinusoid relative-position
embeddings, spatial-range constraint, saliency fast path, gamma-gated
residual.  The oracle computes per-(query,key) energies with explicit loops —
independent of the implementation's einsum formulation."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from hvrnet_tpu.models.plugins import GeneralizedAttention

B, H, W = 1, 4, 5
C = 24          # in_dim; qk_dim = v_dim = C // heads
HEADS = 3


def np_pos_embedding(length_q, length_kv, q_stride, kv_stride, magnitude,
                     feat_dim, wave_length=1000.0):
    """get_position_embedding (ref:152-194)."""
    q_idx = np.arange(length_q) * q_stride
    kv_idx = np.arange(length_kv) * kv_stride
    diff = (q_idx[:, None] - kv_idx[None, :]).astype(np.float64) * magnitude
    feat_range = np.arange(feat_dim // 4)
    dim_mat = wave_length ** ((4.0 / feat_dim) * feat_range)
    phase = diff[:, :, None] / dim_mat[None, None, :]
    return np.concatenate([np.sin(phase), np.cos(phase)], axis=2)


def oracle(x, p, attention_type, heads, kv_stride=2, q_stride=1,
           spatial_range=-1, magnitude=1):
    """x: (B, H, W, C) NHWC.  p: numpy param dict from the flax module."""
    at = [c == "1" for c in attention_type]
    Bn, Hq, Wq, Cin = x.shape
    qk = Cin // heads
    vd = Cin // heads
    x_q = x[:, ::q_stride, ::q_stride, :]
    x_kv = x[:, ::kv_stride, ::kv_stride, :]
    h, w = x_q.shape[1:3]
    h_kv, w_kv = x_kv.shape[1:3]

    def conv1x1(name, inp):
        Wk = p[name]["kernel"][0, 0]                    # (Cin, Cout)
        out = inp @ Wk
        if "bias" in p[name]:
            out = out + p[name]["bias"]
        return out

    q = conv1x1("query_conv", x_q).reshape(Bn, h, w, heads, qk) \
        if (at[0] or at[1]) else None
    k = conv1x1("key_conv", x_kv).reshape(Bn, h_kv, w_kv, heads, qk) \
        if (at[0] or at[2]) else None
    v = conv1x1("value_conv", x_kv).reshape(Bn, h_kv, w_kv, heads, vd)
    appr_bias = p["appr_bias"].reshape(heads, qk) if at[2] else None
    geom_bias = p["geom_bias"].reshape(heads, qk) if at[3] else None
    if at[1] or at[3]:
        emb_x = np_pos_embedding(w, w_kv, q_stride, kv_stride, magnitude, Cin)
        emb_y = np_pos_embedding(h, h_kv, q_stride, kv_stride, magnitude, Cin)
        pos_x = (emb_x @ p["appr_geom_fc_x"]["kernel"]
                 ).reshape(w, w_kv, heads, qk) / np.sqrt(2)
        pos_y = (emb_y @ p["appr_geom_fc_y"]["kernel"]
                 ).reshape(h, h_kv, heads, qk) / np.sqrt(2)

    if sum(at) == 1 and at[2]:
        # saliency fast path (ref:241-249); spatial_range still masks with
        # query position (0,0)'s window (ref:349-356)
        energy = np.zeros((Bn, heads, 1, h_kv * w_kv))
        for b in range(Bn):
            for hd in range(heads):
                idx = 0
                for ky in range(h_kv):
                    for kx in range(w_kv):
                        e = appr_bias[hd] @ k[b, ky, kx, hd]
                        if spatial_range >= 0:
                            ky_hi = (0 + spatial_range + 1) // kv_stride
                            kx_hi = (0 + spatial_range + 1) // kv_stride
                            if not (ky <= ky_hi and kx <= kx_hi):
                                e = -np.inf
                        energy[b, hd, 0, idx] = e
                        idx += 1
        attn = np.exp(energy - energy.max(-1, keepdims=True))
        attn /= attn.sum(-1, keepdims=True)
        out = np.zeros((Bn, 1, 1, heads * vd))
        for b in range(Bn):
            for hd in range(heads):
                acc = np.zeros(vd)
                idx = 0
                for ky in range(h_kv):
                    for kx in range(w_kv):
                        acc += attn[b, hd, 0, idx] * v[b, ky, kx, hd]
                        idx += 1
                out[b, 0, 0, hd * vd:(hd + 1) * vd] = acc
        proj = conv1x1("proj_conv", out)
        return p["gamma"] * proj + x

    energy = np.zeros((Bn, heads, h, w, h_kv, w_kv))
    for b in range(Bn):
        for hd in range(heads):
            for y in range(h):
                for xq in range(w):
                    for ky in range(h_kv):
                        for kx in range(w_kv):
                            e = 0.0
                            if at[0] and at[2]:
                                e += (q[b, y, xq, hd] + appr_bias[hd]) @ k[b, ky, kx, hd]
                            elif at[0]:
                                e += q[b, y, xq, hd] @ k[b, ky, kx, hd]
                            elif at[2]:
                                e += appr_bias[hd] @ k[b, ky, kx, hd]
                            if at[1] and at[3]:
                                qg = q[b, y, xq, hd] + geom_bias[hd]
                                e += qg @ pos_x[xq, kx, hd]
                                e += qg @ pos_y[y, ky, hd]
                            elif at[1]:
                                e += q[b, y, xq, hd] @ pos_x[xq, kx, hd]
                                e += q[b, y, xq, hd] @ pos_y[y, ky, hd]
                            elif at[3]:
                                e += geom_bias[hd] @ pos_x[xq, kx, hd]
                                e += geom_bias[hd] @ pos_y[y, ky, hd]
                            if spatial_range >= 0:
                                # allowed kv window per query (ref:121-132)
                                ky_lo = max((y - spatial_range) // kv_stride, 0)
                                ky_hi = (y + spatial_range + 1) // kv_stride
                                kx_lo = max((xq - spatial_range) // kv_stride, 0)
                                kx_hi = (xq + spatial_range + 1) // kv_stride
                                if not (ky_lo <= ky <= ky_hi and
                                        kx_lo <= kx <= kx_hi):
                                    e = -np.inf
                            energy[b, hd, y, xq, ky, kx] = e
    energy = energy.reshape(Bn, heads, h * w, h_kv * w_kv)
    attn = np.exp(energy - energy.max(-1, keepdims=True))
    attn /= attn.sum(-1, keepdims=True)
    out = np.zeros((Bn, h, w, heads * vd))
    vf = v.reshape(Bn, h_kv * w_kv, heads, vd)
    for b in range(Bn):
        for hd in range(heads):
            for y in range(h):
                for xq in range(w):
                    acc = attn[b, hd, y * w + xq] @ vf[b, :, hd]
                    out[b, y, xq, hd * vd:(hd + 1) * vd] = acc
    proj = conv1x1("proj_conv", out)
    return p["gamma"] * proj + x


def _run(attention_type, spatial_range=-1, kv_stride=2, q_stride=1):
    rng = np.random.default_rng(hash(attention_type) % 2**31)
    x = rng.normal(size=(B, H, W, C)).astype(np.float32)
    mod = GeneralizedAttention(in_channels=C, num_heads=HEADS,
                               attention_type=attention_type,
                               spatial_range=spatial_range,
                               kv_stride=kv_stride, q_stride=q_stride)
    params = mod.init(jax.random.PRNGKey(0), jnp.asarray(x))
    # gamma initialises to 0 (residual-only); set it nonzero so the
    # attention branch actually contributes to the comparison
    params = jax.tree_util.tree_map(lambda a: a, params)
    p_flat = params["params"]
    p_flat = dict(p_flat)
    p_flat["gamma"] = jnp.asarray([0.7], jnp.float32)
    params = {"params": p_flat}
    got = np.asarray(mod.apply(params, jnp.asarray(x)))
    p_np = jax.tree_util.tree_map(lambda a: np.asarray(a, np.float64),
                                  dict(p_flat))
    want = oracle(x.astype(np.float64), p_np, attention_type, HEADS,
                  kv_stride=kv_stride, q_stride=q_stride,
                  spatial_range=spatial_range)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("attention_type",
                         ["1111", "1000", "0100", "0001", "1010", "0110"])
def test_energy_terms_match_oracle(attention_type):
    _run(attention_type)


def test_saliency_fast_path_matches_oracle():
    _run("0010")


def test_spatial_range_constraint_matches_oracle():
    _run("1000", spatial_range=2, kv_stride=2)
    _run("1111", spatial_range=1, kv_stride=1)
    _run("0010", spatial_range=2, kv_stride=2)   # fast path + constraint


def test_gamma_zero_is_identity():
    rng = np.random.default_rng(3)
    x = rng.normal(size=(B, H, W, C)).astype(np.float32)
    mod = GeneralizedAttention(in_channels=C, num_heads=HEADS)
    params = mod.init(jax.random.PRNGKey(1), jnp.asarray(x))
    out = np.asarray(mod.apply(params, jnp.asarray(x)))
    np.testing.assert_allclose(out, x, rtol=1e-6, atol=1e-6)
