"""Numerical parity: SELSA and HRNMP heads vs independent numpy oracles of
the reference equations (selsa_bbox_head.py:108-261, hrnmp_bbox_head.py:
800-909), sharing the same weights.  This is the layer-level half of the
parity harness (SURVEY §7.8); the oracle follows the torch code's math, not
its implementation."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from hvrnet_tpu.models import HRNMPBBoxHead, SelsaBBoxHead

D = 64          # fc_feat_dim (shrunk; equations are dimension-agnostic)
C = 8           # roi channels
NCLS = 7


def np_linear(p, x):
    return x @ p["kernel"] + p["bias"]


def np_nl_block(p, q_feat, kv_feat, dim):
    """forward_single_selsa math: q/k linear → scaled softmax → @V → out."""
    q = np_linear(p["q_data_fc"], q_feat)
    k = np_linear(p["k_data_fc"], kv_feat)
    aff = q @ k.T / np.sqrt(dim)
    aff = aff - aff.max(axis=1, keepdims=True)
    w = np.exp(aff)
    w /= w.sum(axis=1, keepdims=True)
    out = w @ kv_feat
    return np_linear(p["linear_out"], out)


def relu(x):
    return np.maximum(x, 0)


def to_np(tree):
    return jax.tree_util.tree_map(lambda x: np.asarray(x, np.float64), tree)


def test_selsa_head_matches_reference_equations():
    rng = np.random.default_rng(0)
    T, P = 3, 6
    N = T * P
    head = SelsaBBoxHead(sampler_num=P, t_dim=T, fc_feat_dim=D,
                         dim=(D, D, D), in_channels=C, num_classes=NCLS,
                         reg_class_agnostic=True)
    feats = jnp.asarray(rng.normal(size=(N, 7, 7, C)).astype(np.float32))
    params = head.init(jax.random.PRNGKey(0), feats, 0, P)
    key_dim = 1
    cls, reg = head.apply(params, feats, key_dim * P, P)

    p = to_np(params["params"])
    x = np.asarray(feats, np.float64).reshape(N, -1)   # HWC flatten order
    fc1 = np_linear(p["fc_new_1"], x)
    nongt = P * T
    att1 = np_nl_block(p["selsa_1"], fc1, fc1[:nongt], D)
    fc_all_1 = relu(fc1 + att1)
    fc2 = np_linear(p["fc_new_2"], fc_all_1)
    att2 = np_nl_block(p["selsa_2"], fc2, fc2[:nongt], D)
    fc_all_2 = relu(fc2 + att2)[key_dim * P:(key_dim + 1) * P]
    ref_cls = np_linear(p["fc_cls"], fc_all_2)
    ref_reg = np_linear(p["fc_reg"], fc_all_2)

    np.testing.assert_allclose(np.asarray(cls), ref_cls, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(reg), ref_reg, rtol=1e-4, atol=1e-4)


def test_hrnmp_test_forward_matches_reference_equations():
    rng = np.random.default_rng(1)
    T, P = 3, 5
    N = T * P
    head = HRNMPBBoxHead(sampler_num=P, t_dim=T, imgs_per_video=3,
                         fc_feat_dim=D, dim=(D, D, D), in_channels=C,
                         num_classes=NCLS, reg_class_agnostic=True)
    feats = jnp.asarray(rng.normal(size=(N, 7, 7, C)).astype(np.float32))
    params = head.init(jax.random.PRNGKey(0), feats, 0, P)
    key_dim = 1
    s, l = key_dim * P, P
    (cls_b, cls_f), (reg_b, reg_f) = head.apply(params, feats, s, l)

    p = to_np(params["params"])
    x = np.asarray(feats, np.float64).reshape(N, -1)
    nongt = P * T
    # reference forward_test (hrnmp_bbox_head.py:800-909)
    fc1 = np_linear(p["fc_new_1"], x)
    att1 = np_nl_block(p["selsa_1"], fc1, fc1[:nongt], D)
    fc_all_1 = relu(fc1 + att1)
    fc2 = np_linear(p["fc_new_2"], fc_all_1)
    att2 = np_nl_block(p["selsa_2"], fc2, fc2[:nongt], D)   # all rows
    fc_all_2 = relu(fc2 + att2)
    branch_in = fc_all_2[s:s + l]
    ref_cls_b = np_linear(p["fc_cls"], branch_in)
    ref_reg_b = np_linear(p["fc_reg"], branch_in)
    # NL3 splice: fc1 outside cur, NL2-relu inside (ref:865-868)
    fc3_in = np.concatenate([fc1[:s], branch_in * 0 + fc_all_2[s:s + l],
                             fc1[s + l:]], axis=0)
    fc3 = np_linear(p["fc_new_3"], fc3_in)
    att3 = np_nl_block(p["selsa_3"], fc3, fc3[:nongt], D)
    fc_all_3 = relu(fc3 + att3)
    fc4 = np_linear(p["fc_new_4"], fc_all_3)
    att4 = np_nl_block(p["selsa_4"], fc4[s:s + l], fc4[:nongt], D)
    fc_all_4 = relu(fc4[s:s + l] + att4)
    ref_cls_f = np_linear(p["fc_cls_2"], fc_all_4)
    ref_reg_f = np_linear(p["fc_reg_2"], fc_all_4)

    np.testing.assert_allclose(np.asarray(cls_b), ref_cls_b, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(reg_b), ref_reg_b, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(cls_f), ref_cls_f, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(reg_f), ref_reg_f, rtol=1e-4, atol=1e-4)


def test_hrnmp_multi_pass_matches_reference_equations():
    """forward_test_multi_passes (hrnmp_bbox_head.py:911-967): NL1/NL2 per
    pass segment, concat, NL3 with key-row queries, final fcs only."""
    rng = np.random.default_rng(7)
    T, P, passes = 6, 4, 2
    N = T * P
    head = HRNMPBBoxHead(sampler_num=P, t_dim=T, imgs_per_video=3,
                         fc_feat_dim=D, dim=(D, D, D), in_channels=C,
                         num_classes=NCLS, reg_class_agnostic=True)
    feats = jnp.asarray(rng.normal(size=(N, 7, 7, C)).astype(np.float32))
    params = head.init(jax.random.PRNGKey(0), feats, 0, P)
    key_dim = 1
    s, l = key_dim * P, P
    pass_len = N // passes
    (cls_list, reg_list) = head.apply(params, feats, pass_len, s, l,
                                      method=head.forward_test_multi_passes)
    assert len(cls_list) == 1 and len(reg_list) == 1

    p = to_np(params["params"])
    x = np.asarray(feats, np.float64).reshape(N, -1)
    nongt = min(P * T, pass_len)
    segs = []
    for i in range(passes):
        seg = x[i * pass_len:(i + 1) * pass_len]
        fc1 = np_linear(p["fc_new_1"], seg)
        att1 = np_nl_block(p["selsa_1"], fc1, fc1[:nongt], D)
        fc_all_1 = relu(fc1 + att1)
        fc2 = np_linear(p["fc_new_2"], fc_all_1)
        att2 = np_nl_block(p["selsa_2"], fc2, fc2[:nongt], D)
        segs.append(relu(fc2 + att2))
    video_feats = np.concatenate(segs, axis=0)
    fc3 = np_linear(p["fc_new_3"], video_feats)
    att3 = np_nl_block(p["selsa_3"], fc3[s:s + l], fc3[:P * T], D)
    fc_all_3 = relu(fc3[s:s + l] + att3)
    ref_cls = np_linear(p["fc_cls_2"], fc_all_3)
    ref_reg = np_linear(p["fc_reg_2"], fc_all_3)

    np.testing.assert_allclose(np.asarray(cls_list[0]), ref_cls,
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(reg_list[0]), ref_reg,
                               rtol=1e-4, atol=1e-4)


def test_selsa_query_restriction_is_exact():
    """Block-2 computing only key-frame queries must equal computing all
    rows then slicing (the reference's order, selsa_bbox_head.py:238-254)."""
    rng = np.random.default_rng(2)
    T, P = 3, 4
    head = SelsaBBoxHead(sampler_num=P, t_dim=T, fc_feat_dim=D, dim=(D, D, D),
                         in_channels=C, num_classes=NCLS,
                         reg_class_agnostic=True)
    feats = jnp.asarray(rng.normal(size=(T * P, 7, 7, C)).astype(np.float32))
    params = head.init(jax.random.PRNGKey(3), feats, 0, P)
    cls_cur, reg_cur = head.apply(params, feats, P, P)
    cls_all, reg_all = head.apply(params, feats, 0, T * P, output_all=True)
    np.testing.assert_allclose(np.asarray(cls_cur),
                               np.asarray(cls_all)[P:2 * P],
                               rtol=1e-5, atol=1e-5)
