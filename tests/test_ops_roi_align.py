"""RoIAlign vs an independent per-pixel numpy oracle of the CUDA kernel math."""
import numpy as np
import jax.numpy as jnp

from hvrnet_tpu.ops import roi_align


def bilinear_np(data, H, W, y, x):
    if y < -1.0 or y > H or x < -1.0 or x > W:
        return 0.0
    y = max(y, 0.0)
    x = max(x, 0.0)
    y_low, x_low = int(y), int(x)
    if y_low >= H - 1:
        y_high = y_low = H - 1
        y = float(y_low)
    else:
        y_high = y_low + 1
    if x_low >= W - 1:
        x_high = x_low = W - 1
        x = float(x_low)
    else:
        x_high = x_low + 1
    ly, lx = y - y_low, x - x_low
    hy, hx = 1 - ly, 1 - lx
    return (hy * hx * data[y_low, x_low] + hy * lx * data[y_low, x_high]
            + ly * hx * data[y_high, x_low] + ly * lx * data[y_high, x_high])


def roi_align_np(feats_nhwc, rois, out_size, scale, sn):
    B, H, W, C = feats_nhwc.shape
    R = rois.shape[0]
    out = np.zeros((R, out_size, out_size, C), np.float32)
    for r in range(R):
        b = int(rois[r, 0])
        x1, y1, x2, y2 = rois[r, 1:]
        sw, sh = x1 * scale, y1 * scale
        ew, eh = (x2 + 1) * scale, (y2 + 1) * scale
        rw = max(ew - sw, 0.0)
        rh = max(eh - sh, 0.0)
        bw, bh = rw / out_size, rh / out_size
        for c in range(C):
            data = feats_nhwc[b, :, :, c]
            for ph in range(out_size):
                for pw in range(out_size):
                    acc = 0.0
                    for iy in range(sn):
                        y = sh + ph * bh + (iy + 0.5) * bh / sn
                        for ix in range(sn):
                            x = sw + pw * bw + (ix + 0.5) * bw / sn
                            acc += bilinear_np(data, H, W, y, x)
                    out[r, ph, pw, c] = acc / (sn * sn)
    return out


def test_roi_align_matches_cuda_kernel_math():
    rng = np.random.default_rng(7)
    B, H, W, C = 2, 24, 32, 3
    feats = rng.normal(size=(B, H, W, C)).astype(np.float32)
    rois = np.array([
        [0, 0.0, 0.0, 111.0, 95.0],
        [0, 40.5, 30.2, 300.7, 200.1],
        [1, 100.0, 50.0, 480.0, 350.0],
        [1, 5.0, 5.0, 6.0, 6.0],          # tiny roi
        [0, 400.0, 300.0, 511.0, 383.0],  # touches the far edge
    ], np.float32)
    got = np.asarray(roi_align(jnp.asarray(feats), jnp.asarray(rois),
                               out_size=7, spatial_scale=1 / 16.0, sample_num=2))
    ref = roi_align_np(feats, rois, 7, 1 / 16.0, 2)
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)


def test_roi_align_is_differentiable():
    import jax
    rng = np.random.default_rng(8)
    feats = jnp.asarray(rng.normal(size=(1, 16, 16, 4)).astype(np.float32))
    rois = jnp.asarray([[0, 10.0, 10.0, 150.0, 150.0]], dtype=jnp.float32)

    def loss(f):
        return roi_align(f, rois, out_size=7, spatial_scale=1 / 16.0).sum()

    g = jax.grad(loss)(feats)
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.abs(g).sum()) > 0


def test_roi_align_custom_vjp_matches_autodiff():
    """The separable-matmul backward must equal plain autodiff of the gather form."""
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(9)
    feats = jnp.asarray(rng.normal(size=(2, 12, 16, 5)).astype(np.float32))
    rois = jnp.asarray([[0, 10.0, 10.0, 150.0, 120.0],
                        [1, 40.0, 16.0, 200.0, 90.0]])
    g = jnp.asarray(rng.normal(size=(2, 7, 7, 5)).astype(np.float32))

    def forward_plain(f):
        """Same sampling math in plain gather form — XLA autodiff reference."""
        B, H, W, C = f.shape
        s, sn, scale = 7, 2, 1 / 16.0
        bi = rois[:, 0].astype(jnp.int32)
        y0 = rois[:, 2] * scale
        x0 = rois[:, 1] * scale
        bh = jnp.maximum((rois[:, 4] + 1.0) * scale - y0, 0.0) / s
        bw = jnp.maximum((rois[:, 3] + 1.0) * scale - x0, 0.0) / s
        off = (jnp.arange(s, dtype=jnp.float32)[:, None]
               + (jnp.arange(sn, dtype=jnp.float32)[None, :] + 0.5) / sn
               ).reshape(-1)
        ys = y0[:, None] + off[None, :] * bh[:, None]
        xs = x0[:, None] + off[None, :] * bw[:, None]

        def axis(v, dim):
            inside = (v >= -1.0) & (v <= dim)
            v = jnp.maximum(v, 0.0)
            lo = v.astype(jnp.int32)
            edge = lo >= dim - 1
            lo = jnp.where(edge, dim - 1, lo)
            hi = jnp.where(edge, dim - 1, lo + 1)
            fr = jnp.where(edge, 0.0, v - lo.astype(jnp.float32))
            return lo, hi, fr, inside

        y_lo, y_hi, ly, y_in = axis(ys, H)
        x_lo, x_hi, lx, x_in = axis(xs, W)
        hy, hx = 1.0 - ly, 1.0 - lx
        flat = f.reshape(-1, C)
        base = (bi * (H * W))[:, None, None]

        def tap(yi, xi, wy, wx):
            idx = base + yi[:, :, None] * W + xi[:, None, :]
            v = flat[idx.reshape(-1)].reshape(idx.shape + (C,))
            return (wy[:, :, None] * wx[:, None, :])[..., None] * v

        val = (tap(y_lo, x_lo, hy, hx) + tap(y_lo, x_hi, hy, lx)
               + tap(y_hi, x_lo, ly, hx) + tap(y_hi, x_hi, ly, lx))
        mask = (y_in[:, :, None] & x_in[:, None, :]).astype(jnp.float32)
        val = val * mask[..., None]
        return val.reshape(2, 7, 2, 7, 2, -1).mean(axis=(2, 4))

    def loss_custom(f):
        return (roi_align(f, rois, 7, 1 / 16.0, 2) * g).sum()

    def loss_plain(f):
        return (forward_plain(f) * g).sum()

    g1 = jax.grad(loss_custom)(feats)
    g2 = jax.grad(loss_plain)(feats)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                               rtol=1e-4, atol=1e-5)


def test_separable_matmul_path_matches_oracle_and_gather():
    """B==1 dispatches the separable Wy·C5·Wxᵀ formulation (MXU matmuls);
    it must match both the numpy kernel-math oracle and the gather path
    (exercised by duplicating the map to B=2)."""
    rng = np.random.default_rng(11)
    H, W, C = 20, 28, 6
    feats1 = rng.normal(size=(1, H, W, C)).astype(np.float32)
    rois = np.array([
        [0, 0.0, 0.0, 150.0, 120.0],
        [0, 33.3, 21.7, 410.9, 280.4],
        [0, 3.0, 3.0, 4.5, 4.5],
        [0, 430.0, 300.0, 447.0, 319.0],   # touches the far edge
        [0, -10.0, -8.0, 60.0, 40.0],      # partially outside
    ], np.float32)
    got = np.asarray(roi_align(jnp.asarray(feats1), jnp.asarray(rois),
                               out_size=7, spatial_scale=1 / 16.0,
                               sample_num=2))
    ref = roi_align_np(feats1, rois, 7, 1 / 16.0, 2)
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)

    # gather path (B=2: second map is a decoy) must agree bitwise-closely
    feats2 = np.concatenate([feats1, rng.normal(size=(1, H, W, C))
                             .astype(np.float32)])
    got2 = np.asarray(roi_align(jnp.asarray(feats2), jnp.asarray(rois),
                                out_size=7, spatial_scale=1 / 16.0,
                                sample_num=2))
    np.testing.assert_allclose(got, got2, rtol=1e-6, atol=1e-6)
