"""FrozenBN statistic calibration (engine/calibrate.py): from random init
the frozen (0, 1) stats compound activation scale through the caffe-style
bottlenecks; calibration must bring every BN output (and hence c5) back to
O(1), touch ONLY the running statistics, and converge."""
import numpy as np

from tests.conftest import *  # noqa: F401,F403  (platform forcing)


def _flat_items(tree, prefix=""):
    for k, v in tree.items():
        p = f"{prefix}/{k}"
        if isinstance(v, dict):
            yield from _flat_items(v, p)
        else:
            yield p, v


def test_calibration_standardizes_and_touches_only_stats():
    import jax
    import jax.numpy as jnp
    from hvrnet_tpu.engine import SelsaRCNN
    from hvrnet_tpu.engine.calibrate import calibrate_frozen_bn
    from __graft_entry__ import _test_cfg, _tiny_model_cfg

    engine = SelsaRCNN(_tiny_model_cfg(depth=50), None, _test_cfg(),
                       dtype=jnp.float32)
    params0 = engine.init_params(jax.random.PRNGKey(0))

    rng = np.random.default_rng(0)
    imgs = [rng.normal(scale=30.0, size=(1, 96, 128, 3)).astype(np.float32)
            for _ in range(3)]

    mod = engine.module

    def c5_std(p):
        c4 = mod.apply(p, jnp.asarray(imgs[0]), method=mod.extract_feat)
        c5 = mod.apply(p, c4, method=mod.shared)
        return float(jnp.std(c5.astype(jnp.float32)))

    before = c5_std(params0)
    # depth-50 from random init with (0,1) frozen stats: scale compounds
    assert before > 100.0, before

    # host snapshot BEFORE calibration (caller tree is never mutated, but
    # keep the comparison independent of that)
    init_host = jax.device_get(params0)
    params, history = calibrate_frozen_bn(engine, params0, imgs)
    after = c5_std(params)
    assert 0.05 < after < 20.0, (before, after)
    assert history[0]["n_bn"] > 50, history     # every R50 BN + the stem

    # stats-only: every non-(mean|var) leaf is bit-identical to the init
    a = dict(_flat_items(init_host))
    b = dict(_flat_items(jax.device_get(params)))
    assert a.keys() == b.keys()
    changed = [k for k in a if not np.array_equal(a[k], b[k])]
    assert changed, "calibration changed nothing"
    for k in changed:
        assert k.endswith("/mean") or k.endswith("/var"), k
        assert "/backbone/" in k or "/shared_head/" in k, k
