"""Optimizer builder: torch-SGD semantics + `paramwise_options` parity.

The reference's optimizer builder (`mmdet/apis/train.py:86-91,133-173`)
supports per-group multipliers bias_lr_mult / bias_decay_mult /
norm_decay_mult.  Here they become per-leaf multiplier trees; this test
checks the updates against a hand-computed torch-SGD step.
"""
import jax
import jax.numpy as jnp
import numpy as np

from hvrnet_tpu.engine.optim import (make_optimizer, paramwise_mult_trees,
                                     step_lr_schedule)


def _params():
    return {
        "conv": {"kernel": jnp.ones((2, 2)), "bias": jnp.ones((2,))},
        "bn": {"scale": jnp.ones((2,)), "bias": jnp.ones((2,))},
        "conv2_bn": {"scale": jnp.ones((2,))},
        "fc": {"kernel": jnp.ones((3,)), "bias": jnp.ones((3,))},
    }


def test_paramwise_mult_trees():
    opts = dict(bias_lr_mult=2.0, bias_decay_mult=0.0, norm_decay_mult=0.5)
    lr_t, wd_t = paramwise_mult_trees(_params(), opts)
    # norm layers (any `bn*`/`gn*`/`*_bn` module): wd mult on EVERY leaf,
    # lr untouched (reference regex `(bn|gn)\d?` on weight AND bias)
    assert lr_t["bn"]["bias"] == 1.0 and wd_t["bn"]["bias"] == 0.5
    assert wd_t["bn"]["scale"] == 0.5 and wd_t["conv2_bn"]["scale"] == 0.5
    # non-norm biases: both bias mults
    assert lr_t["conv"]["bias"] == 2.0 and wd_t["conv"]["bias"] == 0.0
    assert lr_t["fc"]["bias"] == 2.0
    # everything else: global settings
    assert lr_t["conv"]["kernel"] == 1.0 and wd_t["fc"]["kernel"] == 1.0


def test_paramwise_sgd_step_matches_hand_math():
    """One step, zero momentum state: update = -lr*lr_mult*(g + wd*wd_mult*p)
    (torch per-group lr scales the final step; decay folds into the grad)."""
    lr, wd = 0.1, 1e-2
    params = _params()
    sched = step_lr_schedule(lr, steps_per_epoch=10, milestones_epochs=[],
                             warmup_iters=0)
    opts = dict(bias_lr_mult=2.0, bias_decay_mult=0.0, norm_decay_mult=0.5)
    tx = make_optimizer(sched, momentum=0.9, weight_decay=wd,
                        clip_norm=1e9, paramwise_options=opts, params=params)
    grads = jax.tree.map(lambda p: 0.1 * jnp.ones_like(p), params)
    state = tx.init(params)
    updates, _ = tx.update(grads, state, params)

    def expect(g, p, lr_m, wd_m):
        return -lr * lr_m * (g + wd * wd_m * p)

    np.testing.assert_allclose(updates["conv"]["kernel"],
                               expect(0.1, 1.0, 1.0, 1.0), rtol=1e-6)
    np.testing.assert_allclose(updates["conv"]["bias"],
                               expect(0.1, 1.0, 2.0, 0.0), rtol=1e-6)
    np.testing.assert_allclose(updates["bn"]["scale"],
                               expect(0.1, 1.0, 1.0, 0.5), rtol=1e-6)
    np.testing.assert_allclose(updates["bn"]["bias"],
                               expect(0.1, 1.0, 1.0, 0.5), rtol=1e-6)


def test_no_paramwise_unchanged():
    """Without paramwise_options the chain is the plain torch-SGD one."""
    lr, wd = 0.1, 1e-2
    params = _params()
    sched = step_lr_schedule(lr, 10, [], warmup_iters=0)
    tx = make_optimizer(sched, momentum=0.9, weight_decay=wd, clip_norm=1e9)
    grads = jax.tree.map(lambda p: 0.1 * jnp.ones_like(p), params)
    updates, _ = tx.update(grads, tx.init(params), params)
    for leaf in jax.tree.leaves(updates):
        np.testing.assert_allclose(leaf, -lr * (0.1 + wd * 1.0), rtol=1e-6)
