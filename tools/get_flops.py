"""FLOPs/params report (counterpart of `/root/reference/tools/get_flops.py` +
`mmdet/utils/flops_counter.py`).  Uses XLA's own cost analysis of the jitted
forward program instead of per-module hooks — the number reflects what
actually runs on the chip after fusion."""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np
    from hvrnet_tpu.models.builder import build_detector
    from hvrnet_tpu.utils.config import Config

    p = argparse.ArgumentParser(description="FLOPs via XLA cost analysis")
    p.add_argument("config")
    p.add_argument("--shape", type=int, nargs=2, default=[608, 1008])
    args = p.parse_args()

    cfg = Config.fromfile(args.config)
    engine = build_detector(cfg.model, None, cfg.test_cfg)
    params = engine.init_params(jax.random.PRNGKey(0))
    n_params = sum(x.size for x in jax.tree_util.tree_leaves(params))

    h, w = args.shape
    mod = engine.module
    img = jnp.zeros((1, h, w, 3), jnp.float32)

    def backbone_fwd(params, img):
        c4 = mod.apply(params, img, method=mod.extract_feat)
        c5 = mod.apply(params, c4, method=mod.shared)
        rpn = mod.apply(params, c4, method=mod.rpn)
        return c5, rpn

    lowered = jax.jit(backbone_fwd).lower(params, img)
    cost = lowered.compile().cost_analysis()
    flops = cost.get("flops", float("nan")) if cost else float("nan")
    print(f"input shape: (1, {h}, {w}, 3)")
    print(f"params: {n_params / 1e6:.2f} M")
    print(f"backbone+shared+rpn flops: {flops / 1e9:.2f} GFLOPs")


if __name__ == "__main__":
    main()
