"""Model structure printer (counterpart of `/root/reference/tools/dive_into_arch.py`)."""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    from hvrnet_tpu.models.builder import build_detector
    from hvrnet_tpu.utils.config import Config

    p = argparse.ArgumentParser()
    p.add_argument("config")
    args = p.parse_args()
    cfg = Config.fromfile(args.config)
    engine = build_detector(cfg.model, None, cfg.test_cfg)
    params = engine.init_params(jax.random.PRNGKey(0))
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    total = 0
    for path, leaf in flat:
        name = "/".join(str(getattr(k, "key", k)) for k in path)
        print(f"{name:80s} {str(leaf.shape):>20s} {leaf.size:>12,d}")
        total += leaf.size
    print(f"\ntotal parameters: {total:,d} ({total / 1e6:.2f} M)")


if __name__ == "__main__":
    main()
