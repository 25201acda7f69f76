"""Weight import CLI (counterpart of `/root/reference/tools/detectron2pytorch.py`
— cross-framework weight conversion).  Converts a reference-trained mmdet
``.pth`` checkpoint into an orbax checkpoint for this framework via
`hvrnet_tpu.utils.checkpoint.convert_torch_checkpoint`."""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    from hvrnet_tpu.models.builder import build_detector
    from hvrnet_tpu.utils.checkpoint import (load_torch_checkpoint,
                                             merge_params, save_checkpoint)
    from hvrnet_tpu.utils.config import Config

    p = argparse.ArgumentParser(description="torch .pth → orbax converter")
    p.add_argument("config")
    p.add_argument("pth")
    p.add_argument("out")
    args = p.parse_args()
    cfg = Config.fromfile(args.config)
    engine = build_detector(cfg.model, None, cfg.test_cfg)
    with jax.default_device(jax.local_devices(backend="cpu")[0]):
        params = engine.init_params(jax.random.PRNGKey(0))
    loaded = load_torch_checkpoint(args.pth, verbose=True)
    merged, missing = merge_params(params["params"], loaded["params"])
    if missing:
        print(f"warning: {len(missing)} tensors missing from the checkpoint "
              f"(kept random init), e.g. {missing[:5]}")
    save_checkpoint(args.out, {"params": merged},
                    meta=dict(source=args.pth, config=args.config))
    print(f"converted → {args.out}")


if __name__ == "__main__":
    main()
