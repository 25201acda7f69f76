"""Training CLI (counterpart of `/root/reference/tools/train.py`).

Builds the dataset(s), detector engine and trainer from the config, sets up
the device mesh, and runs the epoch loop with checkpointing/logging.  The
reference's `--launcher`/NCCL flags are replaced by the JAX SPMD model: all
local devices form a 1-D data mesh automatically; multi-host runs call
`jax.distributed.initialize` via `--coordinator/--num-processes/--process-id`.
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def parse_args():
    p = argparse.ArgumentParser(description="Train a video detector")
    p.add_argument("config")
    p.add_argument("--work-dir", default=None)
    p.add_argument("--resume-from", default=None)
    p.add_argument("--load-from", default=None)
    p.add_argument("--seed", type=int, default=None)
    p.add_argument("--total-epochs", type=int, default=None)
    p.add_argument("--max-steps-per-epoch", type=int, default=None)
    p.add_argument("--n-devices", type=int, default=None)
    p.add_argument("--autoscale-lr", action="store_true",
                   help="scale lr linearly with device count (tools/train.py:63-65)")
    p.add_argument("--coordinator", default=None)
    p.add_argument("--num-processes", type=int, default=None)
    p.add_argument("--process-id", type=int, default=None)
    p.add_argument("--canvas", type=int, nargs=2, default=None,
                   metavar=("H", "W"),
                   help="static training canvas (default: config canvas_hw "
                        "or 608 1008, the (1000,600) keep-ratio bucket)")
    p.add_argument("--bf16", action="store_true")
    p.add_argument("--calibrate-bn", action="store_true",
                   help="set the frozen-BN running statistics from the "
                        "first training batch before optimizing "
                        "(engine/calibrate.py) — required when training "
                        "from random init instead of the reference's "
                        "pretrained load_from checkpoint")
    p.add_argument("--validate", action="store_true",
                   help="run the sliding-window VID eval after each epoch "
                        "(reference tools/train.py:22 → DistEvalmAPHook; "
                        "interval from cfg.evaluation.interval)")
    return p.parse_args()


def main():
    import jax
    import jax.numpy as jnp
    from hvrnet_tpu.apis import set_random_seed, train_detector
    from hvrnet_tpu.data import build_dataset
    from hvrnet_tpu.models.builder import build_detector
    from hvrnet_tpu.parallel.mesh import init_distributed, make_mesh
    from hvrnet_tpu.utils.config import Config

    args = parse_args()
    cfg = Config.fromfile(args.config)
    init_distributed(args.coordinator, args.num_processes, args.process_id)
    mesh = make_mesh(args.n_devices)
    n_dev = mesh.devices.size
    if args.autoscale_lr:
        cfg.optimizer["lr"] = cfg.optimizer["lr"] * n_dev / 4.0

    if args.seed is not None:
        set_random_seed(args.seed)
    work_dir = args.work_dir or cfg.get("work_dir", "work_dir")

    train_data_cfg = cfg.data.train
    dataset = build_dataset(train_data_cfg)
    engine = build_detector(cfg.model, cfg.train_cfg, None,
                            dtype=jnp.bfloat16 if args.bf16 else jnp.float32)

    canvas = tuple(args.canvas or cfg.get("canvas_hw", (608, 1008)))

    eval_hook = None
    if args.validate:
        from hvrnet_tpu.engine.eval_hook import VidEvalHook
        val_engine = build_detector(
            cfg.model, None, cfg.test_cfg,
            dtype=jnp.bfloat16 if args.bf16 else jnp.float32)
        val_data_cfg = dict(cfg.data.val)
        val_data_cfg.update(dict(cfg.test_cfg.relation_setup))
        val_data_cfg.pop("frame_stride", None)
        eval_interval = (cfg.get("evaluation", {}) or {}).get("interval", 1)
        eval_hook = VidEvalHook(
            val_engine, val_data_cfg, interval=eval_interval,
            work_dir=work_dir, world_size=args.num_processes or 1,
            rank=args.process_id or 0,
            max_short=canvas[0], max_long=canvas[1])
    train_detector(
        engine, dataset, cfg.as_dict(), mesh=mesh, work_dir=work_dir,
        total_epochs=args.total_epochs or cfg.get("total_epochs"),
        canvas_hw=canvas,
        resume_from=args.resume_from or cfg.get("resume_from"),
        load_from=args.load_from or cfg.get("load_from"),
        max_steps_per_epoch=args.max_steps_per_epoch,
        seed=args.seed or 0, eval_hook=eval_hook,
        calibrate_bn=args.calibrate_bn)


if __name__ == "__main__":
    main()
