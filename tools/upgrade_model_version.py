"""Checkpoint version migration (counterpart of
`/root/reference/tools/upgrade_model_version.py`): renames legacy parameter
paths between hvrnet_tpu versions (currently an identity pass that validates
the tree and restamps meta)."""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import hvrnet_tpu
    from hvrnet_tpu.utils.checkpoint import load_checkpoint, save_checkpoint

    p = argparse.ArgumentParser()
    p.add_argument("in_file")
    p.add_argument("out_file")
    args = p.parse_args()
    state, meta = load_checkpoint(args.in_file)
    meta = dict(meta or {})
    meta["hvrnet_tpu_version"] = hvrnet_tpu.__version__
    save_checkpoint(args.out_file, state, meta)
    print(f"upgraded → {args.out_file} (version {hvrnet_tpu.__version__})")


if __name__ == "__main__":
    main()
