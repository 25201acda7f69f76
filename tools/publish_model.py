"""Strip optimizer state + hash-suffix a checkpoint (counterpart of
`/root/reference/tools/publish_model.py`)."""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    from hvrnet_tpu.utils.checkpoint import publish_model

    p = argparse.ArgumentParser()
    p.add_argument("in_file")
    p.add_argument("out_file")
    args = p.parse_args()
    final = publish_model(args.in_file, args.out_file)
    print(f"published → {final}")


if __name__ == "__main__":
    main()
