"""Device environment printout (counterpart of
`/root/reference/tools/gpu_device_test.py`): list accelerators, run a tiny
matmul on each, report memory stats where available."""
from __future__ import annotations

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    print(f"jax {jax.__version__}, backend {jax.default_backend()}")
    for d in jax.devices():
        x = jax.device_put(jnp.ones((256, 256)), d)
        y = (x @ x).block_until_ready()
        stats = {}
        try:
            stats = d.memory_stats() or {}
        except Exception:
            pass
        used = stats.get("bytes_in_use")
        lim = stats.get("bytes_limit")
        mem = (f", mem {used / 1e9:.2f}/{lim / 1e9:.2f} GB"
               if used is not None and lim else "")
        print(f"  {d}: matmul checksum {float(y.sum()):.1f}{mem}")


if __name__ == "__main__":
    main()
