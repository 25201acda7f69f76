"""Environment report (counterpart of `/root/reference/tools/collect_env.py` +
`mmdet/ops/utils/src/compiling_info.cpp` — here the interesting facts are the
JAX/XLA stack and the TPU topology)."""
from __future__ import annotations

import platform
import sys


def collect_env():
    info = {
        "python": sys.version.replace("\n", " "),
        "platform": platform.platform(),
    }
    try:
        import jax
        info["jax"] = jax.__version__
        info["jaxlib"] = getattr(__import__("jaxlib"), "__version__", "?")
        try:
            devs = jax.devices()
            info["devices"] = ", ".join(str(d) for d in devs)
            info["default_backend"] = jax.default_backend()
        except Exception as e:  # no accelerator attached
            info["devices"] = f"unavailable ({e})"
    except ImportError:
        info["jax"] = "not installed"
    for mod in ("flax", "optax", "numpy", "cv2"):
        try:
            m = __import__(mod)
            info[mod] = getattr(m, "__version__", "?")
        except ImportError:
            info[mod] = "not installed"
    try:
        import hvrnet_tpu
        info["hvrnet_tpu"] = hvrnet_tpu.__version__
    except ImportError:
        pass
    return info


if __name__ == "__main__":
    for k, v in collect_env().items():
        print(f"{k}: {v}")
