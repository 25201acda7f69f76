"""Corruption-robustness benchmark (counterpart of
`/root/reference/tools/test_robustness.py`, 472 LoC).

Runs the VID test loop under image corruptions of increasing severity and
reports per-corruption mAP.  The reference uses the `imagecorruptions`
package (absent in this image); a numpy/cv2 subset of its corruption families
is implemented here — noise (gaussian/shot/impulse), blur (gaussian/motion),
weather (fog approximation: contrast+haze), digital (contrast, brightness,
jpeg, pixelate).
"""
from __future__ import annotations

import argparse
import os
import pickle
import sys

import cv2
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SEVERITY_SCALE = {1: 0.04, 2: 0.08, 3: 0.12, 4: 0.18, 5: 0.26}


def corrupt(img: np.ndarray, corruption: str, severity: int) -> np.ndarray:
    """img: uint8 BGR."""
    s = SEVERITY_SCALE[severity]
    x = img.astype(np.float32)
    rng = np.random.default_rng(severity)
    if corruption == "gaussian_noise":
        x = x + rng.normal(0, 255 * s, x.shape)
    elif corruption == "shot_noise":
        lam = max(255 * (1 - s) / 2, 1)
        x = rng.poisson(np.clip(x, 0, 255) / 255 * lam) / lam * 255
    elif corruption == "impulse_noise":
        m = rng.random(x.shape[:2]) < s
        salt = rng.random(x.shape[:2]) < 0.5
        x[m & salt] = 255
        x[m & ~salt] = 0
    elif corruption == "gaussian_blur":
        k = 2 * severity + 1
        x = cv2.GaussianBlur(x, (k, k), 0)
    elif corruption == "motion_blur":
        k = 2 * severity + 3
        kernel = np.zeros((k, k), np.float32)
        kernel[k // 2, :] = 1.0 / k
        x = cv2.filter2D(x, -1, kernel)
    elif corruption == "fog":
        x = x * (1 - s * 2) + 255 * s * 2
    elif corruption == "contrast":
        mean = x.mean(axis=(0, 1), keepdims=True)
        x = (x - mean) * (1 - 2 * s) + mean
    elif corruption == "brightness":
        x = x + 255 * s
    elif corruption == "jpeg_compression":
        q = int(max(5, 60 - 12 * severity))
        ok, enc = cv2.imencode(".jpg", img, [cv2.IMWRITE_JPEG_QUALITY, q])
        x = cv2.imdecode(enc, cv2.IMREAD_COLOR).astype(np.float32)
    elif corruption == "pixelate":
        h, w = x.shape[:2]
        f = 1 - 0.12 * severity
        small = cv2.resize(x, (max(int(w * f), 1), max(int(h * f), 1)),
                           interpolation=cv2.INTER_AREA)
        x = cv2.resize(small, (w, h), interpolation=cv2.INTER_NEAREST)
    else:
        raise ValueError(f"unknown corruption {corruption}")
    return np.clip(x, 0, 255).astype(np.uint8)


BENCHMARK_SETS = dict(
    noise=["gaussian_noise", "shot_noise", "impulse_noise"],
    blur=["gaussian_blur", "motion_blur"],
    weather=["fog", "brightness"],
    digital=["contrast", "jpeg_compression", "pixelate"],
)


def main():
    import jax.numpy as jnp
    from hvrnet_tpu.apis import load_params_for_engine
    from hvrnet_tpu.data import build_dataset
    from hvrnet_tpu.engine import SlidingWindowRunner
    from hvrnet_tpu.engine.stream import test_frame_stream
    from hvrnet_tpu.models.builder import build_detector
    from hvrnet_tpu.utils.config import Config
    from tools.vid_eval import evaluate_results

    p = argparse.ArgumentParser(description="corruption robustness benchmark")
    p.add_argument("config")
    p.add_argument("checkpoint", nargs="?", default=None)
    p.add_argument("--corruptions", nargs="+",
                   default=["gaussian_noise", "gaussian_blur", "contrast"])
    p.add_argument("--severities", type=int, nargs="+", default=[1, 3, 5])
    p.add_argument("--out-prefix", default="robustness")
    p.add_argument("--set", choices=list(BENCHMARK_SETS), default=None)
    args = p.parse_args()
    if args.set:
        args.corruptions = BENCHMARK_SETS[args.set]

    cfg = Config.fromfile(args.config)
    engine = build_detector(cfg.model, None, cfg.test_cfg)
    params = load_params_for_engine(engine, args.checkpoint)

    from hvrnet_tpu.data.pipelines import LoadImageFromFile

    for corruption in args.corruptions:
        for severity in args.severities:
            orig_call = LoadImageFromFile.__call__

            def corrupted_call(self, results, _c=corruption, _s=severity):
                out = orig_call(self, results)
                out["img"] = corrupt(out["img"].astype(np.uint8), _c, _s
                                     ).astype(out["img"].dtype)
                return out

            LoadImageFromFile.__call__ = corrupted_call
            try:
                dataset = build_dataset(dict(cfg.data.test),
                                        dict(test_mode=True, world_size=1))
                runner = SlidingWindowRunner(engine, params)
                results = runner.run(test_frame_stream(dataset, rank=0),
                                     num_frames=len(dataset))
            finally:
                LoadImageFromFile.__call__ = orig_call
            out = f"{args.out_prefix}_{corruption}_s{severity}.pkl"
            with open(out, "wb") as f:
                pickle.dump(results, f)
            print(f"== {corruption} severity {severity} ==")
            evaluate_results(out, args.config)


if __name__ == "__main__":
    main()
