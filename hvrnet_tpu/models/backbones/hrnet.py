"""HRNet backbone (reference `mmdet/models/backbones/hrnet.py`, 525 LoC).

Multi-resolution parallel branches with repeated cross-resolution fusion.
NHWC flax implementation with frozen BN, supporting the standard HRNet
w18/w32/w40 configurations via `extra` dicts like the reference.
"""
from __future__ import annotations

from typing import Any, Dict, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..layers import ConvBN
from ..registry import BACKBONES
from .resnet import BasicBlock, Bottleneck


def _upsample_to(x, h, w):
    return jax.image.resize(x, (x.shape[0], h, w, x.shape[3]), "nearest")


class HRModule(nn.Module):
    """One stage module: per-branch blocks + full cross-resolution fusion."""
    num_branches: int
    num_blocks: Sequence[int]
    num_channels: Sequence[int]
    block: str = "basic"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, xs):
        assert len(xs) == self.num_branches
        blk = BasicBlock if self.block == "basic" else Bottleneck
        expansion = 1 if self.block == "basic" else 4
        outs = []
        for b in range(self.num_branches):
            x = xs[b]
            ch = self.num_channels[b] * expansion
            for i in range(self.num_blocks[b]):
                need_ds = i == 0 and x.shape[-1] != ch
                x = blk(self.num_channels[b], 1, 1, need_ds, "pytorch",
                        self.dtype, name=f"branch{b}_block{i}")(x)
            outs.append(x)
        # fuse: every output branch sums transformed versions of all inputs
        fused = []
        for i in range(self.num_branches):
            h, w = outs[i].shape[1:3]
            ci = self.num_channels[i] * expansion
            acc = outs[i]
            for j in range(self.num_branches):
                if j == i:
                    continue
                y = outs[j]
                if j > i:     # lower res → upsample + 1×1
                    y = ConvBN(ci, (1, 1), relu=False, dtype=self.dtype,
                               name=f"fuse_{j}_to_{i}")(y)
                    y = _upsample_to(y, h, w)
                else:         # higher res → strided 3×3 chain
                    for s in range(i - j):
                        last = s == i - j - 1
                        y = ConvBN(ci if last else y.shape[-1], (3, 3), (2, 2),
                                   padding=1, relu=not last, dtype=self.dtype,
                                   name=f"fuse_{j}_to_{i}_{s}")(y)
                acc = acc + y
            fused.append(nn.relu(acc))
        return fused


@BACKBONES.register_module
class HRNet(nn.Module):
    extra: Dict[str, Any] = None
    norm_eval: bool = True
    norm_cfg: Any = None
    frozen_stages: int = -1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        extra = self.extra or dict(
            stage1=dict(num_modules=1, num_branches=1, block="BOTTLENECK",
                        num_blocks=(4,), num_channels=(64,)),
            stage2=dict(num_modules=1, num_branches=2, block="BASIC",
                        num_blocks=(4, 4), num_channels=(32, 64)),
            stage3=dict(num_modules=4, num_branches=3, block="BASIC",
                        num_blocks=(4, 4, 4), num_channels=(32, 64, 128)),
            stage4=dict(num_modules=3, num_branches=4, block="BASIC",
                        num_blocks=(4, 4, 4, 4),
                        num_channels=(32, 64, 128, 256)))
        # stem: two stride-2 3×3 convs
        x = ConvBN(64, (3, 3), (2, 2), padding=1, dtype=self.dtype,
                   name="stem1")(x)
        x = ConvBN(64, (3, 3), (2, 2), padding=1, dtype=self.dtype,
                   name="stem2")(x)
        # stage 1: bottleneck layer
        s1 = extra["stage1"]
        for i in range(s1["num_blocks"][0]):
            x = Bottleneck(s1["num_channels"][0], 1, 1, i == 0, "pytorch",
                           self.dtype, name=f"layer1_block{i}")(x)

        branches = [x]
        prev_channels = [x.shape[-1]]
        for stage_idx in (2, 3, 4):
            cfg = extra[f"stage{stage_idx}"]
            block = "basic" if cfg["block"] == "BASIC" else "bottleneck"
            exp = 1 if block == "basic" else 4
            want = [c * exp for c in cfg["num_channels"]]
            # transition: adapt/extend branch list
            new_branches = []
            for b in range(cfg["num_branches"]):
                if b < len(branches):
                    y = branches[b]
                    if y.shape[-1] != want[b]:
                        y = ConvBN(want[b], (3, 3), padding=1,
                                   dtype=self.dtype,
                                   name=f"trans{stage_idx}_{b}")(y)
                else:
                    y = ConvBN(want[b], (3, 3), (2, 2), padding=1,
                               dtype=self.dtype,
                               name=f"trans{stage_idx}_{b}")(branches[-1])
                new_branches.append(y)
            branches = new_branches
            for m in range(cfg["num_modules"]):
                branches = HRModule(cfg["num_branches"], cfg["num_blocks"],
                                    cfg["num_channels"], block, self.dtype,
                                    name=f"stage{stage_idx}_module{m}"
                                    )(branches)
        return tuple(branches)
