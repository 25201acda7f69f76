"""Feature Pyramid Network neck (reference `mmdet/models/necks/fpn.py`).

NHWC flax implementation: lateral 1×1 convs, nearest-neighbour top-down
upsampling, 3×3 output convs, optional extra levels (stride-2 convs or
max-pool).
"""
from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..layers import Conv
from ..registry import NECKS


def _upsample_nearest_2x(x):
    b, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (b, h, 2, w, 2, c))
    return x.reshape(b, h * 2, w * 2, c)


@NECKS.register_module
class FPN(nn.Module):
    in_channels: Sequence[int] = (256, 512, 1024, 2048)
    out_channels: int = 256
    num_outs: int = 5
    start_level: int = 0
    end_level: int = -1
    add_extra_convs: bool = False
    extra_convs_on_inputs: bool = True
    relu_before_extra_convs: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, inputs):
        assert len(inputs) == len(self.in_channels)
        end = (len(inputs) if self.end_level == -1 else self.end_level + 1)
        used = list(inputs[self.start_level:end])

        laterals = [
            Conv(self.out_channels, (1, 1), dtype=self.dtype,
                 name=f"lateral_conv{i}")(x)
            for i, x in enumerate(used)
        ]
        for i in range(len(laterals) - 1, 0, -1):
            laterals[i - 1] = laterals[i - 1] + _upsample_nearest_2x(laterals[i])

        outs = [
            Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype,
                 name=f"fpn_conv{i}")(laterals[i])
            for i in range(len(laterals))
        ]
        if self.num_outs > len(outs):
            if not self.add_extra_convs:
                for _ in range(self.num_outs - len(outs)):
                    outs.append(nn.max_pool(outs[-1], (1, 1), strides=(2, 2)))
            else:
                src = used[-1] if self.extra_convs_on_inputs else outs[-1]
                extra = Conv(self.out_channels, (3, 3), (2, 2), padding=1,
                             dtype=self.dtype, name="extra_conv0")(src)
                outs.append(extra)
                for i in range(1, self.num_outs - len(laterals)):
                    x = nn.relu(outs[-1]) if self.relu_before_extra_convs else outs[-1]
                    outs.append(Conv(self.out_channels, (3, 3), (2, 2),
                                     padding=1, dtype=self.dtype,
                                     name=f"extra_conv{i}")(x))
        return tuple(outs)


@NECKS.register_module
class BFP(nn.Module):
    """Balanced Feature Pyramid (reference necks/bfp.py) — gather/refine/
    scatter over FPN levels (non-local refine omitted: refine_type=None)."""
    in_channels: int = 256
    num_levels: int = 5
    refine_level: int = 2
    refine_type: Any = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, inputs):
        assert len(inputs) == self.num_levels
        ref_h, ref_w = inputs[self.refine_level].shape[1:3]

        def resize_to(x, h, w):
            bh, bw = x.shape[1:3]
            if (bh, bw) == (h, w):
                return x
            return jax.image.resize(x, (x.shape[0], h, w, x.shape[3]),
                                    method="nearest")

        gathered = [resize_to(x, ref_h, ref_w) for x in inputs]
        bsf = sum(gathered) / len(gathered)
        outs = []
        for i, x in enumerate(inputs):
            h, w = x.shape[1:3]
            outs.append(x + resize_to(bsf, h, w))
        return tuple(outs)
