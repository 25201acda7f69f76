"""HRFPN neck (reference `mmdet/models/necks/hrfpn.py`): concat all HRNet
branches at the highest resolution, 1×1 reduce, then avg-pool pyramid +
per-level 3×3 convs."""
from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..layers import Conv
from ..registry import NECKS


@NECKS.register_module
class HRFPN(nn.Module):
    in_channels: Sequence[int] = (32, 64, 128, 256)
    out_channels: int = 256
    num_outs: int = 5
    pooling_type: str = "AVG"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, inputs):
        assert len(inputs) == len(self.in_channels)
        h, w = inputs[0].shape[1:3]
        ups = [inputs[0]]
        for x in inputs[1:]:
            ups.append(jax.image.resize(
                x, (x.shape[0], h, w, x.shape[3]), "bilinear"))
        feat = jnp.concatenate(ups, axis=-1)
        feat = Conv(self.out_channels, (1, 1), dtype=self.dtype,
                    name="reduction_conv")(feat)
        outs = [feat]
        for i in range(1, self.num_outs):
            k = 2 ** i
            if self.pooling_type == "AVG":
                outs.append(nn.avg_pool(feat, (k, k), strides=(k, k)))
            else:
                outs.append(nn.max_pool(feat, (k, k), strides=(k, k)))
        return tuple(
            Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype,
                 name=f"fpn_conv{i}")(o) for i, o in enumerate(outs))
