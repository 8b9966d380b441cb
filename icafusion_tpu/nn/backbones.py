"""Alternative backbone blocks: VGG16 and ResNet50 towers.

Behavioral counterparts of reference models/common.py:109-181, used by the
yolov5_VGG16_* / yolov5_ResNet50_* configs. YAML args carry in-channels explicitly:
VGGblock [num_convs, c1, c2], ResNetlayer [c1, c2, stride, is_first, num_blocks]
(e.g. yolov5_ResNet50_Transfusion_FLIR.yaml:16-20).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from icafusion_tpu.nn.layers import (BN_EPS, BN_F32_REDUCTIONS, BN_MOMENTUM,
                                     TORCH_CONV_INIT, torch_bias_init)

Dtype = Any


class VGGblock(nn.Module):
    """num_convs x (3x3 conv + ReLU), then 2x2/2 max pool (common.py:109-128).

    Plain conv with bias, no BN — matching the reference exactly."""
    num_convs: int
    c1: int
    c2: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        for i in range(self.num_convs):
            x = nn.Conv(self.c2, kernel_size=(3, 3), padding=[(1, 1), (1, 1)],
                        use_bias=True, kernel_init=TORCH_CONV_INIT,
                        bias_init=torch_bias_init((self.c1 if i == 0 else self.c2) * 9),
                        dtype=self.dtype, name=f"conv{i}")(x)
            x = jax.nn.relu(x)
        return nn.max_pool(x, window_shape=(2, 2), strides=(2, 2))


class ResNetblock(nn.Module):
    """ResNet bottleneck block, expansion 4 (common.py:131-156)."""
    c1: int
    c2: int
    stride: int = 1
    dtype: Dtype = jnp.float32
    expansion: int = 4

    @nn.compact
    def __call__(self, x, train: bool = False):
        def bn(name):
            return nn.BatchNorm(use_running_average=not train, momentum=BN_MOMENTUM,
                         force_float32_reductions=BN_F32_REDUCTIONS,
                                epsilon=BN_EPS, dtype=self.dtype, name=name)

        out = nn.Conv(self.c2, kernel_size=(1, 1), use_bias=False,
                      kernel_init=TORCH_CONV_INIT, dtype=self.dtype, name="conv1")(x)
        out = jax.nn.relu(bn("bn1")(out))
        out = nn.Conv(self.c2, kernel_size=(3, 3), strides=(self.stride, self.stride),
                      padding=[(1, 1), (1, 1)], use_bias=False,
                      kernel_init=TORCH_CONV_INIT, dtype=self.dtype, name="conv2")(out)
        out = jax.nn.relu(bn("bn2")(out))
        out = nn.Conv(self.expansion * self.c2, kernel_size=(1, 1), use_bias=False,
                      kernel_init=TORCH_CONV_INIT, dtype=self.dtype, name="conv3")(out)
        out = bn("bn3")(out)

        if self.stride != 1 or self.c1 != self.expansion * self.c2:
            sc = nn.Conv(self.expansion * self.c2, kernel_size=(1, 1),
                         strides=(self.stride, self.stride), use_bias=False,
                         kernel_init=TORCH_CONV_INIT, dtype=self.dtype, name="shortcut_conv")(x)
            sc = bn("shortcut_bn")(sc)
        else:
            sc = x
        return jax.nn.relu(out + sc)


class ResNetlayer(nn.Module):
    """ResNet stage (common.py:159-181).

    is_first: 7x7/2 conv + BN + ReLU + 3x3/2 maxpool stem; else num_blocks
    bottlenecks, the first with the given stride."""
    c1: int
    c2: int
    stride: int = 1
    is_first: bool = False
    num_blocks: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.is_first:
            x = nn.Conv(self.c2, kernel_size=(7, 7), strides=(2, 2),
                        padding=[(3, 3), (3, 3)], use_bias=False,
                        kernel_init=TORCH_CONV_INIT, dtype=self.dtype, name="stem_conv")(x)
            x = nn.BatchNorm(use_running_average=not train, momentum=BN_MOMENTUM,
                         force_float32_reductions=BN_F32_REDUCTIONS,
                             epsilon=BN_EPS, dtype=self.dtype, name="stem_bn")(x)
            x = jax.nn.relu(x)
            return nn.max_pool(x, window_shape=(3, 3), strides=(2, 2),
                               padding=[(1, 1), (1, 1)])
        x = ResNetblock(self.c1, self.c2, self.stride, dtype=self.dtype, name="blk0")(x, train)
        for i in range(1, self.num_blocks):
            x = ResNetblock(4 * self.c2, self.c2, 1, dtype=self.dtype,
                            name=f"blk{i}")(x, train)
        return x
