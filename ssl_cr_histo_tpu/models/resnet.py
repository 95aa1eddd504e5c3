"""ResNet-18/50 backbones in flax.linen, matching torchvision's architecture
(the reference builds ``torchvision.models.resnet18/50`` with the final fc
stripped — reference ``models/net.py:31-45``) so that torch checkpoints can be
imported for parity runs.

TPU notes: NHWC layout end-to-end (XLA's native conv layout), bfloat16-ready
via the ``dtype`` argument (params stay float32, compute in ``dtype``), and
no data-dependent control flow — the whole network lowers to MXU convs.
torch convs pad symmetrically by (k-1)//2; flax "SAME" pads asymmetrically
for even strides, so explicit padding is used to match torch exactly.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Callable, Sequence

import flax.linen as nn
import jax.numpy as jnp

ModuleDef = Any


def _norm_factory(dtype, train):
    return partial(
        nn.BatchNorm,
        use_running_average=not train,
        momentum=0.9,
        epsilon=1e-5,
        dtype=dtype,
    )


def _conv_factory(dtype):
    def conv(filters, kernel, strides=(1, 1), *, name=None):
        p = (kernel[0] - 1) // 2
        return nn.Conv(
            filters,
            kernel,
            strides,
            padding=[(p, p), (p, p)],
            use_bias=False,
            dtype=dtype,
            name=name,
        )

    return conv


class BasicBlock(nn.Module):
    """torchvision BasicBlock: 3x3 -> 3x3 with identity/projection shortcut."""

    filters: int
    strides: int
    dtype: Any
    train: bool
    expansion: int = 1

    @nn.compact
    def __call__(self, x):
        conv = _conv_factory(self.dtype)
        norm = _norm_factory(self.dtype, self.train)
        residual = x
        y = conv(self.filters, (3, 3), (self.strides, self.strides), name="conv1")(x)
        y = norm(name="bn1")(y)
        y = nn.relu(y)
        y = conv(self.filters, (3, 3), name="conv2")(y)
        y = norm(name="bn2")(y)
        if residual.shape != y.shape:
            residual = conv(
                self.filters * self.expansion,
                (1, 1),
                (self.strides, self.strides),
                name="downsample_conv",
            )(residual)
            residual = norm(name="downsample_bn")(residual)
        return nn.relu(y + residual)


class Bottleneck(nn.Module):
    """torchvision Bottleneck: 1x1 -> 3x3 (stride) -> 1x1 (x4)."""

    filters: int
    strides: int
    dtype: Any
    train: bool
    expansion: int = 4

    @nn.compact
    def __call__(self, x):
        conv = _conv_factory(self.dtype)
        norm = _norm_factory(self.dtype, self.train)
        residual = x
        y = conv(self.filters, (1, 1), name="conv1")(x)
        y = norm(name="bn1")(y)
        y = nn.relu(y)
        y = conv(self.filters, (3, 3), (self.strides, self.strides), name="conv2")(y)
        y = norm(name="bn2")(y)
        y = nn.relu(y)
        y = conv(self.filters * self.expansion, (1, 1), name="conv3")(y)
        y = norm(name="bn3")(y)
        if residual.shape != y.shape:
            residual = conv(
                self.filters * self.expansion,
                (1, 1),
                (self.strides, self.strides),
                name="downsample_conv",
            )(residual)
            residual = norm(name="downsample_bn")(residual)
        return nn.relu(y + residual)


class ResNet(nn.Module):
    """torchvision-shaped ResNet trunk (fc stripped), NHWC.

    __call__(x, train) -> (B, feature_dim) pooled features.
    """

    stage_sizes: Sequence[int]
    block_cls: Callable
    num_filters: int = 64
    dtype: Any = jnp.float32
    remat: bool = False  # rematerialize each block's activations on the
    # backward pass (jax.checkpoint): trades ~30% more FLOPs for O(depth)
    # less HBM, fitting much larger per-chip batches (e.g. resnet50 b=128
    # at 256^2, which OOMs a v5e without it). Param tree is unchanged.

    @nn.compact
    def __call__(self, x, train: bool = True):
        conv = _conv_factory(self.dtype)
        x = x.astype(self.dtype)
        x = conv(self.num_filters, (7, 7), (2, 2), name="conv1")(x)
        x = _norm_factory(self.dtype, train)(name="bn1")(x)
        x = nn.relu(x)
        # torch maxpool(3, stride 2, padding 1)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])
        block_cls = nn.remat(self.block_cls) if self.remat else self.block_cls
        for i, block_count in enumerate(self.stage_sizes):
            for j in range(block_count):
                strides = 2 if i > 0 and j == 0 else 1
                x = block_cls(
                    filters=self.num_filters * 2**i,
                    strides=strides,
                    dtype=self.dtype,
                    train=train,
                    name=f"layer{i + 1}_{j}",
                )(x)
        x = jnp.mean(x, axis=(1, 2))  # global average pool
        # heads run in >= f32 (bf16 backbones hand off f32 features); an f64
        # model stays f64 end-to-end (the torch-parity trajectory tests
        # depend on no silent downcast here)
        return x.astype(jnp.promote_types(jnp.float32, self.dtype))


def ResNet18(dtype=jnp.float32, remat=False) -> ResNet:
    return ResNet(stage_sizes=(2, 2, 2, 2), block_cls=BasicBlock, dtype=dtype, remat=remat)


def ResNet50(dtype=jnp.float32, remat=False) -> ResNet:
    return ResNet(stage_sizes=(3, 4, 6, 3), block_cls=Bottleneck, dtype=dtype, remat=remat)


RESNET_FEATURE_DIM = {"resnet18": 512, "resnet50": 2048}


def make_backbone(name: str, dtype=jnp.float32, remat: bool = False) -> ResNet:
    if name == "resnet18":
        return ResNet18(dtype=dtype, remat=remat)
    if name == "resnet50":
        return ResNet50(dtype=dtype, remat=remat)
    raise NotImplementedError(f"not supported model type: {name}")
