"""Pix2PixHD patch discriminators, TPU-native channels-last.

Reference parity: generative/networks/nets/patchgan_discriminator.py —
PatchDiscriminator (:158) and MultiScalePatchDiscriminator (:23), including
the N(0, 0.02) conv init (:285-301) and the forward contract of returning
all intermediate features with the prediction last (:269-283).

Norm note: the reference defaults to BatchNorm and warns that DDP needs
SyncBatchNorm (:262-267). Here "BATCH" uses flax BatchNorm (mutable
`batch_stats`; per-shard statistics under a sharded batch); "INSTANCE" or
"GROUP" are mesh-friendly alternatives with no cross-device stats.
"""
from __future__ import annotations

from collections.abc import Sequence

import flax.linen as nn
import jax.numpy as jnp

from ..blocks.convolutions import avg_pool

__all__ = ["PatchDiscriminator", "MultiScalePatchDiscriminator"]


def _activation(act):
    if act is None:
        return lambda x: x
    if isinstance(act, (tuple, list)):
        name, kwargs = act[0], (act[1] if len(act) > 1 else {})
    else:
        name, kwargs = act, {}
    name = str(name).upper()
    if name == "LEAKYRELU":
        slope = kwargs.get("negative_slope", 0.01)
        return lambda x: nn.leaky_relu(x, slope)
    if name == "RELU":
        return nn.relu
    if name == "TANH":
        return jnp.tanh
    if name == "SIGMOID":
        return nn.sigmoid
    raise ValueError(f"Unsupported activation {act}")


class _Norm(nn.Module):
    kind: str | tuple | None
    dtype: jnp.dtype | None = None
    # cross-device stat sync for BATCH norm: the TPU-native SyncBatchNorm the
    # reference advises for DDP (patchgan_discriminator.py:262-267). Set to the
    # mesh data-axis name inside pmap/shard_map to sync batch statistics.
    axis_name: str | None = None

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        if self.kind is None:
            return x
        # MONAI-style ("GROUP", {"num_groups": N}) tuples carry norm kwargs
        kwargs = {}
        kind = self.kind
        if isinstance(kind, (tuple, list)):
            kind, kwargs = kind[0], dict(kind[1]) if len(kind) > 1 else {}
        kind = str(kind).upper()
        if kind == "BATCH":
            return nn.BatchNorm(
                use_running_average=deterministic,
                momentum=0.9,
                epsilon=1e-5,
                dtype=self.dtype,
                axis_name=self.axis_name,
                scale_init=nn.initializers.normal(0.02, dtype=jnp.float32),
            )(x)
        if kind == "INSTANCE":
            axes = tuple(range(1, x.ndim - 1))
            mean = jnp.mean(x, axis=axes, keepdims=True)
            var = jnp.var(x, axis=axes, keepdims=True)
            return (x - mean) / jnp.sqrt(var + 1e-5)
        if kind == "GROUP":
            groups = kwargs.get("num_groups", min(32, x.shape[-1]))
            eps = kwargs.get("eps", 1e-5)
            return nn.GroupNorm(num_groups=groups, epsilon=eps, dtype=self.dtype)(x)
        raise ValueError(f"Unsupported norm {self.kind}")


class PatchDiscriminator(nn.Module):
    """Strided conv stack, channels doubling, final conv head.

    __call__ returns the list of intermediate features with the output
    prediction as the last element (for feature-matching losses).
    """

    spatial_dims: int
    num_channels: int
    in_channels: int
    out_channels: int = 1
    num_layers_d: int = 3
    kernel_size: int = 4
    activation: str | tuple = ("LEAKYRELU", {"negative_slope": 0.2})
    norm: str | tuple = "BATCH"
    bias: bool = False
    padding: int | Sequence[int] = 1
    dropout: float = 0.0
    last_conv_kernel_size: int | None = None
    dtype: jnp.dtype | None = None
    norm_axis_name: str | None = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> list[jnp.ndarray]:
        act = _activation(self.activation)
        last_k = self.last_conv_kernel_size or self.kernel_size
        init = nn.initializers.normal(0.02)

        # public NC* -> channels-last
        perm = (0,) + tuple(range(2, 2 + self.spatial_dims)) + (1,)
        inv_perm = (0, self.spatial_dims + 1) + tuple(range(1, self.spatial_dims + 1))
        h = jnp.transpose(x, perm)
        if self.dtype is not None:
            h = h.astype(self.dtype)

        outs = []

        def conv(h, features, k, stride, pad, use_bias, name, zero_pad_k=None):
            return nn.Conv(
                features=features,
                kernel_size=(k,) * self.spatial_dims,
                strides=(stride,) * self.spatial_dims,
                padding=[(pad, pad)] * self.spatial_dims
                if isinstance(pad, int)
                else [(p, p) for p in pad],
                use_bias=use_bias,
                kernel_init=init,
                dtype=self.dtype,
                name=name,
            )(h)

        # initial: conv -> dropout -> act (no norm)
        h = conv(h, self.num_channels, self.kernel_size, 2, self.padding, True, "initial_conv")
        h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        h = act(h)
        outs.append(jnp.transpose(h, inv_perm))

        input_channels = self.num_channels
        output_channels = self.num_channels * 2
        for l in range(self.num_layers_d):
            stride = 1 if l == self.num_layers_d - 1 else 2
            h = conv(h, output_channels, self.kernel_size, stride, self.padding, self.bias, f"layer_{l}")
            h = _Norm(self.norm, dtype=self.dtype, axis_name=self.norm_axis_name, name=f"norm_{l}")(h, deterministic=deterministic)
            h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
            h = act(h)
            outs.append(jnp.transpose(h, inv_perm))
            input_channels = output_channels
            output_channels *= 2

        h = conv(h, self.out_channels, last_k, 1, (last_k - 1) // 2, True, "final_conv")
        outs.append(jnp.transpose(h, inv_perm).astype(jnp.float32))
        return outs


class MultiScalePatchDiscriminator(nn.Module):
    """Several PatchDiscriminators over progressively pooled inputs.

    __call__ returns `(outputs, intermediate_features)` — one prediction and
    one feature list per discriminator (reference :138-155).
    """

    num_d: int
    num_layers_d: int | Sequence[int]
    spatial_dims: int
    num_channels: int
    in_channels: int
    pooling_method: str | None = None
    out_channels: int = 1
    kernel_size: int = 4
    activation: str | tuple = ("LEAKYRELU", {"negative_slope": 0.2})
    norm: str | tuple = "BATCH"
    bias: bool = False
    dropout: float = 0.0
    minimum_size_im: int = 256
    last_conv_kernel_size: int = 1
    dtype: jnp.dtype | None = None
    norm_axis_name: str | None = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True):
        if isinstance(self.num_layers_d, int):
            if self.pooling_method is None:
                num_layers = [self.num_layers_d * i for i in range(1, self.num_d + 1)]
            else:
                num_layers = [self.num_layers_d] * self.num_d
        else:
            num_layers = list(self.num_layers_d)
        if len(num_layers) != self.num_d:
            raise ValueError("num_d must match the length of num_layers_d")

        padding = (self.kernel_size - 1) // 2

        outputs = []
        features = []
        for i, n_layers in enumerate(num_layers):
            if float(self.minimum_size_im) / (2**n_layers) < 1:
                raise AssertionError(
                    f"Image size too small for discriminator {i} with num_layers {n_layers}"
                )
            inp = x
            if self.pooling_method is not None and i > 0:
                # pool i times in channels-last then back — torch-pool
                # convention (patchgan_discriminator.py:89-91): window =
                # kernel_size, stride 2, zero pad (k-1)//2 on both sides,
                # count_include_pad=True (zeros participate in the mean)
                perm = (0,) + tuple(range(2, 2 + self.spatial_dims)) + (1,)
                inv_perm = (0, self.spatial_dims + 1) + tuple(range(1, self.spatial_dims + 1))
                h = jnp.transpose(inp, perm)
                pad = [(0, 0)] + [(padding, padding)] * self.spatial_dims + [(0, 0)]
                for _ in range(i):
                    h = avg_pool(jnp.pad(h, pad), self.kernel_size, stride=2)
                inp = jnp.transpose(h, inv_perm)
            outs = PatchDiscriminator(
                spatial_dims=self.spatial_dims,
                num_channels=self.num_channels,
                in_channels=self.in_channels,
                out_channels=self.out_channels,
                num_layers_d=n_layers,
                kernel_size=self.kernel_size,
                activation=self.activation,
                norm=self.norm,
                bias=self.bias,
                padding=padding,
                dropout=self.dropout,
                last_conv_kernel_size=self.last_conv_kernel_size,
                dtype=self.dtype,
                norm_axis_name=self.norm_axis_name,
                name=f"discriminator_{i}",
            )(inp, deterministic=deterministic)
            outputs.append(outs[-1])
            features.append(outs[:-1])
        return outputs, features
