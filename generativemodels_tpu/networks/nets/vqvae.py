"""VQ-VAE with EMA codebook, TPU-native channels-last.

Reference parity: generative/networks/nets/vqvae.py — VQVAE (:274),
Encoder (:83), Decoder (:173), VQVAEResidualUnit (:27), with the
parametrised downsample/upsample conv tuples (stride, kernel, dilation,
padding[, output_padding]) and the full stage-2 API (encode / quantize /
decode / index_quantize / decode_samples / encode_stage_2_inputs /
decode_stage_2_outputs).
"""
from __future__ import annotations

from collections.abc import Sequence

import flax.linen as nn
import jax.numpy as jnp

from ..blocks.convolutions import ConvND, ConvTransposeND
from ..layers.vector_quantizer import EMAQuantizer, VectorQuantizer
from .diffusion_model_unet import ensure_tuple_rep

__all__ = ["VQVAE", "VQVAEEncoder", "VQVAEDecoder", "VQVAEResidualUnit"]

_ACTS = {
    "RELU": nn.relu,
    "LEAKYRELU": lambda x: nn.leaky_relu(x, 0.01),
    "PRELU": nn.relu,  # parameter-free approximation
    "TANH": jnp.tanh,
    "SIGMOID": nn.sigmoid,
    "SILU": nn.silu,
}


def _act_fn(act):
    if act is None:
        return lambda x: x
    name = act[0] if isinstance(act, (tuple, list)) else act
    fn = _ACTS.get(str(name).upper())
    if fn is None:
        raise ValueError(f"Unsupported activation: {act}")
    return fn


def _same_padding(kernel: int, dilation: int) -> int:
    return ((kernel - 1) * dilation) // 2


class VQVAEResidualUnit(nn.Module):
    """relu(x + conv2(act(drop(conv1(x))))) (reference :27-80)."""

    spatial_dims: int
    num_channels: int
    num_res_channels: int
    act: str | tuple | None = "RELU"
    dropout: float = 0.0
    bias: bool = True
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        h = ConvND(
            self.spatial_dims, self.num_res_channels, kernel_size=3,
            padding=_same_padding(3, 1), use_bias=self.bias, dtype=self.dtype, name="conv1",
        )(x)
        h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        h = _act_fn(self.act)(h)
        h = ConvND(
            self.spatial_dims, self.num_channels, kernel_size=3,
            padding=_same_padding(3, 1), use_bias=self.bias, dtype=self.dtype, name="conv2",
        )(h)
        return nn.relu(x + h)


class VQVAEEncoder(nn.Module):
    """Strided-conv encoder with per-level residual units (reference :83)."""

    spatial_dims: int
    in_channels: int
    out_channels: int
    num_channels: Sequence[int]
    num_res_layers: int
    num_res_channels: Sequence[int]
    downsample_parameters: Sequence[Sequence[int]]
    dropout: float
    act: str | tuple | None
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        act = _act_fn(self.act)
        for i in range(len(self.num_channels)):
            stride, kernel, dilation, padding = self.downsample_parameters[i]
            x = ConvND(
                self.spatial_dims, self.num_channels[i], kernel_size=kernel, strides=stride,
                dilation=dilation, padding=padding, dtype=self.dtype, name=f"down_{i}",
            )(x)
            if i > 0:
                x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
            x = act(x)
            for j in range(self.num_res_layers):
                x = VQVAEResidualUnit(
                    self.spatial_dims, self.num_channels[i], self.num_res_channels[i],
                    act=self.act, dropout=self.dropout, dtype=self.dtype, name=f"res_{i}_{j}",
                )(x, deterministic=deterministic)
        return ConvND(
            self.spatial_dims, self.out_channels, kernel_size=3, padding=1, dtype=self.dtype,
            name="conv_out",
        )(x)


class VQVAEDecoder(nn.Module):
    """Transposed-conv decoder mirroring the encoder (reference :173)."""

    spatial_dims: int
    in_channels: int
    out_channels: int
    num_channels: Sequence[int]
    num_res_layers: int
    num_res_channels: Sequence[int]
    upsample_parameters: Sequence[Sequence[int]]
    dropout: float
    act: str | tuple | None
    output_act: str | tuple | None
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        act = _act_fn(self.act)
        reversed_channels = list(reversed(tuple(self.num_channels)))
        reversed_res_channels = list(reversed(tuple(self.num_res_channels)))

        x = ConvND(
            self.spatial_dims, reversed_channels[0], kernel_size=3, padding=1, dtype=self.dtype,
            name="conv_in",
        )(x)

        n = len(reversed_channels)
        for i in range(n):
            for j in range(self.num_res_layers):
                x = VQVAEResidualUnit(
                    self.spatial_dims, reversed_channels[i], reversed_res_channels[i],
                    act=self.act, dropout=self.dropout, dtype=self.dtype, name=f"res_{i}_{j}",
                )(x, deterministic=deterministic)
            stride, kernel, dilation, padding, output_padding = self.upsample_parameters[i]
            is_last = i == n - 1
            out_ch = self.out_channels if is_last else reversed_channels[i + 1]
            x = ConvTransposeND(
                self.spatial_dims, out_ch, kernel_size=kernel, strides=stride,
                dilation=dilation, padding=padding, output_padding=output_padding,
                dtype=self.dtype, name=f"up_{i}",
            )(x)
            if not is_last:
                x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
                x = act(x)
        if self.output_act:
            x = _act_fn(self.output_act)(x)
        return x


class VQVAE(nn.Module):
    """Vector-quantised VAE. Public layout is (B, C, *spatial).

    forward returns (reconstruction, quantization_loss); stage-2 helpers
    match the reference (:417-455). The EMA codebook lives in the flax
    "codebook" collection — pass `mutable=["codebook", "metrics"]` and
    `train=True` for training steps.
    """

    spatial_dims: int
    in_channels: int
    out_channels: int
    num_channels: Sequence[int] | int = (96, 96, 192)
    num_res_layers: int = 3
    num_res_channels: Sequence[int] | int = (96, 96, 192)
    downsample_parameters: Sequence = ((2, 4, 1, 1), (2, 4, 1, 1), (2, 4, 1, 1))
    upsample_parameters: Sequence = ((2, 4, 1, 1, 0), (2, 4, 1, 1, 0), (2, 4, 1, 1, 0))
    num_embeddings: int = 32
    embedding_dim: int = 64
    embedding_init: str = "normal"
    commitment_cost: float = 0.25
    decay: float = 0.5
    epsilon: float = 1e-5
    dropout: float = 0.0
    act: str | tuple | None = "RELU"
    output_act: str | tuple | None = None
    ddp_sync: bool = True
    axis_name: str | None = None
    use_checkpointing: bool = False
    dtype: jnp.dtype | None = None

    def setup(self):
        num_channels = tuple(self.num_channels) if not isinstance(self.num_channels, int) else (
            self.num_channels,
        )
        num_res_channels = ensure_tuple_rep(self.num_res_channels, len(num_channels))

        down = self.downsample_parameters
        up = self.upsample_parameters
        if all(isinstance(v, int) for v in down):
            down = (tuple(down),) * len(num_channels)
        if all(isinstance(v, int) for v in up):
            up = (tuple(up),) * len(num_channels)
        for p in down:
            if len(p) != 4:
                raise ValueError(
                    "`downsample_parameters` should be a tuple of tuples with 4 integers."
                )
        for p in up:
            if len(p) != 5:
                raise ValueError(
                    "`upsample_parameters` should be a tuple of tuples with 5 integers."
                )
        if len(down) != len(num_channels) or len(up) != len(num_channels):
            raise ValueError(
                "down/upsample_parameters should have the same length as num_channels."
            )

        encoder_cls = nn.remat(VQVAEEncoder) if self.use_checkpointing else VQVAEEncoder
        decoder_cls = nn.remat(VQVAEDecoder) if self.use_checkpointing else VQVAEDecoder

        self.encoder = encoder_cls(
            spatial_dims=self.spatial_dims,
            in_channels=self.in_channels,
            out_channels=self.embedding_dim,
            num_channels=num_channels,
            num_res_layers=self.num_res_layers,
            num_res_channels=num_res_channels,
            downsample_parameters=down,
            dropout=self.dropout,
            act=self.act,
            dtype=self.dtype,
        )
        self.decoder = decoder_cls(
            spatial_dims=self.spatial_dims,
            in_channels=self.embedding_dim,
            out_channels=self.out_channels,
            num_channels=num_channels,
            num_res_layers=self.num_res_layers,
            num_res_channels=num_res_channels,
            upsample_parameters=up,
            dropout=self.dropout,
            act=self.act,
            output_act=self.output_act,
            dtype=self.dtype,
        )
        self.quantizer = VectorQuantizer(
            quantizer=EMAQuantizer(
                spatial_dims=self.spatial_dims,
                num_embeddings=self.num_embeddings,
                embedding_dim=self.embedding_dim,
                commitment_cost=self.commitment_cost,
                decay=self.decay,
                epsilon=self.epsilon,
                embedding_init=self.embedding_init,
                ddp_sync=self.ddp_sync,
                axis_name=self.axis_name,
            )
        )

    def _to_cl(self, x):
        perm = (0,) + tuple(range(2, 2 + self.spatial_dims)) + (1,)
        x = jnp.transpose(x, perm)
        return x.astype(self.dtype) if self.dtype is not None else x

    def _from_cl(self, x):
        perm = (0, self.spatial_dims + 1) + tuple(range(1, self.spatial_dims + 1))
        return jnp.transpose(x, perm).astype(jnp.float32)

    def encode(self, images: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        """Image -> continuous latent (B, embedding_dim, *latent_spatial)."""
        return self._from_cl(self.encoder(self._to_cl(images), deterministic=deterministic))

    def quantize(self, encodings: jnp.ndarray, train: bool = False):
        """Continuous latent -> (quantized latent, quantization loss)."""
        loss, quantized = self.quantizer(self._to_cl(encodings), train=train)
        return self._from_cl(quantized), loss

    def decode(self, quantizations: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        return self._from_cl(
            self.decoder(self._to_cl(quantizations), deterministic=deterministic)
        )

    def index_quantize(self, images: jnp.ndarray) -> jnp.ndarray:
        """Image -> codebook indices (B, *latent_spatial)."""
        return self.quantizer.quantize(self._to_cl(self.encode(images)))

    def decode_samples(self, embedding_indices: jnp.ndarray) -> jnp.ndarray:
        """Codebook indices -> decoded image."""
        embedded = self.quantizer.embed(embedding_indices)  # channels-last
        return self._from_cl(self.decoder(embedded, deterministic=True))

    def __call__(self, images: jnp.ndarray, train: bool = False):
        deterministic = not train
        quantizations, quantization_losses = self.quantize(
            self.encode(images, deterministic=deterministic), train=train
        )
        reconstruction = self.decode(quantizations, deterministic=deterministic)
        return reconstruction, quantization_losses

    def encode_stage_2_inputs(self, x: jnp.ndarray, quantized: bool = True) -> jnp.ndarray:
        z = self.encode(x)
        e, _ = self.quantize(z)
        return e if quantized else z

    def decode_stage_2_outputs(self, z: jnp.ndarray) -> jnp.ndarray:
        e, _ = self.quantize(z)
        return self.decode(e)
