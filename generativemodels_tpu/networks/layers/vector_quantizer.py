"""EMA vector quantisation, functional-state JAX implementation.

Reference parity: generative/networks/layers/vector_quantizer.py —
EMAQuantizer (:20) and VectorQuantizer (:191). The reference's in-place
buffer mutation (:174-180) becomes a flax mutable "codebook" variable
collection; the DDP all_reduce hook (:140-159) becomes a `lax.psum` over a
named mesh axis (only needed under shard_map/pmap — under pjit the batch
reductions are already global). Distance computation stays in float32
regardless of the compute dtype (reference fp32 island, :102-103).
"""
from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp


class EMAQuantizer(nn.Module):
    """Nearest-codebook quantisation with EMA codebook updates.

    State (flax collection "codebook"): `embedding` (K, D), `ema_cluster_size`
    (K,), `ema_w` (K, D). Call with `mutable=["codebook", "metrics"]` and
    `train=True` during training so EMA updates are applied.

    Inputs/outputs are channels-last (B, *spatial, D) — the VQVAE wrapper
    handles the public channels-first layout.
    """

    spatial_dims: int
    num_embeddings: int
    embedding_dim: int
    commitment_cost: float = 0.25
    decay: float = 0.99
    epsilon: float = 1e-5
    embedding_init: str = "normal"
    ddp_sync: bool = True
    axis_name: str | None = None  # mesh axis for psum when under shard_map/pmap

    def _init_embedding(self, key):
        if self.embedding_init == "kaiming_uniform":
            fan_in = self.embedding_dim
            bound = jnp.sqrt(3.0) * jnp.sqrt(1.0 / fan_in)
            return jax.random.uniform(
                key, (self.num_embeddings, self.embedding_dim), minval=-bound, maxval=bound
            )
        return jax.random.normal(key, (self.num_embeddings, self.embedding_dim))

    def quantize(self, inputs: jnp.ndarray, embedding: jnp.ndarray):
        """(B, *spatial, D) -> (flat_input [N,D] f32, one-hot [N,K], indices [B,*spatial])."""
        spatial_shape = inputs.shape[:-1]
        flat_input = inputs.reshape(-1, self.embedding_dim).astype(jnp.float32)

        distances = (
            jnp.sum(flat_input**2, axis=1, keepdims=True)
            + jnp.sum(embedding**2, axis=1)[None, :]
            - 2.0 * jnp.dot(flat_input, embedding.T)
        )
        encoding_indices = jnp.argmax(-distances, axis=1)
        encodings = jax.nn.one_hot(encoding_indices, self.num_embeddings, dtype=jnp.float32)
        return flat_input, encodings, encoding_indices.reshape(spatial_shape)

    def embed(self, embedding_indices: jnp.ndarray, embedding: jnp.ndarray) -> jnp.ndarray:
        """Indices (B, *spatial) -> channels-last embeddings (B, *spatial, D)."""
        return jnp.take(embedding, embedding_indices, axis=0)

    def distributed_synchronization(self, encodings_sum: jnp.ndarray, dw: jnp.ndarray):
        """All-reduce the EMA statistics over the mesh axis (reference:
        generative/networks/layers/vector_quantizer.py:140-159, where this
        is a torch.distributed.all_reduce; here a `lax.psum` that is a
        no-op unless ddp_sync is set and an axis_name is bound)."""
        if self.ddp_sync and self.axis_name is not None:
            encodings_sum = jax.lax.psum(encodings_sum, self.axis_name)
            dw = jax.lax.psum(dw, self.axis_name)
        return encodings_sum, dw

    @nn.compact
    def __call__(self, inputs: jnp.ndarray, train: bool = False):
        embedding = self.variable(
            "codebook", "embedding", self._init_embedding, self.make_rng("params")
            if self.has_rng("params") else jax.random.PRNGKey(0)
        )
        ema_cluster_size = self.variable(
            "codebook", "ema_cluster_size", lambda: jnp.zeros(self.num_embeddings)
        )
        ema_w = self.variable("codebook", "ema_w", lambda: embedding.value)

        flat_input, encodings, encoding_indices = self.quantize(inputs, embedding.value)
        quantized = self.embed(encoding_indices, embedding.value).astype(inputs.dtype)

        if train:
            encodings_sum = jnp.sum(encodings, axis=0)
            dw = jnp.dot(encodings.T, flat_input)
            encodings_sum, dw = self.distributed_synchronization(encodings_sum, dw)

            new_cluster_size = ema_cluster_size.value * self.decay + encodings_sum * (
                1 - self.decay
            )
            n = jnp.sum(new_cluster_size)
            weights = (
                (new_cluster_size + self.epsilon)
                / (n + self.num_embeddings * self.epsilon)
                * n
            )
            new_ema_w = ema_w.value * self.decay + dw * (1 - self.decay)

            ema_cluster_size.value = new_cluster_size
            ema_w.value = new_ema_w
            embedding.value = new_ema_w / weights[:, None]

        loss = self.commitment_cost * jnp.mean(
            (jax.lax.stop_gradient(quantized) - inputs) ** 2
        )
        # straight-through estimator
        quantized = inputs + jax.lax.stop_gradient(quantized - inputs)
        return quantized, loss, encoding_indices


class VectorQuantizer(nn.Module):
    """Wrapper computing codebook perplexity (stored in 'metrics' collection).

    The reference uses this class to isolate non-fp16-safe math for AMP
    (:192-195); on TPU the fp32 island lives inside EMAQuantizer.quantize.
    """

    quantizer: EMAQuantizer

    @nn.compact
    def __call__(self, inputs: jnp.ndarray, train: bool = False):
        quantized, loss, encoding_indices = self.quantizer(inputs, train=train)

        counts = jnp.bincount(
            encoding_indices.reshape(-1),
            length=self.quantizer.num_embeddings,
        ).astype(jnp.float32)
        avg_probs = counts / encoding_indices.size
        perplexity = jnp.exp(-jnp.sum(avg_probs * jnp.log(avg_probs + 1e-10)))
        self.sow("metrics", "perplexity", perplexity)

        return loss, quantized

    def embed(self, embedding_indices: jnp.ndarray) -> jnp.ndarray:
        embedding = self.quantizer.get_variable("codebook", "embedding")
        return self.quantizer.embed(embedding_indices, embedding)

    def quantize(self, encodings: jnp.ndarray) -> jnp.ndarray:
        _, _, encoding_indices = self.quantizer(encodings, train=False)
        return encoding_indices
