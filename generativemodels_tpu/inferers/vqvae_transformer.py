"""VQ-VAE + autoregressive transformer inferer.

Reference parity: generative/inferers/inferer.py:1126-1330
(VQVAETransformerInferer: index_quantize -> ordering -> BOS prepend ->
random max_seq_len crop for training; token-by-token sampling with
temperature/top-k and BOS masking; teacher-forced likelihood with
sliding-window continuation into a spatial log-prob map).

TPU-first: the token-by-token sampling and windowed-likelihood loops are
`lax.scan`s over a left-aligned static window (identical numerics to the
reference's growing/cropped window, one compiled program).
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp

# Measured on a v5e (benchmarks/results_ar_sampling.json): at the 2D
# tutorial scale (256-token grid, dim-96/depth-12 transformer) the
# windowed full-forward scan beats KV-cache decode 2-4x — both paths are
# per-step-dispatch-bound at this size and each full re-forward is one
# MXU-efficient batched matmul, while cached decode runs S serial
# low-occupancy matvecs. Still true at 1024 tokens (2.57 s vs 3.19 s), so
# on TPU auto-dispatch only engages the cache for longer sequences (3D
# grids, e.g. 16^3 = 4096), where the windowed path's O(S^2) re-forward
# FLOPs finally dominate. Forcing `use_cache=True/False` overrides.
_CACHE_MIN_SEQ_TPU = 2048


def resolve_use_cache(
    total_len: int, max_seq_len: int, bos_len: int, transformer_model
) -> bool:
    """Decide whether AR sampling uses the KV-cache decode path.

    The cache requires the whole sequence to fit `max_seq_len`, a single
    BOS token, and an unbindable (Flax bound) transformer; on TPU it must
    also be long enough to beat the windowed full-forward scan (see
    `_CACHE_MIN_SEQ_TPU`).
    """
    fits = total_len <= max_seq_len and bos_len == 1 and hasattr(
        transformer_model, "unbind"
    )
    if not fits:
        return False
    try:
        on_tpu = jax.default_backend() == "tpu"
    except Exception:
        on_tpu = False
    return total_len >= _CACHE_MIN_SEQ_TPU if on_tpu else True


class VQVAETransformerInferer:
    """Orchestrates a (bound) VQVAE, a transformer callable and an Ordering.

    `vqvae_model` is a bound VQVAE module (module.bind(variables)) exposing
    index_quantize / decode_samples / num_embeddings. `transformer_model`
    is a callable `(x, context=None) -> logits` exposing `max_seq_len`
    (pass the bound module or any object with that attribute).
    """

    def __call__(
        self,
        inputs: jnp.ndarray,
        vqvae_model,
        transformer_model,
        ordering,
        condition: jnp.ndarray | None = None,
        return_latent: bool = False,
        key: jax.Array | None = None,
    ):
        """Teacher-forced training forward over the (cropped) token sequence."""
        latent = jax.lax.stop_gradient(vqvae_model.index_quantize(inputs))
        latent_spatial_dim = tuple(latent.shape[1:])
        latent = latent.reshape(latent.shape[0], -1)
        latent = latent[:, ordering.get_sequence_ordering()]

        target = latent
        bos = vqvae_model.num_embeddings
        latent = jnp.pad(latent, ((0, 0), (1, 0)), constant_values=bos)[:, :-1]
        latent = latent.astype(jnp.int32)

        seq_len = latent.shape[1]
        max_seq_len = transformer_model.max_seq_len
        if max_seq_len < seq_len:
            if key is None:
                raise ValueError(
                    "a PRNG `key` is required to draw the random training crop when the "
                    "token sequence exceeds max_seq_len"
                )
            start = jax.random.randint(key, (), 0, seq_len + 1 - max_seq_len)
            window = jax.lax.dynamic_slice_in_dim(latent, start, max_seq_len, axis=1)
            target_window = jax.lax.dynamic_slice_in_dim(target, start, max_seq_len, axis=1)
        else:
            window = latent
            target_window = target

        prediction = transformer_model(window, context=condition)
        if return_latent:
            return prediction, target_window, latent_spatial_dim
        return prediction

    def sample(
        self,
        latent_spatial_dim,
        starting_tokens: jnp.ndarray,
        vqvae_model,
        transformer_model,
        ordering,
        conditioning: jnp.ndarray | None = None,
        temperature: float = 1.0,
        top_k: int | None = None,
        verbose: bool = False,
        key: jax.Array | None = None,
        use_cache: bool | None = None,
    ) -> jnp.ndarray:
        """Autoregressive sampling, then decode the token grid to an image.

        When the full sequence fits `max_seq_len`, a KV-cache decode path
        (O(S) per token instead of the reference's O(S^2) full re-forward,
        SURVEY.md §3.5) is used; set `use_cache=False` to force the
        windowed full-forward path.
        """
        if key is None:
            key = jax.random.PRNGKey(0)
        seq_len = math.prod(latent_spatial_dim)
        batch = starting_tokens.shape[0]
        bos_len = starting_tokens.shape[1]
        total_len = bos_len + seq_len
        max_seq_len = transformer_model.max_seq_len
        window = min(max_seq_len, total_len)
        num_embeddings = vqvae_model.num_embeddings

        buf = jnp.zeros((batch, total_len), jnp.int32)
        buf = jax.lax.dynamic_update_slice_in_dim(
            buf, starting_tokens.astype(jnp.int32), 0, axis=1
        )

        if use_cache is None:
            use_cache = resolve_use_cache(
                total_len, max_seq_len, bos_len, transformer_model
            )
        if use_cache:
            latent_seq = self._sample_tokens_cached(
                buf, transformer_model, conditioning, temperature, top_k,
                num_embeddings, seq_len, bos_len, key,
            )
            latent_seq = latent_seq[:, ordering.get_revert_sequence_ordering()]
            latent = latent_seq.reshape((batch,) + tuple(latent_spatial_dim))
            return vqvae_model.decode_samples(latent)

        def step(carry, i):
            buf, k = carry
            pos = bos_len + i  # index where the next token goes
            # left-aligned static window ending at pos-1; trailing garbage is
            # masked by causal attention, so logits at `last` match the
            # reference's cropped-window forward exactly.
            start = jnp.maximum(0, pos - window)
            tokens = jax.lax.dynamic_slice_in_dim(buf, start, window, axis=1)
            last = jnp.minimum(pos - 1, window - 1)

            logits = transformer_model(tokens, context=conditioning)
            logits = jnp.take_along_axis(
                logits, last[None, None, None].repeat(batch, 0), axis=1
            )[:, 0, :]
            logits = logits / temperature
            if top_k is not None:
                kth = jax.lax.top_k(logits, min(top_k, logits.shape[-1]))[0][:, -1:]
                logits = jnp.where(logits < kth, -jnp.inf, logits)
            # never sample the BOS token
            logits = logits.at[:, num_embeddings].set(-jnp.inf)

            k, sub = jax.random.split(k)
            idx_next = jax.random.categorical(sub, logits, axis=-1)
            buf = jax.lax.dynamic_update_index_in_dim(
                buf, idx_next.astype(jnp.int32), pos, axis=1
            )
            return (buf, k), None

        (buf, _), _ = jax.lax.scan(step, (buf, key), jnp.arange(seq_len))

        latent_seq = buf[:, bos_len:]
        latent_seq = latent_seq[:, ordering.get_revert_sequence_ordering()]
        latent = latent_seq.reshape((batch,) + tuple(latent_spatial_dim))
        return vqvae_model.decode_samples(latent)

    @staticmethod
    def _sample_tokens_cached(
        buf, transformer_model, conditioning, temperature, top_k,
        num_embeddings, seq_len, bos_len, key,
    ) -> jnp.ndarray:
        """KV-cache token sampling: one single-token forward per step."""
        module, variables = transformer_model.unbind()
        params = variables["params"]
        batch = buf.shape[0]
        cache = module.init(
            jax.random.PRNGKey(0), jnp.zeros((batch, 1), jnp.int32),
            context=conditioning, decode=True,
        )["cache"]
        # init ran one decode step to build the cache shapes; reset to empty
        cache = jax.tree_util.tree_map(jnp.zeros_like, cache)

        def step(carry, i):
            buf, cache, k = carry
            pos = bos_len + i
            tok = jax.lax.dynamic_slice_in_dim(buf, pos - 1, 1, axis=1)
            logits, mutated = module.apply(
                {"params": params, "cache": cache}, tok, context=conditioning,
                decode=True, mutable=["cache"],
            )
            cache = mutated["cache"]
            logits = logits[:, 0, :] / temperature
            if top_k is not None:
                kth = jax.lax.top_k(logits, min(top_k, logits.shape[-1]))[0][:, -1:]
                logits = jnp.where(logits < kth, -jnp.inf, logits)
            logits = logits.at[:, num_embeddings].set(-jnp.inf)
            k, sub = jax.random.split(k)
            idx_next = jax.random.categorical(sub, logits, axis=-1)
            buf = jax.lax.dynamic_update_index_in_dim(
                buf, idx_next.astype(jnp.int32), pos, axis=1
            )
            return (buf, cache, k), None

        (buf, _, _), _ = jax.lax.scan(step, (buf, cache, key), jnp.arange(seq_len))
        return buf[:, bos_len:]

    def get_likelihood(
        self,
        inputs: jnp.ndarray,
        vqvae_model,
        transformer_model,
        ordering,
        condition: jnp.ndarray | None = None,
        resample_latent_likelihoods: bool = False,
        resample_interpolation_mode: str = "nearest",
        verbose: bool = False,
    ) -> jnp.ndarray:
        """Spatial log-likelihood map of the input's token grid."""
        if resample_latent_likelihoods and resample_interpolation_mode not in (
            "nearest",
            "bilinear",
            "trilinear",
        ):
            raise ValueError(
                "resample_interpolation mode should be either nearest, bilinear, or "
                f"trilinear, got {resample_interpolation_mode}"
            )
        latent = jax.lax.stop_gradient(vqvae_model.index_quantize(inputs))
        latent_spatial_dim = tuple(latent.shape[1:])
        batch = latent.shape[0]
        latent = latent.reshape(batch, -1)
        latent = latent[:, ordering.get_sequence_ordering()]
        seq_len = math.prod(latent_spatial_dim)

        bos = vqvae_model.num_embeddings
        latent = jnp.pad(latent, ((0, 0), (1, 0)), constant_values=bos).astype(jnp.int32)
        max_seq_len = transformer_model.max_seq_len

        # first chunk: one teacher-forced pass
        first = latent[:, : min(max_seq_len, latent.shape[1])]
        logits = transformer_model(first, context=condition)
        probs = jax.nn.softmax(logits, axis=-1)
        target = latent[:, 1:]
        first_targets = target[:, : probs.shape[1]]
        probs_gathered = jnp.take_along_axis(probs, first_targets[..., None], axis=2)[..., 0]
        # only seq_len positions are real token probabilities
        probs_gathered = probs_gathered[:, : min(probs.shape[1], seq_len)]

        if probs_gathered.shape[1] < seq_len:
            # windowed continuation for positions >= max_seq_len
            def step(_, i):
                start = i + 1 - max_seq_len
                tokens = jax.lax.dynamic_slice_in_dim(latent, start, max_seq_len, axis=1)
                logits = transformer_model(tokens, context=condition)[:, -1, :]
                p = jax.nn.softmax(logits, axis=-1)
                tgt = jax.lax.dynamic_slice_in_dim(target, i, 1, axis=1)[:, 0]
                return None, jnp.take_along_axis(p, tgt[:, None], axis=1)[:, 0]

            _, tail = jax.lax.scan(step, None, jnp.arange(max_seq_len, seq_len))
            probs_gathered = jnp.concatenate([probs_gathered, tail.T], axis=1)

        log_probs = jnp.log(probs_gathered)
        log_probs = log_probs[:, ordering.get_revert_sequence_ordering()]
        probs_reshaped = log_probs.reshape((batch,) + tuple(latent_spatial_dim))

        if resample_latent_likelihoods:
            method = {"nearest": "nearest", "bilinear": "linear", "trilinear": "linear"}[
                resample_interpolation_mode
            ]
            out_shape = (batch, 1) + inputs.shape[2:]
            probs_reshaped = jax.image.resize(
                probs_reshaped[:, None, ...], out_shape, method=method
            )
        return probs_reshaped
