"""Torch-reference checkpoint -> flax parameter conversion for the big nets.

The reference publishes model-zoo bundles whose checkpoints are torch
state_dicts of `generative.networks.nets` modules (e.g.
model-zoo/models/brain_image_synthesis_latent_diffusion_model). This
module converts those state_dicts into this package's flax param trees so
zoo weights are drop-in, and so forward-parity golden tests can prove the
flax nets compute the same function as the reference nets
(reference: generative/networks/nets/diffusion_model_unet.py:1646,
autoencoderkl.py:600, vqvae.py:274, controlnet.py:147, transformer.py:42).

Design: each net gets a `translate(flax_dir_path) -> torch_prefix`
function (the flax module names were chosen to mirror the reference's, so
translation is a handful of segment rewrites; AutoencoderKL/VQVAE need
config-driven flat `blocks.{i}` indices). `convert_state_dict` walks the
*actual* flax parameter structure (from `jax.eval_shape` of model.init),
fetches + transposes each torch tensor, verifies every leaf shape, and
errors on unconsumed torch keys — so a successful conversion is itself a
key- and shape-parity proof.

Leaf transforms:
    torch Conv{1,2,3}d   (O, I, *k)  -> flax ConvND kernel (*k, I, O)
    torch ConvTranspose  (I, O, *k)  -> flax ConvTransposeND kernel
                                        (*k_flipped spatially, I, O)
                                        [lax.conv_transpose does not flip]
    torch Linear         (out, in)   -> flax Dense kernel (in, out)
    torch GroupNorm/LayerNorm weight -> flax scale
    torch Embedding      (num, dim)  -> flax Embed embedding (as-is)
"""
from __future__ import annotations

from collections.abc import Callable, Sequence

import jax
import numpy as np

__all__ = [
    "convert_state_dict",
    "params_structure",
    "variables_structure",
    "convert_diffusion_model_unet",
    "convert_diffusion_model_encoder",
    "convert_patch_discriminator",
    "convert_autoencoderkl",
    "convert_vqvae",
    "convert_controlnet",
    "convert_transformer",
    "convert_spade_diffusion_model_unet",
    "convert_spade_autoencoderkl",
    "convert_spade_network",
    "load_reference_checkpoint",
]


# ---------------------------------------------------------------------------
# generic machinery
# ---------------------------------------------------------------------------

def _flatten(tree: dict, prefix: tuple = ()) -> dict[tuple, object]:
    out = {}
    for k, v in tree.items():
        if isinstance(v, dict):
            out.update(_flatten(v, prefix + (k,)))
        else:
            out[prefix + (k,)] = v
    return out


def _unflatten(flat: dict[tuple, object]) -> dict:
    out: dict = {}
    for path, v in flat.items():
        node = out
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node[path[-1]] = v
    return out


def params_structure(model, *example_args, method=None, rngs=None, **example_kwargs):
    """Shape-only params tree of `model.init` via jax.eval_shape (no FLOPs)."""
    if rngs is None:
        rngs = {"params": jax.random.PRNGKey(0)}

    def init(*a, **kw):
        if method is not None:
            return model.init(rngs, *a, method=method, **kw)
        return model.init(rngs, *a, **kw)

    variables = jax.eval_shape(init, *example_args, **example_kwargs)
    return variables["params"]  # ShapeDtypeStruct tree; only .shape is read


def variables_structure(model, *example_args, method=None, rngs=None, **example_kwargs):
    """Shape-only FULL variables tree (all collections) of `model.init`."""
    if rngs is None:
        rngs = {"params": jax.random.PRNGKey(0)}

    def init(*a, **kw):
        if method is not None:
            return model.init(rngs, *a, method=method, **kw)
        return model.init(rngs, *a, **kw)

    return jax.eval_shape(init, *example_args, **example_kwargs)


def _np(t) -> np.ndarray:
    if hasattr(t, "detach"):
        t = t.detach().cpu().numpy()
    # Copy: torch's .numpy() returns a VIEW of live parameter storage, and
    # untransposed leaves (1-D norm scales/biases) would otherwise flow into
    # the flax tree still aliasing it — converting from a live model and then
    # continuing to train it would silently mutate the converted params.
    return np.array(t)


def convert_state_dict(
    state_dict: dict,
    translate: Callable[[tuple[str, ...]], str],
    params_struct: dict,
    tconv_paths: Sequence[tuple[str, ...]] = (),
    ignore_torch_keys: Sequence[str] = (),
) -> dict:
    """Convert a torch state_dict into the flax params tree `params_struct`.

    Args:
        state_dict: torch module state_dict (tensors or numpy arrays).
        translate: maps a flax module path (tuple of names, no leaf) to the
            torch module prefix string.
        params_struct: the target flax params tree (arrays or ShapeDtype
            structs — only .shape is read) from `params_structure`.
        tconv_paths: flax module paths whose kernels are ConvTransposeND
            (torch layout (I, O, *k) + spatial flip).
        ignore_torch_keys: torch keys that have no flax counterpart
            (e.g. non-parameter buffers).

    Returns:
        nested dict of numpy arrays matching `params_struct`.

    Raises:
        KeyError / ValueError on any missing key, shape mismatch, or
        unconsumed torch parameter.
    """
    sd = {k: v for k, v in state_dict.items()}
    flat = _flatten(params_struct)
    tconv = {tuple(p) for p in tconv_paths}
    out: dict[tuple, np.ndarray] = {}
    consumed: set[str] = set()

    def fetch(prefix: str, leaf: str):
        # .conv.*: MONAI Convolution wraps the raw conv as child "conv";
        # .embedding.*: nn.Embedding wrapped in a holder module
        # (e.g. AbsolutePositionalEmbedding, transformer.py:22-39)
        for cand in (
            f"{prefix}.{leaf}",
            f"{prefix}.conv.{leaf}",
            f"{prefix}.embedding.{leaf}",
        ):
            if cand in sd:
                consumed.add(cand)
                return _np(sd[cand])
        raise KeyError(
            f"torch key {prefix}.{leaf!r} (or .conv/.embedding.{leaf}) not in state_dict"
        )

    for path, leaf_struct in flat.items():
        *dirs, leaf_name = path
        dirs = tuple(dirs)
        prefix = translate(dirs)
        expected = tuple(leaf_struct.shape)

        if leaf_name == "embedding":
            w = fetch(prefix, "weight")
        elif leaf_name == "scale":
            w = fetch(prefix, "weight")
        elif leaf_name == "bias":
            w = fetch(prefix, "bias")
        elif leaf_name == "mean":
            # flax BatchNorm batch_stats <- torch running stats
            w = fetch(prefix, "running_mean")
        elif leaf_name == "var":
            w = fetch(prefix, "running_var")
        elif leaf_name == "kernel":
            w = fetch(prefix, "weight")
            if w.ndim >= 3:
                if dirs in tconv:
                    # (I, O, *k) -> (*k, I, O), spatially flipped
                    w = np.transpose(w, tuple(range(2, w.ndim)) + (0, 1))
                    w = w[tuple(slice(None, None, -1) for _ in range(w.ndim - 2))]
                else:
                    # (O, I, *k) -> (*k, I, O)
                    w = np.transpose(w, tuple(range(2, w.ndim)) + (1, 0))
            elif w.ndim == 2:
                w = w.T
        else:
            raise ValueError(f"unknown flax leaf {leaf_name!r} at {'/'.join(path)}")

        if tuple(w.shape) != expected:
            raise ValueError(
                f"shape mismatch at {'/'.join(path)} <- {prefix}: "
                f"torch gives {tuple(w.shape)}, flax expects {expected}"
            )
        out[path] = np.ascontiguousarray(w, dtype=np.float32)

    ignored = set(ignore_torch_keys)
    leftovers = [
        k
        for k in sd
        if k not in consumed
        and not k.endswith("num_batches_tracked")
        and k not in ignored
        # the reference AttentionBlock defines proj_attn but never applies
        # it in forward (diffusion_model_unet.py:419-460,
        # autoencoderkl.py:268-312); checkpoints carry the dead weights
        and ".proj_attn." not in k
        # SABlock causal-mask registered buffer (selfattention.py:93)
        and not k.endswith("causal_mask")
    ]
    if leftovers:
        raise ValueError(f"unconsumed torch parameters: {sorted(leftovers)[:8]} "
                         f"({len(leftovers)} total)")
    return _unflatten(out)


# ---------------------------------------------------------------------------
# DiffusionModelUNet / DiffusionModelEncoder / ControlNet translators
# ---------------------------------------------------------------------------

_UNET_SEGMENT_REWRITES = {
    "time_embed_0": "time_embed.0",
    "time_embed_2": "time_embed.2",
    "out_norm": "out.0",
    "out_conv": "out.2",
    "out_0": "out.0",   # DiffusionModelEncoder head
    "out_3": "out.3",
    "to_out": "to_out.0",
    # SPADE base norm: flax nn.GroupNorm child "param_free_norm" <-> the
    # reference's ADN(ordering="N") wrapper (spade_norm.py:50-52), whose
    # single child is named by its ordering letter
    "param_free_norm": "param_free_norm.N",
}


def _unet_segment(parent: str, p: str) -> str:
    """Rewrite one flax module name to the reference torch name.

    Reference naming: down_blocks.{i}.resnets.{j} / .attentions.{j} /
    .downsampler, middle_block.{resnet_1,attention,resnet_2},
    up_blocks.{i}..., transformer_blocks.{k}, out.0/out.2
    (generative/networks/nets/diffusion_model_unet.py:1771-1867).
    """
    if p.startswith("down_") and p[5:].isdigit():
        return f"down_blocks.{p[5:]}"
    if p.startswith("up_") and p[3:].isdigit():
        return f"up_blocks.{p[3:]}"
    if p.startswith("resnet_") and parent.startswith(("down_", "up_")):
        return f"resnets.{p[7:]}"
    if p.startswith("attn_") and p[5:].isdigit():
        return f"attentions.{p[5:]}"
    if p.startswith("block_") and p[6:].isdigit():
        return f"transformer_blocks.{p[6:]}"
    return _UNET_SEGMENT_REWRITES.get(p, p)


def _translate_unet(dirs: tuple[str, ...]) -> str:
    parts = []
    for i, p in enumerate(dirs):
        parent = dirs[i - 1] if i else ""
        parts.append(_unet_segment(parent, p))
    return ".".join(parts)


def convert_diffusion_model_unet(state_dict: dict, params_struct: dict) -> dict:
    """Reference DiffusionModelUNet / DiffusionModelEncoder state_dict -> flax."""
    return convert_state_dict(state_dict, _translate_unet, params_struct)


def convert_diffusion_model_encoder(state_dict: dict, params_struct: dict) -> dict:
    """Reference DiffusionModelEncoder state_dict -> flax params tree.

    Shares the UNet down-path naming, but the classifier head's first
    Linear (reference diffusion_model_unet.py:2072 `out.0`) consumes a
    channels-FIRST flatten of the final (B, C, *spatial) feature map,
    while the flax encoder flattens channels-LAST. The plain Linear
    transpose therefore scrambles input-row order; fix it by permuting
    the `out_0` kernel rows from (C, S) to (S, C) flatten order, where
    C is the deepest down-level's output width (read off the params
    structure) and S the flattened spatial size.
    """
    params = convert_state_dict(state_dict, _translate_unet, params_struct)
    last_down = max(
        (k for k in params if k.startswith("down_") and k[5:].isdigit()),
        key=lambda k: int(k[5:]),
    )
    last_res = max(
        (k for k in params[last_down] if k.startswith("resnet_")),
        key=lambda k: int(k[7:]),
    )
    channels = params[last_down][last_res]["conv2"]["kernel"].shape[-1]
    kernel = params["out_0"]["kernel"]  # rows currently in torch (C*S) order
    rows, width = kernel.shape
    if rows % channels:
        raise ValueError(
            f"out.0 rows {rows} not divisible by final feature width {channels}"
        )
    spatial = rows // channels
    params["out_0"]["kernel"] = np.ascontiguousarray(
        kernel.reshape(channels, spatial, width).transpose(1, 0, 2).reshape(rows, width)
    )
    return params


def _translate_controlnet(dirs: tuple[str, ...]) -> str:
    """ControlNet shares the UNet down/mid naming plus
    controlnet_cond_embedding.{conv_in,blocks.{i},conv_out} and
    controlnet_down_blocks.{i} / controlnet_mid_block zero-convs
    (generative/networks/nets/controlnet.py:196-336)."""
    parts = []
    for i, p in enumerate(dirs):
        parent = dirs[i - 1] if i else ""
        if p.startswith("controlnet_down_") and p[16:].isdigit():
            parts.append(f"controlnet_down_blocks.{p[16:]}")
        elif parent == "controlnet_cond_embedding" and p.startswith("block_"):
            parts.append(f"blocks.{p[6:]}")
        else:
            parts.append(_unet_segment(parent, p))
    return ".".join(parts)


def convert_controlnet(state_dict: dict, params_struct: dict) -> dict:
    return convert_state_dict(state_dict, _translate_controlnet, params_struct)


def _translate_patchgan(dirs: tuple[str, ...]) -> str:
    """Pix2PixHD discriminators: reference child names are `initial_conv`,
    bare layer indices `{l}` (MONAI Convolution with ADN norm child
    `adn.N`), and `final_conv`; MultiScale nests these under
    `discriminator_{i}` (patchgan_discriminator.py:204-246,136)."""
    parts = []
    for p in dirs:
        if p.startswith("layer_") and p[6:].isdigit():
            parts.append(p[6:])
        elif p.startswith("norm_") and p[5:].isdigit():
            parts.append(f"{p[5:]}.adn.N")
        elif p in ("BatchNorm_0", "GroupNorm_0"):
            continue  # flax norm child, folded into the norm_{l} segment above
        else:
            parts.append(p)  # initial_conv / final_conv / discriminator_{i}
    return ".".join(parts)


def convert_patch_discriminator(
    state_dict: dict,
    params_struct: dict,
    batch_stats_struct: dict | None = None,
) -> tuple[dict, dict | None]:
    """Reference PatchDiscriminator / MultiScalePatchDiscriminator
    state_dict -> (flax params, flax batch_stats).

    BatchNorm running statistics live in a separate flax collection;
    convert both trees in one pass so the every-torch-key-consumed check
    still holds across params AND batch_stats.

    When the reference MultiScalePatchDiscriminator uses a pooling_method,
    each pooled sub-discriminator is wrapped in nn.Sequential(*pools, PD)
    (patchgan_discriminator.py:119-134), inserting a parameter-free index
    segment: `discriminator_{i}.{i}.initial_conv...`. Strip it — it is
    distinguishable from a bare layer index because a layer index is
    always followed by `conv`/`adn`, never by another module name.
    """
    stripped = {}
    for key, value in state_dict.items():
        parts = key.split(".")
        if (
            len(parts) >= 3
            and parts[0].startswith("discriminator_")
            and parts[1].isdigit()
            and (parts[2] in ("initial_conv", "final_conv") or parts[2].isdigit())
        ):
            parts.pop(1)
        stripped[".".join(parts)] = value
    state_dict = stripped

    merged = dict(params_struct)
    if batch_stats_struct:
        flat = _flatten(params_struct)
        flat.update(_flatten(batch_stats_struct))
        merged = _unflatten(flat)
    out = convert_state_dict(state_dict, _translate_patchgan, merged)
    if not batch_stats_struct:
        return out, None
    flat_out = _flatten(out)
    params = _unflatten({p: v for p, v in flat_out.items() if p in _flatten(params_struct)})
    stats = _unflatten({p: v for p, v in flat_out.items() if p in _flatten(batch_stats_struct)})
    return params, stats


def convert_spade_diffusion_model_unet(state_dict: dict, params_struct: dict) -> dict:
    """Reference SPADEDiffusionModelUNet state_dict -> flax params tree.

    The SPADE UNet shares the plain UNet's module naming end to end
    (spade_diffusion_model_unet.py:716-834 mirrors
    diffusion_model_unet.py:1771-1867); the only new leaves are the SPADE
    norms inside the up-path resnets (norm1/norm2 -> mlp_shared/mlp_gamma/
    mlp_beta Convolutions + the affine param_free_norm GroupNorm), all
    covered by the shared segment rewrites.
    """
    return convert_state_dict(state_dict, _translate_unet, params_struct)


# ---------------------------------------------------------------------------
# AutoencoderKL translator (flat encoder.blocks.{i} indices)
# ---------------------------------------------------------------------------

def _aekl_block_map(
    num_channels: Sequence[int],
    num_res_blocks: Sequence[int],
    attention_levels: Sequence[bool],
    with_encoder_nonlocal_attn: bool = True,
    with_decoder_nonlocal_attn: bool = True,
) -> dict[tuple[str, str], str]:
    """(side, flax_name) -> torch 'encoder.blocks.{i}' prefix.

    Mirrors the append order of the reference Encoder (:315-453) and
    Decoder (:455-597).
    """
    m: dict[tuple[str, str], str] = {}
    n_levels = len(num_channels)

    idx = 0

    def enc(name):
        nonlocal idx
        m[("encoder", name)] = f"encoder.blocks.{idx}"
        idx += 1

    enc("conv_in")
    for i in range(n_levels):
        for j in range(num_res_blocks[i]):
            enc(f"res_{i}_{j}")
            if attention_levels[i]:
                enc(f"attn_{i}_{j}")
        if i != n_levels - 1:
            enc(f"down_{i}")
    if with_encoder_nonlocal_attn:
        enc("mid_res_1")
        enc("mid_attn")
        enc("mid_res_2")
    enc("norm_out")
    enc("conv_out")

    idx = 0

    def dec(name):
        nonlocal idx
        m[("decoder", name)] = f"decoder.blocks.{idx}"
        idx += 1

    dec("conv_in")
    if with_decoder_nonlocal_attn:
        dec("mid_res_1")
        dec("mid_attn")
        dec("mid_res_2")
    rev_res = list(reversed(list(num_res_blocks)))
    rev_att = list(reversed(list(attention_levels)))
    for i in range(n_levels):
        for j in range(rev_res[i]):
            dec(f"res_{i}_{j}")
            if rev_att[i]:
                dec(f"attn_{i}_{j}")
        if i != n_levels - 1:
            dec(f"up_{i}")
    dec("norm_out")
    dec("conv_out")
    return m


def convert_autoencoderkl(
    state_dict: dict,
    params_struct: dict,
    num_channels: Sequence[int],
    num_res_blocks: Sequence[int] | int,
    attention_levels: Sequence[bool],
    with_encoder_nonlocal_attn: bool = True,
    with_decoder_nonlocal_attn: bool = True,
    use_convtranspose: bool = False,
) -> dict:
    """Reference AutoencoderKL state_dict -> flax params tree."""
    if isinstance(num_res_blocks, int):
        num_res_blocks = (num_res_blocks,) * len(num_channels)
    block_map = _aekl_block_map(
        num_channels,
        num_res_blocks,
        attention_levels,
        with_encoder_nonlocal_attn,
        with_decoder_nonlocal_attn,
    )

    def translate(dirs: tuple[str, ...]) -> str:
        if dirs[0] in ("encoder", "decoder") and len(dirs) >= 2:
            head = block_map[(dirs[0], dirs[1])]
            rest = [_UNET_SEGMENT_REWRITES.get(p, p) for p in dirs[2:]]
            return ".".join([head] + rest)
        return ".".join(dirs)  # quant_conv_mu / quant_conv_log_sigma / post_quant_conv

    tconv_paths = []
    if use_convtranspose:
        rev_res = list(reversed(list(num_res_blocks)))
        for i in range(len(num_channels) - 1):
            tconv_paths.append(("decoder", f"up_{i}", "conv"))
    return convert_state_dict(
        state_dict, translate, params_struct, tconv_paths=tconv_paths
    )


def convert_spade_autoencoderkl(
    state_dict: dict,
    params_struct: dict,
    num_channels: Sequence[int],
    num_res_blocks: Sequence[int] | int,
    attention_levels: Sequence[bool],
    with_encoder_nonlocal_attn: bool = True,
    with_decoder_nonlocal_attn: bool = True,
) -> dict:
    """Reference SPADEAutoencoderKL state_dict -> flax params tree.

    The encoder is the plain AEKL encoder and the decoder keeps the plain
    decoder's flat `decoder.blocks.{i}` append order
    (spade_autoencoderkl.py:188-289), with SPADE res blocks whose inner
    names (norm1/norm2 SPADE towers, conv1/conv2, nin_shortcut) the shared
    segment rewrites already cover; the SPADE base GroupNorm here is
    affine=False (:76) so it contributes no parameters.
    """
    return convert_autoencoderkl(
        state_dict,
        params_struct,
        num_channels=num_channels,
        num_res_blocks=num_res_blocks,
        attention_levels=attention_levels,
        with_encoder_nonlocal_attn=with_encoder_nonlocal_attn,
        with_decoder_nonlocal_attn=with_decoder_nonlocal_attn,
        use_convtranspose=False,
    )


# ---------------------------------------------------------------------------
# SPADENet translator (VAE-GAN; flat encoder/decoder blocks + fc heads)
# ---------------------------------------------------------------------------

def convert_spade_network(
    state_dict: dict,
    params_struct: dict,
    num_channels: Sequence[int],
    input_shape: Sequence[int],
) -> dict:
    """Reference SPADENet (VAE mode) state_dict -> flax params tree.

    Naming (spade_network.py:133-320): encoder.blocks.{i} strided
    Convolutions + encoder.fc_mu/fc_var, decoder.fc, decoder.blocks.{i}
    SPADE ResNet blocks (norm_0/norm_1/norm_s, conv_0/conv_1/conv_s) and
    decoder.last_conv.

    The fc heads need an index permutation, not just a transpose: torch
    flattens the latent feature map channels-first (C, *sp) while the
    channels-last flax net flattens (*sp, C), so fc_mu/fc_var columns and
    decoder.fc rows/bias are re-rayed here before the generic conversion.
    """
    sd = {k: _np(v) for k, v in state_dict.items()}
    n_levels = len(tuple(num_channels))
    latent_sp = tuple(int(s) // (2**n_levels) for s in input_shape)
    c_latent = int(tuple(num_channels)[-1])
    prod_sp = 1
    for s in latent_sp:
        prod_sp *= s

    for key in ("encoder.fc_mu.weight", "encoder.fc_var.weight"):
        if key in sd:
            w = sd[key]  # (z, C * prod_sp), inputs raveled (C, *sp)
            z = w.shape[0]
            w = w.reshape(z, c_latent, prod_sp)
            sd[key] = np.ascontiguousarray(
                np.moveaxis(w, 1, -1).reshape(z, prod_sp * c_latent)
            )
    if "decoder.fc.weight" in sd:
        w = sd["decoder.fc.weight"]  # (C * prod_sp, z), outputs raveled (C, *sp)
        z = w.shape[1]
        sd["decoder.fc.weight"] = np.ascontiguousarray(
            np.moveaxis(w.reshape(c_latent, prod_sp, z), 0, 1).reshape(
                prod_sp * c_latent, z
            )
        )
        b = sd["decoder.fc.bias"]
        sd["decoder.fc.bias"] = np.ascontiguousarray(
            np.moveaxis(b.reshape(c_latent, prod_sp), 0, 1).reshape(-1)
        )

    def translate(dirs: tuple[str, ...]) -> str:
        parts = []
        for p in dirs:
            if p.startswith("block_") and p[6:].isdigit():
                parts.append(f"blocks.{p[6:]}")
            else:
                parts.append(_UNET_SEGMENT_REWRITES.get(p, p))
        return ".".join(parts)

    return convert_state_dict(state_dict=sd, translate=translate, params_struct=params_struct)


# ---------------------------------------------------------------------------
# VQVAE translator (flat encoder/decoder.blocks with DA-ordered Convolutions)
# ---------------------------------------------------------------------------

def convert_vqvae(
    state_dict: dict,
    params_struct: dict,
    num_channels: Sequence[int],
    num_res_layers: int,
) -> tuple[dict, dict]:
    """Reference VQVAE state_dict -> (flax params tree, codebook collection).

    Reference layout (vqvae.py:83-271): encoder.blocks = per-level strided
    Convolution (+ DA adn) then `num_res_layers` VQVAEResidualUnit
    (conv1 w/ DA, conv2 conv_only) per level, final conv_only Convolution
    to embedding_dim; decoder mirrors with transposed convs. The EMA
    codebook state (embedding/ema_cluster_size/ema_w,
    vector_quantizer.py:68-75 here) lives under quantizer.quantizer.* in
    the torch checkpoint and in the flax "codebook" collection here.
    """
    n_levels = len(num_channels)
    block_map: dict[tuple[str, str], str] = {}

    idx = 0
    for i in range(n_levels):
        block_map[("encoder", f"down_{i}")] = f"encoder.blocks.{idx}"
        idx += 1
        for j in range(num_res_layers):
            block_map[("encoder", f"res_{i}_{j}")] = f"encoder.blocks.{idx}"
            idx += 1
    block_map[("encoder", "conv_out")] = f"encoder.blocks.{idx}"

    idx = 0
    block_map[("decoder", "conv_in")] = f"decoder.blocks.{idx}"
    idx += 1
    for i in range(n_levels):
        for j in range(num_res_layers):
            block_map[("decoder", f"res_{i}_{j}")] = f"decoder.blocks.{idx}"
            idx += 1
        block_map[("decoder", f"up_{i}")] = f"decoder.blocks.{idx}"
        idx += 1

    def translate(dirs: tuple[str, ...]) -> str:
        if dirs[0] in ("encoder", "decoder") and len(dirs) >= 2:
            head = block_map[(dirs[0], dirs[1])]
            rest = list(dirs[2:])
            return ".".join([head] + rest)
        return ".".join(dirs)

    tconv_paths = [("decoder", f"up_{i}") for i in range(n_levels)]
    codebook_keys = {
        "quantizer.quantizer.embedding.weight": "embedding",
        "quantizer.quantizer.ema_cluster_size": "ema_cluster_size",
        "quantizer.quantizer.ema_w": "ema_w",
    }
    params = convert_state_dict(
        state_dict,
        translate,
        params_struct,
        tconv_paths=tconv_paths,
        ignore_torch_keys=list(codebook_keys),
    )
    codebook_leaves = {
        leaf: np.ascontiguousarray(_np(state_dict[k]), dtype=np.float32)
        for k, leaf in codebook_keys.items()
        if k in state_dict
    }
    missing = set(codebook_keys.values()) - set(codebook_leaves)
    if missing:
        raise KeyError(f"VQVAE checkpoint missing codebook state: {sorted(missing)}")
    codebook = {"quantizer": {"quantizer": codebook_leaves}}
    return params, codebook


# ---------------------------------------------------------------------------
# DecoderOnlyTransformer translator
# ---------------------------------------------------------------------------

def convert_transformer(state_dict: dict, params_struct: dict) -> dict:
    """Reference DecoderOnlyTransformer state_dict -> flax params tree.

    Reference layout (transformer.py:42-106): token_embeddings (Embedding),
    position_embeddings.embedding (Embedding inside
    AbsolutePositionalEmbedding), blocks.{i}.{norm1,attn,norm2,cross_attn,
    norm3,mlp}, to_logits (Linear). SABlock children are to_q/to_k/to_v +
    out_proj (selfattention.py:80-89); MLP is MONAI MLPBlock
    (linear1/linear2).
    """
    def translate(dirs: tuple[str, ...]) -> str:
        parts = []
        for p in dirs:
            if p.startswith("block_") and p[6:].isdigit():
                parts.append(f"blocks.{p[6:]}")
            else:
                parts.append(p)
        return ".".join(parts)

    return convert_state_dict(state_dict, translate, params_struct)


# ---------------------------------------------------------------------------
# one-call checkpoint loading (bundle integration)
# ---------------------------------------------------------------------------

def _load_torch_state_dict(path: str) -> dict:
    """Load a torch .pt/.pth checkpoint (or numpy .npz) into a flat dict,
    unwrapping {"state_dict": ...} containers and DDP "module." prefixes."""
    if str(path).endswith(".npz"):
        with np.load(path) as f:
            obj = {k: f[k] for k in f.files}
    else:
        import torch

        obj = torch.load(path, map_location="cpu", weights_only=True)
    if isinstance(obj, dict) and "state_dict" in obj and isinstance(obj["state_dict"], dict):
        obj = obj["state_dict"]
    return {
        (k[len("module."):] if k.startswith("module.") else k): v
        for k, v in obj.items()
    }


def _default_example_args(model):
    """Minimal valid example inputs for `model.init` shape inference."""
    import jax.numpy as jnp

    name = type(model).__name__
    if name in ("DiffusionModelUNet", "DiffusionModelEncoder", "ControlNet"):
        n_levels = len(tuple(model.num_channels))
        size = 2 ** max(n_levels, 2)
        sp = (size,) * model.spatial_dims
        x = jnp.zeros((1, model.in_channels, *sp))
        t = jnp.zeros((1,), jnp.int32)
        args = [x, t]
        if name == "ControlNet":
            args.append(jnp.zeros((1, model.conditioning_embedding_in_channels, *sp)))
        if getattr(model, "with_conditioning", False):
            args.append(jnp.zeros((1, 4, model.cross_attention_dim)))
        if getattr(model, "num_class_embeds", None):
            while len(args) < (4 if name == "ControlNet" else 3):
                args.append(None)
            args.append(jnp.zeros((1,), jnp.int32))
        return tuple(args), {}
    if name in ("AutoencoderKL", "VQVAE"):
        n_levels = len(tuple(model.num_channels))
        size = 2 ** max(n_levels + 1, 3)
        sp = (size,) * model.spatial_dims
        return (jnp.zeros((1, model.in_channels, *sp)),), {}
    if name == "PatchDiscriminator":
        size = 2 ** (model.num_layers_d + 2)
        sp = (size,) * model.spatial_dims
        return (jnp.zeros((1, model.in_channels, *sp)),), {}
    if name == "MultiScalePatchDiscriminator":
        if isinstance(model.num_layers_d, int):
            deepest = (
                model.num_layers_d * model.num_d
                if model.pooling_method is None
                else model.num_layers_d + model.num_d - 1
            )
        else:
            deepest = max(model.num_layers_d) + model.num_d - 1
        size = 2 ** (deepest + 2)
        sp = (size,) * model.spatial_dims
        return (jnp.zeros((1, model.in_channels, *sp)),), {}
    if name == "DecoderOnlyTransformer":
        args = [jnp.zeros((1, model.max_seq_len), jnp.int32)]
        if model.with_cross_attention:
            args.append(jnp.zeros((1, 4, model.attn_layers_dim)))
        return tuple(args), {}
    if name == "SPADEDiffusionModelUNet":
        n_levels = len(tuple(model.num_channels))
        size = 2 ** max(n_levels, 2)
        sp = (size,) * model.spatial_dims
        x = jnp.zeros((1, model.in_channels, *sp))
        t = jnp.zeros((1,), jnp.int32)
        seg = jnp.zeros((1, model.label_nc, *sp))
        kwargs = {}
        if getattr(model, "with_conditioning", False):
            kwargs["context"] = jnp.zeros((1, 4, model.cross_attention_dim))
        if getattr(model, "num_class_embeds", None):
            kwargs["class_labels"] = jnp.zeros((1,), jnp.int32)
        return (x, t, seg), kwargs
    if name == "SPADEAutoencoderKL":
        n_levels = len(tuple(model.num_channels))
        size = 2 ** max(n_levels + 1, 3)
        sp = (size,) * model.spatial_dims
        x = jnp.zeros((1, model.in_channels, *sp))
        seg = jnp.zeros((1, model.label_nc, *sp))
        return (x, seg), {}
    if name == "SPADENet":
        sp = tuple(model.input_shape)
        seg = jnp.zeros((1, model.label_nc, *sp))
        x = jnp.zeros((1, model.in_channels, *sp))
        return ((seg, x) if model.is_vae else (seg,)), {}
    raise NotImplementedError(f"no converter wired for {name}")


def load_reference_checkpoint(checkpoint, model, example_args=None):
    """Reference torch checkpoint -> flax variables for a TPU-native model.

    The bundle-compat path: instantiate the model from an unmodified
    reference bundle config (config/bundle_compat.py), then load the
    bundle's published torch checkpoint
    (e.g. model-zoo/models/brain_image_synthesis_latent_diffusion_model/
    large_files.yml weights) directly::

        unet = parser.resolve("network_def")
        variables = load_reference_checkpoint("models/model.pt", unet)
        out = unet.apply(variables, x, t)

    Args:
        checkpoint: path to a .pt/.pth/.npz file, or an in-memory
            state_dict.
        model: the flax module instance the weights target.
        example_args: optional explicit example inputs for shape
            inference (auto-derived from the model config if omitted).

    Returns:
        flax variables dict: {"params": ...} (+ {"codebook": ...} for
        VQVAE).
    """
    import jax as _jax

    sd = (
        checkpoint
        if isinstance(checkpoint, dict)
        else _load_torch_state_dict(checkpoint)
    )
    name = type(model).__name__
    if example_args is None:
        args, kwargs = _default_example_args(model)
    else:
        args, kwargs = tuple(example_args), {}
    rngs = {"params": _jax.random.PRNGKey(0), "sampling": _jax.random.PRNGKey(0)}

    if name in ("PatchDiscriminator", "MultiScalePatchDiscriminator"):
        # discriminators carry BatchNorm running stats in a separate
        # collection; derive params from the full variables tree instead of
        # paying a second jax.eval_shape of model.init
        variables = variables_structure(model, *args, rngs=rngs, **kwargs)
        params, stats = convert_patch_discriminator(
            sd, variables["params"], variables.get("batch_stats")
        )
        return {"params": params} if stats is None else {
            "params": params,
            "batch_stats": stats,
        }

    struct = params_structure(model, *args, rngs=rngs, **kwargs)

    if name == "DiffusionModelUNet":
        return {"params": convert_diffusion_model_unet(sd, struct)}
    if name == "DiffusionModelEncoder":
        return {"params": convert_diffusion_model_encoder(sd, struct)}
    if name == "ControlNet":
        return {"params": convert_controlnet(sd, struct)}
    if name == "AutoencoderKL":
        num_channels = tuple(model.num_channels)
        return {
            "params": convert_autoencoderkl(
                sd,
                struct,
                num_channels=num_channels,
                num_res_blocks=model.num_res_blocks,
                attention_levels=tuple(model.attention_levels),
                with_encoder_nonlocal_attn=model.with_encoder_nonlocal_attn,
                with_decoder_nonlocal_attn=model.with_decoder_nonlocal_attn,
                use_convtranspose=model.use_convtranspose,
            )
        }
    if name == "VQVAE":
        params, codebook = convert_vqvae(
            sd,
            struct,
            num_channels=tuple(model.num_channels),
            num_res_layers=model.num_res_layers,
        )
        return {"params": params, "codebook": codebook}
    if name == "DecoderOnlyTransformer":
        return {"params": convert_transformer(sd, struct)}
    if name == "SPADEDiffusionModelUNet":
        return {"params": convert_spade_diffusion_model_unet(sd, struct)}
    if name == "SPADEAutoencoderKL":
        return {
            "params": convert_spade_autoencoderkl(
                sd,
                struct,
                num_channels=tuple(model.num_channels),
                num_res_blocks=model.num_res_blocks,
                attention_levels=tuple(model.attention_levels),
                with_encoder_nonlocal_attn=model.with_encoder_nonlocal_attn,
                with_decoder_nonlocal_attn=model.with_decoder_nonlocal_attn,
            )
        }
    if name == "SPADENet":
        return {
            "params": convert_spade_network(
                sd,
                struct,
                num_channels=tuple(model.num_channels),
                input_shape=tuple(model.input_shape),
            )
        }
    raise NotImplementedError(f"no converter wired for {name}")
