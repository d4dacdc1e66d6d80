"""Fused GN-apply/SiLU -> 3x3x3 conv -> bias/residual Pallas kernel (inference).

The round-2 on-chip profile of 3D 128^3 DDIM sampling
(benchmarks/results_3d_profile.json) puts ~43% of device time in
elementwise/reduce fusions — the GroupNorm-apply/SiLU chains feeding each
ResNet-block convolution, the depth-tap partial-sum adds of the
decomposed conv (`networks/blocks/convolutions.py _conv3d_via_2d`), and
the residual adds — each an unavoidable HBM round trip at the XLA level
(re-associating the taps cannot help: see docs/PERFORMANCE.md "Probe
results", input_fold). This kernel collapses the whole chain

    y = conv3x3x3(silu(x * scale + shift)) [+ bias] [+ residual]

into ONE pass over HBM: normalized planes, the implicit-GEMM tap
accumulation and the epilogue all live in VMEM. `scale`/`shift` are the
per-(batch, channel) affine folded from the GroupNorm statistics (and
optionally the timestep embedding) by the caller — see
`fold_groupnorm_affine`.

Forward-only by design: sampling is the target (training keeps the XLA
path, whose backward is tested in tests/test_ops.py). The reference
counterpart of the op chain is generative/networks/nets/
diffusion_model_unet.py:700-741 (ResnetBlock.forward).

Layout: channels-last (B, D, H, W, C); stride 1, padding 1, kernel 3
(the ResNet-block conv shape). Grid is (B, D_out): each program computes
one full output depth plane from the three depth-tap input planes, which
arrive as three views of `x` whose index maps are clamped at the volume
boundary (the kernel zeroes the out-of-range taps).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _mm_dtype(dtype) -> jnp.dtype:
    return jnp.bfloat16 if dtype == jnp.bfloat16 else jnp.float32


def fold_groupnorm_affine(
    x: jnp.ndarray,
    gamma: jnp.ndarray,
    beta: jnp.ndarray,
    num_groups: int,
    eps: float = 1e-6,
    temb: jnp.ndarray | None = None,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Fold GroupNorm stats (+ optional pre-norm channel bias) into a
    per-(batch, channel) affine: normalize(x + temb) == x*scale + shift.

    x: (B, *spatial, C) channels-last. temb: (B, C) added to x *before*
    the statistics (the ResNet block's time-embedding injection). The
    returned scale/shift are (B, C); the x itself is NOT consumed beyond
    one cheap statistics reduce (per-channel moments), which is the only
    HBM pass left outside the fused kernel.
    """
    b, c = x.shape[0], x.shape[-1]
    red = tuple(range(1, x.ndim - 1))
    n_sp = 1
    for s in x.shape[1:-1]:
        n_sp *= s
    mean_c = jnp.mean(x, axis=red, dtype=jnp.float32)          # (B, C)
    msq_c = jnp.mean(
        jnp.square(x.astype(jnp.float32)), axis=red, dtype=jnp.float32
    )
    if temb is not None:
        t = temb.astype(jnp.float32)
        msq_c = msq_c + 2.0 * t * mean_c + jnp.square(t)
        mean_c = mean_c + t
    g = num_groups
    mean_g = jnp.mean(mean_c.reshape(b, g, c // g), axis=-1)    # (B, G)
    msq_g = jnp.mean(msq_c.reshape(b, g, c // g), axis=-1)
    var_g = msq_g - jnp.square(mean_g)
    rstd_g = jax.lax.rsqrt(var_g + eps)
    rstd_c = jnp.repeat(rstd_g, c // g, axis=-1)                # (B, C)
    mu_c = jnp.repeat(mean_g, c // g, axis=-1)
    gamma = gamma.astype(jnp.float32)[None]
    beta = beta.astype(jnp.float32)[None]
    scale = gamma * rstd_c
    shift = beta - mu_c * scale
    if temb is not None:
        # kernel computes x*scale + shift on the raw x; the temb offset
        # folds into the shift
        shift = shift + temb.astype(jnp.float32) * scale
    return scale, shift


def _kernel(
    xm_ref, x0_ref, xp_ref, w_ref, scale_ref, shift_ref, bias_ref, res_ref,
    o_ref, pad_ref, acc_ref,
    *, depth, rows_per_chunk, has_residual, apply_act,
):
    d = pl.program_id(1)
    h, wd, cin = x0_ref.shape[2], x0_ref.shape[3], x0_ref.shape[4]
    cout = o_ref.shape[4]
    mm = _mm_dtype(x0_ref.dtype)

    scale = scale_ref[0].astype(jnp.float32)   # (Cin,)
    shift = shift_ref[0].astype(jnp.float32)

    # prologue: normalize + SiLU each depth-tap plane, zero out-of-range
    # taps, and write into the zero-padded scratch (3, H+2, W+2, Cin).
    # Chunked over rows so the f32 temporaries stay O(chunk), not O(plane)
    # (whole-plane chains overflow the ~16 MB VMEM scoped allocation).
    pad_ref[...] = jnp.zeros_like(pad_ref)

    def norm_chunk(ci, _):
        r0 = ci * rows_per_chunk
        for t, ref in enumerate((xm_ref, x0_ref, xp_ref)):
            p = ref[0, 0, pl.ds(r0, rows_per_chunk)].astype(jnp.float32)
            if apply_act:
                p = p * scale + shift
                p = p * jax.nn.sigmoid(p)
            src_d = d + t - 1
            valid = jnp.logical_and(src_d >= 0, src_d <= depth - 1)
            p = jnp.where(valid, p, 0.0)
            pad_ref[t, pl.ds(1 + r0, rows_per_chunk), 1 : wd + 1, :] = p.astype(
                pad_ref.dtype
            )
        return 0

    jax.lax.fori_loop(0, h // rows_per_chunk, norm_chunk, 0)

    # implicit GEMM over row chunks: im2col (R*W, 9*Cin) @ (9*Cin, Cout)
    num_chunks = h // rows_per_chunk
    w_flat = w_ref[...].astype(mm)             # (3, 9*Cin, Cout)

    def chunk_body(ci, _):
        r0 = ci * rows_per_chunk
        acc_ref[...] = jnp.zeros_like(acc_ref)
        for t in range(3):
            cols = []
            for dh in range(3):
                for dw in range(3):
                    sl = pad_ref[t, pl.ds(r0 + dh, rows_per_chunk), dw : dw + wd, :]
                    cols.append(sl.reshape(rows_per_chunk * wd, cin))
            col = jnp.concatenate(cols, axis=1).astype(mm)
            acc_ref[...] += jax.lax.dot_general(
                col, w_flat[t], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        out = acc_ref[...]
        out = out + bias_ref[0].astype(jnp.float32)
        if has_residual:
            out = out + res_ref[0, 0, pl.ds(r0, rows_per_chunk)].astype(
                jnp.float32
            ).reshape(rows_per_chunk * wd, cout)
        o_ref[0, 0, pl.ds(r0, rows_per_chunk)] = out.reshape(
            rows_per_chunk, wd, cout
        ).astype(o_ref.dtype)
        return 0

    jax.lax.fori_loop(0, num_chunks, chunk_body, 0)


def _xla_equivalent(x, w, scale, shift, bias, residual, apply_act):
    """The same op chain in plain XLA ops (drives the custom VJP backward)."""
    xf = x.astype(jnp.float32)
    if apply_act:
        nd = x.ndim - 2
        sc = scale.reshape(scale.shape[0], *([1] * nd), scale.shape[-1])
        sh = shift.reshape(shift.shape[0], *([1] * nd), shift.shape[-1])
        xf = xf * sc + sh
        xf = xf * jax.nn.sigmoid(xf)
    y = jax.lax.conv_general_dilated(
        xf.astype(x.dtype), w.astype(x.dtype), (1, 1, 1), [(1, 1)] * 3,
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
    ).astype(jnp.float32)
    y = y + bias.astype(jnp.float32)
    if residual is not None:
        y = y + residual.astype(jnp.float32)
    return y.astype(x.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7))
def _fused(x, w, scale, shift, bias, residual, apply_act, interpret):
    return _fused_impl(x, w, scale, shift, bias, residual, apply_act, interpret)


def _fused_fwd(x, w, scale, shift, bias, residual, apply_act, interpret):
    out = _fused_impl(x, w, scale, shift, bias, residual, apply_act, interpret)
    return out, (x, w, scale, shift, bias, residual)


def _fused_bwd(apply_act, interpret, res, dout):
    """Backward recomputes through the XLA composition — correct but not
    tuned; training keeps the standard XLA path (this kernel targets the
    sampling loop)."""
    x, w, scale, shift, bias, residual = res
    if residual is None:
        f = lambda x, w, scale, shift, bias: _xla_equivalent(
            x, w, scale, shift, bias, None, apply_act
        )
        _, vjp = jax.vjp(f, x, w, scale, shift, bias)
        return (*vjp(dout), None)
    f = lambda x, w, scale, shift, bias, residual: _xla_equivalent(
        x, w, scale, shift, bias, residual, apply_act
    )
    _, vjp = jax.vjp(f, x, w, scale, shift, bias, residual)
    return vjp(dout)


_fused.defvjp(_fused_fwd, _fused_bwd)


def fused_norm_silu_conv3d(
    x: jnp.ndarray,
    w: jnp.ndarray,
    scale: jnp.ndarray,
    shift: jnp.ndarray,
    bias: jnp.ndarray | None = None,
    residual: jnp.ndarray | None = None,
    *,
    apply_act: bool = True,
    interpret: bool = False,
) -> jnp.ndarray:
    """conv3x3x3(silu(x*scale + shift)) [+ bias] [+ residual], one HBM pass.

    Args:
        x: (B, D, H, W, Cin) channels-last input.
        w: (3, 3, 3, Cin, Cout) kernel (stride 1, padding 1).
        scale, shift: (B, Cin) folded GroupNorm affine
            (`fold_groupnorm_affine`); ignored when `apply_act=False`.
        bias: (Cout,) conv bias (zeros if None).
        residual: optional (B, D, H, W, Cout) tensor added to the output.
        apply_act: disable the normalize+SiLU prologue (plain conv).
        interpret: run in interpreter mode (CPU tests).

    Returns:
        (B, D, H, W, Cout) in x.dtype.
    """
    kd, kh, kw, wc_in, cout = w.shape
    if (kd, kh, kw) != (3, 3, 3) or wc_in != x.shape[-1]:
        raise ValueError(f"expected (3,3,3,{x.shape[-1]},*) kernel, got {w.shape}")
    if bias is None:
        bias = jnp.zeros((cout,), jnp.float32)
    return _fused(x, w, scale, shift, bias, residual, apply_act, interpret)


def _fused_impl(x, w, scale, shift, bias, residual, apply_act, interpret):
    b, d, h, wd, cin = x.shape
    cout = w.shape[-1]

    # row chunk: target ~2048 pixels per GEMM, divisor of H
    rows = max(1, min(h, 2048 // wd))
    while h % rows:
        rows -= 1

    # tap order: output[d] = w[0]*x[d-1] + w[1]*x[d] + w[2]*x[d+1]
    w_flat = w.reshape(3, 9 * cin, cout)

    has_residual = residual is not None
    inputs = [x, x, x, w_flat, scale, shift, bias.reshape(1, cout)]
    in_specs = [
        pl.BlockSpec((1, 1, h, wd, cin),
                     lambda bi, di: (bi, jnp.maximum(di - 1, 0), 0, 0, 0)),
        pl.BlockSpec((1, 1, h, wd, cin), lambda bi, di: (bi, di, 0, 0, 0)),
        pl.BlockSpec((1, 1, h, wd, cin),
                     lambda bi, di: (bi, jnp.minimum(di + 1, d - 1), 0, 0, 0)),
        pl.BlockSpec((3, 9 * cin, cout), lambda bi, di: (0, 0, 0)),
        pl.BlockSpec((1, cin), lambda bi, di: (bi, 0)),
        pl.BlockSpec((1, cin), lambda bi, di: (bi, 0)),
        pl.BlockSpec((1, cout), lambda bi, di: (0, 0)),
    ]
    if has_residual:
        inputs.append(residual)
        in_specs.append(
            pl.BlockSpec((1, 1, h, wd, cout), lambda bi, di: (bi, di, 0, 0, 0))
        )
    else:  # dummy placeholder so the kernel signature is static
        inputs.append(jnp.zeros((1, 1, 1, 1, cout), x.dtype))
        in_specs.append(
            pl.BlockSpec((1, 1, 1, 1, cout), lambda bi, di: (0, 0, 0, 0, 0))
        )

    kernel = functools.partial(
        _kernel, depth=d, rows_per_chunk=rows, has_residual=has_residual,
        apply_act=apply_act,
    )
    pad_dtype = _mm_dtype(x.dtype)
    out = pl.pallas_call(
        kernel,
        grid=(b, d),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, 1, h, wd, cout),
                               lambda bi, di: (bi, di, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, d, h, wd, cout), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((3, h + 2, wd + 2, cin), pad_dtype),
            pltpu.VMEM((rows * wd, cout), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(*inputs)
    return out
