"""N-D convolution wrappers, channels-last, with torch-style padding arithmetic.

These provide the subset of MONAI `Convolution` behavior the reference
actually uses (conv_only, strides, dilation, transposed, explicit symmetric
padding) — see SURVEY.md §7. Internally everything is channels-last
(B, *spatial, C), the native TPU layout; the public model classes transpose
once at their boundary.

Torch-parity note: strided convs use *explicit* padding tuples rather than
XLA 'SAME' so output placement matches torch's floor((n + 2p - k)/s) + 1
arithmetic (relevant for stride-2 downsampling on even sizes).
"""
from __future__ import annotations

import os
from collections.abc import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
from jax import lax


def _tuple(v, n: int) -> tuple:
    if isinstance(v, (list, tuple)):
        if len(v) != n:
            raise ValueError(f"expected length-{n} tuple, got {v}")
        return tuple(v)
    return (v,) * n


def _conv3d_via_2d(x, w, strides, pads):
    """3x3x3-style conv as a sum of depth-tap batched 2D convs.

    XLA:TPU's native 3D convolution runs far below the MXU roofline at
    UNet shapes (benchmarks/results_conv3d_probe.json: 6.2% of bf16 peak
    at 128^3 C=32, vs 22.5% for this decomposition — 3.6x; every probed
    level is faster). Depth is folded into the batch so each tap is a
    mature 2D conv; taps accumulate into the output.

    x: (B, D, H, W, Cin); w: (KD, KH, KW, Cin, Cout); strides/pads are
    3-tuples of ints (symmetric torch-style padding). dilation 1 only.
    """
    b, d_in, h, wd, cin = x.shape
    kd, kh, kw, _, cout = w.shape
    sd, sh, sw = strides
    pd, ph, pw = pads
    d_out = (d_in + 2 * pd - kd) // sd + 1
    pad2 = [(ph, ph), (pw, pw)]

    if sd == 1:
        # Unit depth stride: every tap convolves the SAME (unshifted)
        # input, and the depth shift moves to the output accumulation,
        # where XLA fuses the pad/slice into the add fusion. The
        # input-side formulation below instead materialises a padded
        # copy of the whole volume per boundary tap (the `%pad` ops at
        # 2.5% of the 3D sampling profile, results_3d_hlo_profile.json).
        dn = lax.conv_dimension_numbers(
            (b * d_in, h, wd, cin), (kh, kw, cin, cout), ("NHWC", "HWIO", "NHWC")
        )
        xb = x.reshape(b * d_in, h, wd, cin)
        y = None
        for t in range(kd):
            z = lax.conv_general_dilated(
                xb, w[t], (sh, sw), pad2, dimension_numbers=dn
            )
            z = z.reshape(b, d_in, *z.shape[1:])
            # y[do] += c_t[do + off] wherever that index is in range
            off = t - pd
            do_start = max(0, -off)
            do_end = min(d_out, d_in - off)
            z = z[:, do_start + off : do_end + off]
            lo, hi = do_start, d_out - do_end
            if lo or hi:
                z = jnp.pad(z, ((0, 0), (lo, hi), (0, 0), (0, 0), (0, 0)))
            y = z if y is None else y + z
        return y

    # strided depth (downsamplers): each tap reads the input planes
    # idx = sd*do + (t - pd). XLA lowers a strided depth slice of the
    # depth-minor layout as a serial dynamic-update-slice loop at ~37 GB/s
    # (three of them = 4.3% of 3D sample time, results_3d_hlo_profile.json),
    # so when sd divides d_in we split the volume ONCE into its sd depth
    # parities (one relayout pass) and every tap becomes a contiguous
    # shifted slice of one parity: measured 2.7x on the 128^3 lvl0
    # downsampler (6.75 -> 2.52 ms).
    dn = lax.conv_dimension_numbers(
        (b, h, wd, cin), (kh, kw, cin, cout), ("NHWC", "HWIO", "NHWC")
    )
    groups = None
    if d_in % sd == 0:
        xr = x.reshape(b, d_in // sd, sd, h, wd, cin)
        xr = xr.transpose(0, 2, 1, 3, 4, 5)  # (b, sd, d_in/sd, h, w, c)
        groups = [xr[:, r] for r in range(sd)]
    y = None
    for t in range(kd):
        off = t - pd  # input depth index feeding output `do` is sd*do + off
        if groups is not None:
            q, r = divmod(off, sd)  # idx = sd*(do + q) + r -> parity r
            do_start = max(0, -q)
            do_end = min(d_out, d_in // sd - q)
            n = do_end - do_start
            xt = groups[r][:, do_start + q : do_end + q]
        else:
            do_start = max(0, -(off // sd))  # ceil(-off / sd) via floor division
            do_end = min(d_out, (d_in - 1 - off) // sd + 1)
            n = do_end - do_start
            start = sd * do_start + off
            xt = x[:, start : start + sd * (n - 1) + 1 : sd]
        z = lax.conv_general_dilated(
            xt.reshape(b * n, h, wd, cin), w[t], (sh, sw), pad2,
            dimension_numbers=dn,
        )
        z = z.reshape(b, n, *z.shape[1:])
        lo, hi = do_start, d_out - do_end
        if lo or hi:
            z = jnp.pad(z, ((0, 0), (lo, hi), (0, 0), (0, 0), (0, 0)))
        y = z if y is None else y + z
    return y


# per-axis kernel transform for conv3(pad 1) of a nearest-x2 upsample:
# out[2i]   = w0*x[i-1] + (w1+w2)*x[i]
# out[2i+1] = (w0+w1)*x[i] + w2*x[i+1]
# == transposed conv, stride 2, K=4, P=1 with taps [w0, w0+w1, w1+w2, w2]
_UPSAMPLE_TAPS = ((1.0, 0, 0), (1, 1, 0), (0, 1, 1), (0, 0, 1))


def _upsample_conv3d(x, w):
    """conv3^3(pad 1, stride 1) of nearest-x2-upsampled x, from low-res x.

    Lowered as ONE native 3D transposed conv (stride 2, K=4, P=1) with the
    per-axis-transformed kernel: never materialises the 8x upsampled
    volume (a 2.7%-of-sample-time 256 MB broadcast at 128^3,
    results_3d_hlo_profile.json) and runs the matmuls at low resolution.
    The native lowering beats a depth-tap 2D decomposition here because
    the decomposition's phase interleave costs two extra 256 MB
    passes in model context (stack + relayout copy), while XLA emits the
    lhs-dilated native tconv straight into the consumer's layout
    (benchmarks/results_upsample_conv.json: 3.79/0.22 ms vs
    upsample+decomposed-conv 7.62/1.57 ms at the two decoder shapes).
    Exact in f32 (1e-6); bf16 differs only in accumulation order.
    """
    t4 = jnp.asarray(_UPSAMPLE_TAPS, jnp.float32)
    w4 = jnp.einsum(
        "pu,qv,rw,uvwco->pqrco", t4, t4, t4, w.astype(jnp.float32)
    ).astype(w.dtype)
    dn = lax.conv_dimension_numbers(x.shape, w4.shape, ("NDHWC", "DHWIO", "NDHWC"))
    # lo pad = K-1-P = 2 per axis (lax.conv_transpose does not flip kernels)
    return lax.conv_transpose(
        x, w4, strides=(2, 2, 2), padding=[(2, 2)] * 3, dimension_numbers=dn
    )


def _decompose_gate(n: int, symmetric: bool, d: tuple, override: bool | None) -> bool:
    """Shared decompose-vs-native gate (GMTPU_DECOMPOSE_3D=always|never|auto)."""
    eligible = n == 3 and symmetric and d == (1, 1, 1)
    if override is not None:
        if override and not eligible:
            raise ValueError(
                "decompose_3d=True requires a 3D conv with symmetric padding "
                f"and no dilation; got spatial_dims={n}, symmetric={symmetric}, "
                f"dilation={d}"
            )
        return override
    env = os.environ.get("GMTPU_DECOMPOSE_3D", "auto")
    if env == "always":
        return eligible
    if env == "never":
        return False
    return eligible and jax.default_backend() == "tpu"


class ConvND(nn.Module):
    """Channels-last convolution over `spatial_dims` spatial axes.

    Owns its `kernel`/`bias` parameters (no nested flax Conv) so the
    parameter tree is identical whichever lowering runs underneath.

    Args:
        spatial_dims: 1, 2 or 3.
        features: output channels.
        kernel_size: int or per-axis tuple.
        strides: int or per-axis tuple.
        padding: int or per-axis tuple of symmetric padding (torch-style).
        dilation: int or per-axis tuple.
        use_bias: add a bias term.
        zero_init: initialise kernel (and bias) to zero — used for the
            zero-modules of diffusion nets (reference zero_module,
            diffusion_model_unet.py:63-69).
        decompose_3d: lower 3D convs as depth-tap batched 2D convs
            (see _conv3d_via_2d). None = auto: on for TPU backends when
            the geometry allows; False forces the native lowering.
        nearest_upsample: logically upsample the input x2
            (nearest-neighbour) before convolving. On the decomposed 3D
            path with k=3/s=1/p=1 this fuses into a transposed conv that
            never materialises the upsampled volume (_upsample_conv3d);
            otherwise it falls back to `upsample_nearest` + conv. The
            parameter tree is identical either way.
    """

    spatial_dims: int
    features: int
    kernel_size: int | Sequence[int] = 3
    strides: int | Sequence[int] = 1
    padding: int | Sequence[int] | str = 0
    dilation: int | Sequence[int] = 1
    use_bias: bool = True
    zero_init: bool = False
    dtype: jnp.dtype | None = None
    decompose_3d: bool | None = None
    nearest_upsample: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        n = self.spatial_dims
        k = _tuple(self.kernel_size, n)
        s = _tuple(self.strides, n)
        d = _tuple(self.dilation, n)
        kernel_init = nn.initializers.zeros if self.zero_init else nn.initializers.lecun_normal()
        kernel = self.param(
            "kernel", kernel_init, (*k, x.shape[-1], self.features), jnp.float32
        )
        bias = (
            self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
            if self.use_bias
            else None
        )
        # match flax nn.Conv dtype promotion: with dtype=None, bf16 inputs
        # are promoted to the f32 parameter dtype, not the other way round
        dtype = self.dtype or jnp.promote_types(x.dtype, kernel.dtype)
        x = x.astype(dtype)
        kernel = kernel.astype(dtype)

        symmetric = not isinstance(self.padding, str)
        pads = _tuple(self.padding, n) if symmetric else None
        decompose = _decompose_gate(n, symmetric, d, self.decompose_3d)

        if self.nearest_upsample:
            fuse = (
                decompose
                and k == (3, 3, 3)
                and s == (1, 1, 1)
                and pads == (1, 1, 1)
            )
            if fuse:
                y = _upsample_conv3d(x, kernel)
                if bias is not None:
                    y = y + bias.astype(y.dtype)
                return y
            x = upsample_nearest(x, 2)

        if decompose:
            if n != 3 or not symmetric or d != (1, 1, 1):
                raise ValueError(
                    "decompose_3d requires spatial_dims=3, symmetric int "
                    "padding and dilation 1"
                )
            y = _conv3d_via_2d(x, kernel, s, pads)
        else:
            padding = [(p, p) for p in pads] if symmetric else self.padding
            dn = lax.conv_dimension_numbers(x.shape, kernel.shape, _dim_numbers(n))
            y = lax.conv_general_dilated(
                x, kernel, s, padding, rhs_dilation=d, dimension_numbers=dn
            )
        if bias is not None:
            y = y + bias.astype(y.dtype)
        return y


class ConvTransposeND(nn.Module):
    """Channels-last transposed convolution with torch output arithmetic.

    Output size per axis: (n-1)*stride - 2*padding + dilation*(k-1) + 1
    + output_padding, matching torch.nn.ConvTranspose{1,2,3}d (used by the
    VQVAE decoder, reference vqvae.py:173-271).
    """

    spatial_dims: int
    features: int
    kernel_size: int | Sequence[int] = 3
    strides: int | Sequence[int] = 1
    padding: int | Sequence[int] = 0
    output_padding: int | Sequence[int] = 0
    dilation: int | Sequence[int] = 1
    use_bias: bool = True
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        n = self.spatial_dims
        k = _tuple(self.kernel_size, n)
        s = _tuple(self.strides, n)
        p = _tuple(self.padding, n)
        op = _tuple(self.output_padding, n)
        d = _tuple(self.dilation, n)

        in_features = x.shape[-1]
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (*k, in_features, self.features),
            jnp.float32,
        )
        # native 3D transposed conv: XLA's lhs-dilated lowering measures
        # within 5% of a depth-tap 2D decomposition in isolation and wins
        # in model context, where the decomposition's phase interleave
        # costs extra whole-volume relayout passes (see _upsample_conv3d)
        # lax.conv_transpose with explicit padding: torch's semantics are
        # pad_lo = dilation*(k-1) - padding, pad_hi = pad_lo + output_padding
        pad = [
            (d[i] * (k[i] - 1) - p[i], d[i] * (k[i] - 1) - p[i] + op[i])
            for i in range(n)
        ]
        dn = lax.conv_dimension_numbers(x.shape, kernel.shape, _dim_numbers(n))
        y = lax.conv_transpose(
            x.astype(self.dtype or x.dtype),
            kernel.astype(self.dtype or x.dtype),
            strides=s,
            padding=pad,
            rhs_dilation=d,
            dimension_numbers=dn,
        )
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
            y = y + bias.astype(y.dtype)
        return y


def _dim_numbers(n: int) -> tuple[str, str, str]:
    sp = "DHW"[-n:]
    return (f"N{sp}C", f"{sp}IO", f"N{sp}C")


def avg_pool(x: jnp.ndarray, window: int, stride: int | None = None) -> jnp.ndarray:
    """Average pooling over the spatial axes of (B, *spatial, C)."""
    n = x.ndim - 2
    stride = stride or window
    dims = (1,) + (window,) * n + (1,)
    strides = (1,) + (stride,) * n + (1,)
    summed = lax.reduce_window(x, 0.0, lax.add, dims, strides, "VALID")
    return summed / float(window**n)


def upsample_nearest(x: jnp.ndarray, scale: int = 2) -> jnp.ndarray:
    """Nearest-neighbour x`scale` upsampling of (B, *spatial, C).

    Lowered as one broadcast+reshape rather than per-axis jnp.repeat
    (one fused expand instead of n gather/copies; ~2% on the 2D bench).
    """
    n = x.ndim - 2
    shape = x.shape
    for axis in range(1, n + 1):
        x = jnp.expand_dims(x, axis * 2)
    broadcast_shape = [shape[0]]
    for i in range(n):
        broadcast_shape += [shape[1 + i], scale]
    broadcast_shape += [shape[-1]]
    x = jnp.broadcast_to(x, tuple(broadcast_shape))
    out_shape = (shape[0],) + tuple(s * scale for s in shape[1:-1]) + (shape[-1],)
    return x.reshape(out_shape)
