"""StyleGAN building blocks, TPU-native (NHWC, flax.linen, explicit PRNG).

Each block reimplements the observable math of the corresponding reference
component (cited per class, reference at /root/reference) with TPU-idiomatic
layout and dtype handling:

  * NHWC activations, HWIO conv kernels (XLA/TPU native; the reference is
    NCHW/OIHW — the permutation lives only in compat/torch_ckpt.py).
  * Equalized learning rate is a runtime multiply on the weight (kept at
    runtime, not folded into init, for checkpoint parity — reference
    gan.py:14, gan.py:27).
  * Normalization statistics are always computed in float32 even under
    bfloat16 compute, then cast back — standard TPU mixed-precision practice.
  * ``dtype=None`` means "compute in the input's dtype"; params are stored in
    ``param_dtype`` (float32 by default).
"""

from __future__ import annotations

import math
from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from byogan_tpu.core.resize import upsample2x_axis, upsample2x_bilinear
from byogan_tpu.ops.fused import leaky_relu, noise_lrelu_adain  # noqa: F401
# (leaky_relu lives in ops.fused — the single definition of the reference's
# sole activation, gan.py:86 etc.)

Dtype = Any


def _maybe_cast(x: jax.Array, dtype: Optional[Dtype]) -> jax.Array:
    return x if dtype is None else x.astype(dtype)


class EqualizedDense(nn.Module):
    """Equalized-LR linear layer (reference ``EqualizedLinear``, gan.py:7-17).

    Weights init N(0,1), bias 0, runtime scale sqrt(2 / fan_in) with
    fan_in = in_features (gan.py:13-14).  Weight stored (in, out) — the
    natural layout for ``x @ w`` on the MXU; the torch (out, in) layout is
    transposed at the compat boundary.
    """

    features: int
    dtype: Optional[Dtype] = None
    param_dtype: Dtype = jnp.float32
    bias_init: Any = nn.initializers.zeros_init()

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        in_features = x.shape[-1]
        w = self.param(
            "weight",
            nn.initializers.normal(stddev=1.0),
            (in_features, self.features),
            self.param_dtype,
        )
        b = self.param("bias", self.bias_init, (self.features,), self.param_dtype)
        scale = math.sqrt(2.0 / in_features)
        x = _maybe_cast(x, self.dtype)
        w = _maybe_cast(w * scale, x.dtype)
        b = _maybe_cast(b, x.dtype)
        return jnp.dot(x, w, preferred_element_type=x.dtype) + b


def equalized_conv_apply(
    x: jax.Array, w: jax.Array, b: jax.Array, scale: float, padding: int
) -> jax.Array:
    """Apply an equalized conv from raw params (shared by EqualizedConv and
    StyleConvBlock's fused dispatch so both paths stay bit-identical)."""
    w = _maybe_cast(w * scale, x.dtype)
    b = _maybe_cast(b, x.dtype)
    out = jax.lax.conv_general_dilated(
        x,
        w,
        window_strides=(1, 1),
        padding=[(padding, padding)] * 2,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=x.dtype,
    )
    return out + b


def equalized_conv_pool2x_apply(
    x: jax.Array, w: jax.Array, b: jax.Array, scale: float
) -> jax.Array:
    """conv3x3(pad=1) -> AvgPool(2), folded into ONE stride-2 4x4 conv.

    The reference's critic blocks run ``conv2 -> AvgPool2d(2)`` back to back
    (gan.py:258-262) with nothing in between, so the pair composes exactly:

        pool(conv(x, w))[p] = sum_u x[2p + u - 1] * w4[u]   per spatial axis,
        w4[u] = 1/4 * sum_{d in {0,1}} w[u - d]             (w zero outside)

    i.e. a 4x4 kernel, stride 2, padding 1.  Bias commutes with the mean pool.
    This cuts the conv's MACs 2.25x (16 taps/output vs 36) and never
    materialises the pre-pool slab in HBM — measured 3.2x on the stage-6
    critic conv stack fwd+bwd (benchmarks/RESULTS.md round 3).  Max deviation
    from the unfused pair is float-rounding only (~1e-5 relative, f32).
    """
    w = w * scale  # fold in f32 before the pool algebra, then cast once
    pad = jnp.pad
    zeros2 = ((0, 0), (0, 0))
    w4 = (
        pad(w, ((1, 0), (1, 0)) + zeros2)
        + pad(w, ((0, 1), (1, 0)) + zeros2)
        + pad(w, ((1, 0), (0, 1)) + zeros2)
        + pad(w, ((0, 1), (0, 1)) + zeros2)
    ) * 0.25
    w4 = _maybe_cast(w4, x.dtype)
    b = _maybe_cast(b, x.dtype)
    out = jax.lax.conv_general_dilated(
        x,
        w4,
        window_strides=(2, 2),
        padding=[(1, 1)] * 2,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=x.dtype,
    )
    return out + b


# Per-axis phase matrices for the fused upsample2x -> conv3x3 (below).
# Row i = coefficient of replicate-padded input xp[k+i]; column t = conv tap
# w[t].  Derived by composing the closed-form bilinear stencil
# (core/resize.py: out[2k] = 0.25 x[k-1] + 0.75 x[k], out[2k+1] = 0.75 x[k]
# + 0.25 x[k+1], edge-clamped) with a zero-padded 3-tap conv.
_UPCONV_M_EVEN = (
    (0.75, 0.25, 0.0),
    (0.25, 0.75, 0.75),
    (0.0, 0.0, 0.25),
)
_UPCONV_M_ODD = (
    (0.25, 0.0, 0.0),
    (0.75, 0.75, 0.25),
    (0.0, 0.25, 0.75),
)


def upconv_profitable(low_res_h: int) -> bool:
    """Shape gate for the fused upsample+conv (measured, v5e chip,
    benchmarks/bench_upconv.py): the subpixel form wins 1.25-3.1x once the
    low-res grid is >= 16 (stages 4-8 shapes, fwd AND fwd+bwd) but loses at
    the 4/8px 512-channel stages (0.57-0.82x fwd — the 4x-wide phase conv
    tiles poorly on a <=10x10 padded grid), so those keep the explicit
    upsample -> conv pair.  Static per jit bucket: a plain Python branch.
    """
    return low_res_h >= 16


def equalized_upsample2x_conv_apply(
    x: jax.Array, w: jax.Array, b: jax.Array, scale: float
) -> jax.Array:
    """upsample2x_bilinear -> conv3x3(pad=1), fused into ONE low-res conv.

    The generator's non-initial stages run ``Upsample(2, bilinear)`` straight
    into a 3x3 conv (reference gan.py:112, 122-123 -> gan.py:86).  Both are
    linear, so the pair composes exactly into a subpixel (phase) conv on the
    LOW-res grid: each of the 4 output phases (even/odd row x even/odd col)
    is a 3x3 conv over the replicate-padded input with a kernel that is a
    fixed linear map of ``w`` (``_UPCONV_M_*``).  Stacking the 4 phase
    kernels along the output-channel axis gives one VALID conv producing
    (N, H, W, 4*Cout), interleaved to (N, 2H, 2W, Cout) by depth-to-space.

    Same MACs as the unfused pair (9 taps/output either way), but the
    (N, 2H, 2W, Cin) upsampled slab is never materialised in HBM — the
    generator phase of the train step is HBM-bound (benchmarks/RESULTS.md
    round 2) — and the conv's channel dim is 4x wider, which keeps the MXU
    dense at the top stages where Cout shrinks to 16-64.

    Exactness at the borders: the phase formulas implicitly extend the
    upsampled array with its clamped continuation (value x[edge]) where the
    true conv sees zero padding, so the four border rows/cols are corrected
    with 1D convs of the edge lines (O(edge) work) and the four corners get
    their doubly-removed term added back.  Fused-vs-unfused agreement is
    float-rounding only (tested at ~1e-5 f32).
    """
    n, h, wdt, cin = x.shape
    cout = w.shape[-1]
    wf = w * scale  # fold scale in f32 before the phase algebra
    me = jnp.asarray(_UPCONV_M_EVEN, wf.dtype)
    mo = jnp.asarray(_UPCONV_M_ODD, wf.dtype)
    # (pr, pc) phase kernels, stacked as channel blocks p = 2*pr + pc.
    phases = [
        jnp.einsum("it,js,tscd->ijcd", mr, mc, wf)
        for mr in (me, mo)
        for mc in (me, mo)
    ]
    wbig = jnp.stack(phases, axis=-2).reshape(3, 3, cin, 4 * cout)
    wbig = _maybe_cast(wbig, x.dtype)
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="edge")
    out = jax.lax.conv_general_dilated(
        xp,
        wbig,
        window_strides=(1, 1),
        padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=x.dtype,
    )
    out = (
        out.reshape(n, h, wdt, 2, 2, cout)
        .transpose(0, 1, 3, 2, 4, 5)
        .reshape(n, 2 * h, 2 * wdt, cout)
    )

    # --- border corrections -------------------------------------------------
    # The conv's zero padding lives on the UPSAMPLED grid: rows/cols -1 and
    # 2H/2W of the upsampled array must read as zero, but the phase formulas
    # used the clamped continuation: u[-1] = up(edge-extended x)[-1] = x[0]
    # per axis.  Subtract those contributions along each border (a 1D conv of
    # the upsampled edge line, corner-extended), then add back the corner
    # terms removed twice.
    wc = _maybe_cast(wf, x.dtype)

    def edge_line(line: jax.Array) -> jax.Array:
        # line (N, L, Cin) -> clamped-extended upsampled line (N, 2L+2, Cin)
        upl = upsample2x_axis(line, 1)
        return jnp.concatenate([line[:, :1], upl, line[:, -1:]], axis=1)

    def conv1d(line: jax.Array, taps: jax.Array) -> jax.Array:
        # line (N, L, Cin), taps (3, Cin, Cout) -> VALID conv (N, L-2, Cout)
        return jax.lax.conv_general_dilated(
            line[:, None],
            taps[None],
            window_strides=(1, 1),
            padding="VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=x.dtype,
        )[:, 0]

    c_top = conv1d(edge_line(x[:, 0]), wc[0])
    c_bot = conv1d(edge_line(x[:, -1]), wc[2])
    c_left = conv1d(edge_line(x[:, :, 0]), wc[:, 0])
    c_right = conv1d(edge_line(x[:, :, -1]), wc[:, 2])
    out = out.at[:, 0].add(-c_top)
    out = out.at[:, -1].add(-c_bot)
    out = out.at[:, :, 0].add(-c_left)
    out = out.at[:, :, -1].add(-c_right)
    # Corners: removed once by the row correction and once by the column
    # correction — add back the single true excess.
    corner = lambda tap, px: jnp.einsum("cd,nc->nd", tap, px)  # noqa: E731
    out = out.at[:, 0, 0].add(corner(wc[0, 0], x[:, 0, 0]))
    out = out.at[:, 0, -1].add(corner(wc[0, 2], x[:, 0, -1]))
    out = out.at[:, -1, 0].add(corner(wc[2, 0], x[:, -1, 0]))
    out = out.at[:, -1, -1].add(corner(wc[2, 2], x[:, -1, -1]))
    return out + _maybe_cast(b, x.dtype)


class EqualizedConv(nn.Module):
    """Equalized-LR conv (reference ``EqualizedConv2d``, gan.py:20-38).

    fan_in = in_channels * kh * kw (gan.py:26-27); scale sqrt(2/fan_in) applied
    at runtime.  NHWC / HWIO, 'SAME'-style explicit padding to match torch
    ``padding=p``.
    """

    features: int
    kernel_size: int = 3
    padding: int = 0
    dtype: Optional[Dtype] = None
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def scaled_params(self, in_ch: int):
        """(weight, bias, runtime scale) — the compact param declaration,
        exposed so StyleConvBlock can feed the fused Pallas kernel the same
        parameters (same tree paths) it would use for the lax conv."""
        k = self.kernel_size
        w = self.param(
            "weight",
            nn.initializers.normal(stddev=1.0),
            (k, k, in_ch, self.features),
            self.param_dtype,
        )
        b = self.param(
            "bias", nn.initializers.zeros_init(), (self.features,), self.param_dtype
        )
        return w, b, math.sqrt(2.0 / (in_ch * k * k))

    def __call__(self, x: jax.Array) -> jax.Array:
        w, b, scale = self.scaled_params(x.shape[-1])
        return equalized_conv_apply(
            _maybe_cast(x, self.dtype), w, b, scale, self.padding
        )


class NoiseInjection(nn.Module):
    """Per-channel learned noise scale (reference ``InjectSecondaryNoise``,
    gan.py:41-52): zero-init (C,) weight times a single-channel noise map,
    added to the conv output.  Noise is NHWC ``(N, H, W, 1)``.
    """

    channels: int
    param_dtype: Dtype = jnp.float32

    def setup(self):
        self.weight = self.param(
            "weight", nn.initializers.zeros_init(), (self.channels,), self.param_dtype
        )

    def __call__(self, x: jax.Array, noise: jax.Array) -> jax.Array:
        return x + self.weight.astype(x.dtype) * noise.astype(x.dtype)


def instance_norm(x: jax.Array, eps: float = 1e-8) -> jax.Array:
    """InstanceNorm2d(eps, affine=False) over NHWC: per-(N,C) stats on (H,W).

    Matches torch (reference gan.py:59): biased variance, eps inside the
    sqrt.  Statistics in float32 regardless of compute dtype.
    """
    x32 = x.astype(jnp.float32)
    mean = x32.mean(axis=(1, 2), keepdims=True)
    var = jnp.square(x32 - mean).mean(axis=(1, 2), keepdims=True)
    out = (x32 - mean) * jax.lax.rsqrt(var + eps)
    return out.astype(x.dtype)


def _adain_bias_init(in_channel: int):
    """Style-projection bias: gamma half 1, beta half 0 (gan.py:62-63)."""

    def init(key, shape, dtype=jnp.float32):
        del key
        assert shape == (2 * in_channel,)
        return jnp.concatenate(
            [jnp.ones((in_channel,), dtype), jnp.zeros((in_channel,), dtype)]
        )

    return init


class AdaIN(nn.Module):
    """Adaptive instance norm (reference ``AdaINBlock``, gan.py:55-71).

    InstanceNorm(eps=1e-8) then per-channel affine from the style vector via
    an equalized linear producing (gamma, beta) — gamma is the first half of
    the projection (torch ``chunk(2, 1)``, gan.py:67).
    """

    channels: int
    style_dim: int = 512
    dtype: Optional[Dtype] = None
    param_dtype: Dtype = jnp.float32

    def setup(self):
        self.style = EqualizedDense(
            features=2 * self.channels,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            bias_init=_adain_bias_init(self.channels),
        )

    def project(self, style: jax.Array) -> tuple[jax.Array, jax.Array]:
        """Style vector -> per-channel (gamma, beta), each (N, C)."""
        proj = self.style(style)
        return proj[:, : self.channels], proj[:, self.channels :]

    def __call__(self, x: jax.Array, style: jax.Array) -> jax.Array:
        gamma, beta = self.project(style)
        return (
            gamma[:, None, None, :] * instance_norm(x) + beta[:, None, None, :]
        )


class StyleConvBlock(nn.Module):
    """One synthesis conv (reference ``StyleConvBlock``, gan.py:74-98).

    Either the 4x4 learned constant (``is_initial``; gan.py:81 — input is
    ignored, the constant broadcasts over batch, gan.py:91-92) or a 3x3
    equalized conv; then noise-inject -> LeakyReLU(0.2) -> AdaIN.

    The noise->lrelu->adain epilogue is the Pallas fusion target
    (ops/pallas_adain.py); this module is the lax reference path that XLA
    already fuses into the conv.
    """

    in_channels: int
    out_channels: int
    is_initial: bool = False
    dtype: Optional[Dtype] = None
    param_dtype: Dtype = jnp.float32
    use_pallas: bool = False
    upsample_input: bool = False  # fuse the stage's 2x bilinear upsample into
    # this conv (equalized_upsample2x_conv_apply) — the caller passes the
    # LOW-res input and no explicit upsample runs.  Exact to float rounding.

    def setup(self):
        if self.is_initial:
            self.const = self.param(
                "const",
                nn.initializers.normal(stddev=1.0),
                (1, 4, 4, self.in_channels),
                self.param_dtype,
            )
        else:
            self.conv = EqualizedConv(
                features=self.out_channels,
                kernel_size=3,
                padding=1,
                dtype=self.dtype,
                param_dtype=self.param_dtype,
            )
        self.noise = NoiseInjection(
            channels=self.out_channels, param_dtype=self.param_dtype
        )
        self.adain = AdaIN(
            channels=self.out_channels,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
        )

    def __call__(
        self, x: Optional[jax.Array], style: jax.Array, noise: jax.Array
    ) -> jax.Array:
        batch = style.shape[0]
        gamma, beta = self.adain.project(style)
        if self.is_initial:
            out = jnp.broadcast_to(
                _maybe_cast(self.const, self.dtype or style.dtype),
                (batch, 4, 4, self.in_channels),
            )
        else:
            x = _maybe_cast(x, self.dtype)
            w, b, scale = self.conv.scaled_params(x.shape[-1])
            conv_shape = (
                (x.shape[0], 2 * x.shape[1], 2 * x.shape[2], x.shape[3])
                if self.upsample_input
                else x.shape
            )
            if self.use_pallas:
                from byogan_tpu.ops.pallas_styleconv import (
                    styleconv,
                    styleconv_profitable,
                    styleconv_supported,
                )

                if styleconv_supported(
                    conv_shape, conv_shape[-1], self.out_channels,
                    x.dtype.itemsize,
                ) and styleconv_profitable(
                    conv_shape, conv_shape[-1], self.out_channels
                ):
                    # Whole synthesis conv in one differentiable Pallas
                    # kernel (conv + noise + lrelu + AdaIN; custom_vjp with
                    # closed-form lax backward) — only on shapes where it
                    # measures faster than XLA (styleconv_profitable).  The
                    # kernel consumes the upsampled slab, so on these shapes
                    # the stage upsample runs explicitly.
                    if self.upsample_input:
                        x = upsample2x_bilinear(x)
                    return styleconv(
                        x,
                        _maybe_cast(w * scale, x.dtype),
                        b,
                        noise.astype(x.dtype),
                        self.noise.weight,
                        gamma,
                        beta,
                    )
            if self.upsample_input and upconv_profitable(x.shape[1]):
                out = equalized_upsample2x_conv_apply(x, w, b, scale)
            else:
                if self.upsample_input:
                    x = upsample2x_bilinear(x)
                out = equalized_conv_apply(x, w, b, scale, padding=1)
        # Epilogue: always the lax path inside the model — the epilogue-only
        # Pallas kernel wins isolated but LOSES end-to-end (the custom-call
        # boundary stops XLA fusing it into the producing conv; RESULTS.md
        # round 1).  Whole-conv fusion above is the winning use of Pallas.
        return noise_lrelu_adain(
            out,
            noise.astype(out.dtype),
            self.noise.weight,
            gamma,
            beta,
            use_pallas=False,
        )


class StyleStage(nn.Module):
    """One resolution stage (reference ``StyleGanBlock``, gan.py:101-127).

    Optional 2x bilinear upsample then two StyleConvBlocks sharing the same
    style vector *and the same noise map* (gan.py:125-127).
    """

    in_channels: int
    out_channels: int
    is_initial: bool = False
    does_upsample: bool = True
    dtype: Optional[Dtype] = None
    param_dtype: Dtype = jnp.float32
    use_pallas: bool = False

    @nn.compact
    def __call__(
        self, x: Optional[jax.Array], style: jax.Array, noise: jax.Array
    ) -> jax.Array:
        if self.is_initial and self.does_upsample:
            raise ValueError("initial stage cannot upsample")
        if not self.is_initial and x is None:
            raise ValueError("non-initial stage requires an input")
        # The 2x bilinear upsample (gan.py:112) is FUSED into conv1
        # (equalized_upsample2x_conv_apply): the upsampled slab never hits
        # HBM.  conv1 receives the low-res input and upsample_input=True.
        out = StyleConvBlock(
            in_channels=self.in_channels,
            out_channels=self.out_channels,
            is_initial=self.is_initial,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            use_pallas=self.use_pallas,
            upsample_input=self.does_upsample,
            name="conv1",
        )(x, style, noise)
        return StyleConvBlock(
            in_channels=self.out_channels,
            out_channels=self.out_channels,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            use_pallas=self.use_pallas,
            name="conv2",
        )(out, style, noise)


class MappingNetwork(nn.Module):
    """z -> w mapping: 8 x (EqualizedDense + LeakyReLU(0.2)) (reference
    ``MappingLayers``, gan.py:130-148).  Note: the reference applies NO
    PixelNorm on z, deviating from the StyleGAN paper — replicated here.
    """

    channels: int = 512
    depth: int = 8
    dtype: Optional[Dtype] = None
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, z: jax.Array) -> jax.Array:
        out = _maybe_cast(z, self.dtype)
        for i in range(self.depth):
            out = EqualizedDense(
                features=self.channels,
                dtype=self.dtype,
                param_dtype=self.param_dtype,
                name=f"dense{i}",
            )(out)
            out = leaky_relu(out)
        return out


class MinibatchStdDev(nn.Module):
    """Minibatch standard-deviation channel (reference gan.py:268-298).

    Replicates the reference's exact (quirky) math, which deviates from the
    ProGAN paper in two load-bearing ways:
      * means are taken over the FULL batch, not per group (gan.py:282);
      * samples are grouped by a strided reshape: group g holds samples
        ``g*(B/G) + m``, and the stat for column ``m`` is shared by all its
        members (gan.py:280, 292-295).
    If the batch is not divisible by ``group_size``, the effective group is
    the whole batch.  (The reference permanently mutates ``self.group_size``
    in that case, gan.py:277-278 — a statelessness divergence documented
    here: with a fixed per-stage batch size the observable behavior is
    identical.)  Statistics computed in float32.
    """

    group_size: int = 4

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        b, h, w, c = x.shape
        g = self.group_size if b % self.group_size == 0 else b
        m = b // g
        x32 = x.astype(jnp.float32)
        mean = x32.mean(axis=0, keepdims=True)  # full-batch mean (1,H,W,C)
        dev2 = jnp.square(x32 - mean).reshape(g, m, h, w, c)
        var = dev2.mean(axis=0)  # (M,H,W,C): var across each strided column
        std = jnp.sqrt(var + 1e-8)
        stat = std.mean(axis=(1, 2, 3))  # (M,)
        stat_map = jnp.broadcast_to(stat[None, :], (g, m)).reshape(b)
        stat_map = jnp.broadcast_to(
            stat_map[:, None, None, None], (b, h, w, 1)
        ).astype(x.dtype)
        return jnp.concatenate([x, stat_map], axis=-1)
