"""Conv building blocks (the network library, SURVEY.md §2 #14).

pix2pixHD-lineage blocks — reflection-padded convs, instance norm (no
affine), ResNet blocks — rebuilt as flax.linen modules in NHWC layout (the
TPU-native conv layout: channels on the 128-lane minor dimension feeds the
MXU without transposes). Compute dtype is configurable (bf16 by default via
Options.dtype); parameters stay float32.
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

Dtype = Any


class InstanceNorm(nn.Module):
    """Per-sample, per-channel normalization over H, W (affine=False,
    matching pix2pixHD's InstanceNorm2d default).

    Statistics accumulate in float32 regardless of input dtype; the
    normalized output keeps the input dtype — no fp32 copies of the
    activation are materialized between bf16 convs. E[x] and E[x^2] are
    taken in ONE fused pass over the activation (XLA multi-output fusion)
    instead of the two-pass mean-then-centered-variance form: one fewer
    full HBM read per norm, and fp32 accumulation keeps E[x^2]-E[x]^2
    accurate at conv-activation scales.
    """
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        xf = x.astype(jnp.float32)
        mean = jnp.mean(xf, axis=(-3, -2), keepdims=True)
        sqmean = jnp.mean(jnp.square(xf), axis=(-3, -2), keepdims=True)
        var = jnp.maximum(sqmean - jnp.square(mean), 0.0)
        scale = jax.lax.rsqrt(var + self.eps)
        return ((xf - mean) * scale).astype(x.dtype)


def reflect_pad(x: jnp.ndarray, pad: int) -> jnp.ndarray:
    return jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)), mode="reflect")


def space_to_depth(x: jnp.ndarray, f: int) -> jnp.ndarray:
    """(B,H,W,C) -> (B,H/f,W/f,f*f*C): lossless spatial->channel repack.

    TPU convs with very few channels (RGB images, sparse pose renders) run
    far below MXU rate — the 128-lane contraction is mostly padding. Packing
    f x f pixel neighborhoods onto channels trades spatial extent the MXU
    doesn't use for channel depth it does (measured: BGNet's 3-channel
    512px convs ran at 0.7 TF/s vs 70-90 TF/s for the wide trunk convs).
    """
    B, H, W, C = x.shape
    # W-pack first: (W, C) -> (W/f, f*C) is a relayout-only reshape on the
    # minor dims, so the only real data movement is ONE small transpose for
    # the H interleave. The naive 6D transpose with (f, f, C) minor is
    # catastrophically slow on TPU (measured 1.9 ms vs 3191 ms isolated at
    # 512px — tiny minor dims defeat the (8,128) tiling).
    x = x.reshape(B, H // f, f, W // f, f * C)
    x = x.transpose(0, 1, 3, 2, 4)
    return x.reshape(B, H // f, W // f, f * f * C)


def depth_to_space(x: jnp.ndarray, f: int) -> jnp.ndarray:
    """(B,H,W,f*f*C) -> (B,H*f,W*f,C): inverse of space_to_depth."""
    B, H, W, C = x.shape
    c = C // (f * f)
    x = x.reshape(B, H, W, f, f * c)       # split row-group / (col, chan)
    x = x.transpose(0, 1, 3, 2, 4)         # (B, H, f, W, f*c)
    return x.reshape(B, H * f, W * f, c)   # H and W merges are free


class ConvNormRelu(nn.Module):
    """Pad -> Conv -> InstanceNorm -> ReLU.

    pad_mode "reflect" reproduces pix2pixHD's ReflectionPad2d (an explicit
    whole-activation copy before every conv); "same" uses the conv's own
    zero padding — one less HBM round-trip per conv, measurably faster on
    TPU, and visually equivalent away from borders. Default keeps parity.
    """
    features: int
    kernel: int = 3
    stride: int = 1
    pad: Optional[int] = None
    use_norm: bool = True
    use_relu: bool = True
    pad_mode: str = "reflect"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        pad = self.kernel // 2 if self.pad is None else self.pad
        # pix2pixHD reflects only its stride-1 convs (7x7 stem/head,
        # ResnetBlock 3x3s); the stride-2 downsample convs are zero-padded
        # Conv2d(k3,s2,p1) — match that exactly in parity mode
        if pad and self.pad_mode == "reflect" and self.stride == 1:
            x = reflect_pad(x, pad)
            padding = "VALID"
        else:
            padding = [(pad, pad), (pad, pad)]
        x = nn.Conv(self.features, (self.kernel, self.kernel),
                    strides=(self.stride, self.stride), padding=padding,
                    dtype=self.dtype, param_dtype=jnp.float32)(x)
        if self.use_norm:
            x = InstanceNorm()(x)
        if self.use_relu:
            x = nn.relu(x)
        return x


class ResnetBlock(nn.Module):
    """pix2pixHD ResnetBlock: two padded 3x3 convs with a skip."""
    features: int
    pad_mode: str = "reflect"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        h = ConvNormRelu(self.features, 3, pad_mode=self.pad_mode,
                         dtype=self.dtype)(x)
        h = ConvNormRelu(self.features, 3, use_relu=False,
                         pad_mode=self.pad_mode, dtype=self.dtype)(h)
        return x + h


class Upsample(nn.Module):
    """2x upsampling decoder stage.

    mode "deconv": pix2pixHD's stride-2 ConvTranspose (parity default).
    mode "resize": nearest-resize + 3x3 conv — maps to a plain MXU conv
    (no input dilation) and avoids checkerboard artifacts.

    Deconv padding: in parity mode (pad_mode="reflect") it is (1, 2) — the
    exact torch ConvTranspose2d(k3, s2, p1, output_padding=1) alignment,
    which torch-checkpoint import fidelity needs (flax "SAME" splits (2, 1)
    — one pixel off; verified in tests/test_torch_import.py). In the perf
    default (pad_mode="same") it stays "SAME": XLA lowers the symmetric
    split measurably faster (6.48 vs 6.19 steps/s at the 512px bench), and
    for models trained in this framework the border convention is
    arbitrary.
    """
    features: int
    mode: str = "deconv"
    pad_mode: str = "reflect"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        if self.mode == "resize":
            B, H, W, C = x.shape
            x = jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)
            x = nn.Conv(self.features, (3, 3), padding="SAME",
                        dtype=self.dtype, param_dtype=jnp.float32)(x)
        else:
            padding = (((1, 2), (1, 2)) if self.pad_mode == "reflect"
                       else "SAME")
            x = nn.ConvTranspose(self.features, (3, 3), strides=(2, 2),
                                 padding=padding, dtype=self.dtype,
                                 param_dtype=jnp.float32)(x)
        x = InstanceNorm()(x)
        return nn.relu(x)
