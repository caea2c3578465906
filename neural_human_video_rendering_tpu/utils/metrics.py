"""Quality metrics (PSNR / SSIM) as jnp functions for held-out eval.

The reference's only quality control is visual (HTML gallery + TensorBoard,
SURVEY.md §4); BASELINE.md's targets are LPIPS/SSIM parity, so the eval loop
here reports PSNR + SSIM on the --data_ratio held-out split. (LPIPS proper
needs pretrained AlexNet/VGG weights — plug them into models.vgg the same
way as the perceptual loss; vgg_distance below is the weights-agnostic hook.)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def psnr(a: jnp.ndarray, b: jnp.ndarray, per_sample: bool = False) -> jnp.ndarray:
    """PSNR in dB for images in [-1, 1] (peak-to-peak 2.0).

    per_sample=True returns a (B,) vector (one value per batch element) so
    callers can mask padded tail entries without bias."""
    axes = tuple(range(1, a.ndim)) if per_sample else None
    mse = jnp.mean((a.astype(jnp.float32) - b.astype(jnp.float32)) ** 2,
                   axis=axes)
    return 10.0 * jnp.log10(4.0 / jnp.maximum(mse, 1e-10))


def _gaussian_kernel(size: int = 11, sigma: float = 1.5) -> jnp.ndarray:
    x = jnp.arange(size, dtype=jnp.float32) - (size - 1) / 2
    g = jnp.exp(-(x ** 2) / (2 * sigma ** 2))
    g = g / jnp.sum(g)
    return g[:, None] * g[None, :]


def ssim(a: jnp.ndarray, b: jnp.ndarray, per_sample: bool = False) -> jnp.ndarray:
    """Mean SSIM over a batch, images (B,H,W,C) in [-1,1];
    per_sample=True returns a (B,) vector."""
    a = (a.astype(jnp.float32) + 1) / 2
    b = (b.astype(jnp.float32) + 1) / 2
    k = _gaussian_kernel()[..., None, None]           # (11,11,1,1)
    C = a.shape[-1]
    kern = jnp.tile(k, (1, 1, 1, C))

    def filt(x):
        # precision=HIGHEST: TPU convs otherwise run bf16, and the
        # var = E[x^2] - mu^2 cancellation then produces garbage SSIM
        # (observed ~16 at 512px); metrics must be exact, unlike training
        return jax.lax.conv_general_dilated(
            x, kern, (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=C,
            precision=jax.lax.Precision.HIGHEST)

    mu_a, mu_b = filt(a), filt(b)
    var_a = filt(a * a) - mu_a ** 2
    var_b = filt(b * b) - mu_b ** 2
    cov = filt(a * b) - mu_a * mu_b
    c1, c2 = 0.01 ** 2, 0.03 ** 2
    s = ((2 * mu_a * mu_b + c1) * (2 * cov + c2)) / (
        (mu_a ** 2 + mu_b ** 2 + c1) * (var_a + var_b + c2))
    if per_sample:
        return jnp.mean(s, axis=tuple(range(1, s.ndim)))
    return jnp.mean(s)


def vgg_distance(vgg_params, a: jnp.ndarray, b: jnp.ndarray,
                 per_sample: bool = False) -> jnp.ndarray:
    """LPIPS-style perceptual distance using the framework's VGG features."""
    if not per_sample:
        from ..losses.perceptual import vgg_loss
        return vgg_loss(vgg_params, a, b)
    from ..models.vgg import FEATURE_WEIGHTS, VGG19Features
    model = VGG19Features(dtype=jnp.bfloat16)
    fa = model.apply({"params": vgg_params}, a)
    fb = model.apply({"params": vgg_params}, b)
    d = 0.0
    for w, x, y in zip(FEATURE_WEIGHTS, fa, fb):
        d = d + w * jnp.mean(jnp.abs(x - y),
                             axis=tuple(range(1, x.ndim)))
    return d
