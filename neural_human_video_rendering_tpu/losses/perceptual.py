"""VGG perceptual loss (SURVEY.md §2 #18; pix2pixHD VGGLoss)."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..models.vgg import FEATURE_WEIGHTS, VGG19Features


def vgg_loss(vgg_params, fake: jnp.ndarray, real: jnp.ndarray,
             dtype=jnp.bfloat16) -> jnp.ndarray:
    """Weighted L1 over the five VGG19 tap activations; real is stop-grad.

    Convs run in bf16 (the MXU-native dtype; fp32 convs are emulated at a
    fraction of the rate on TPU) — the taps are compared in fp32, and the
    perceptual L1 is robust to bf16 feature precision.
    """
    model = VGG19Features(dtype=dtype)
    f_feats = model.apply({"params": vgg_params}, fake)
    r_feats = model.apply({"params": vgg_params}, jax.lax.stop_gradient(real))
    loss = 0.0
    for w, f, r in zip(FEATURE_WEIGHTS, f_feats, r_feats):
        loss = loss + w * jnp.mean(jnp.abs(f - jax.lax.stop_gradient(r)))
    return loss
