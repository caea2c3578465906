"""LPIPS perceptual metric (Zhang et al. 2018) over the framework's VGG.

BASELINE.md's north star is "LPIPS/SSIM parity"; this module implements the
LPIPS *structure* exactly — per-layer channel-unit-normalized feature
differences, squared, weighted per channel by a learned linear head,
spatially averaged, summed over layers:

    d(x,y) = sum_l  mean_hw || w_l (.) ( f_l(x)/|f_l(x)| - f_l(y)/|f_l(y)| ) ||_2^2

so that the moment real weights land (zero-egress blocks fetching them
today) the metric activates with NO code changes:

  * backbone taps come from models.vgg.VGG19Features — drop torchvision
    VGG19 weights at $VGG19_WEIGHTS (models/vgg.py:101 ingest);
  * the linear head loads an official LPIPS checkpoint (keys
    ``lin{i}.model.1.weight``, shape (1,C,1,1)) from $LPIPS_WEIGHTS / a
    path — the channel widths of our relu{1..5}_1 taps (64,128,256,512,512)
    match the official VGG lin head shapes, so the file loads as-is.
    Until then the head falls back to uniform 1/C_l weights (the "lpips
    baseline" variant of the paper, eq. 1 with w=1 — a valid perceptual
    distance whose ranking behavior is test-pinned like the VGG loss
    fallback, tests/test_lpips.py).

Reference: the upstream repo ships no eval (SURVEY.md §6); the paper it
implements (arXiv:2106.14132) reports perceptual comparisons, making an
LPIPS-ready evaluator part of capability parity.

TPU note: block-1 VGG features arrive space-to-depth packed
(models/vgg.py:51-61 — full-res 3-channel convs are layout-bound on TPU).
LPIPS channel normalization is per spatial location, so the packed tap is
reshaped to (..., f*f, C) and each of the f*f pixel groups is normalized
over its own C lanes — numerically identical to normalizing the unpacked
tap, with zero unpacking cost.
"""

from __future__ import annotations

import os
from typing import Any, Optional, Sequence

import jax.numpy as jnp
import numpy as np

from ..models.vgg import _CFG, VGG19Features

# channel width of each tap (relu{1..5}_1)
TAP_WIDTHS = tuple(width for width, _ in _CFG)
_EPS = 1e-10


def _normalize_tap(x: jnp.ndarray, width: int) -> jnp.ndarray:
    """Unit-normalize feature vectors along the channel axis.

    Tap 0 is space-to-depth packed: channels are f*f groups of `width`
    lanes (order k = m*(f*C) + n*C + c, models/vgg.pack_conv_weights), so
    reshape to (..., groups, width) and normalize each group — exactly the
    per-original-pixel normalization LPIPS specifies."""
    x = x.astype(jnp.float32)
    if x.shape[-1] != width:
        groups = x.shape[-1] // width
        x = x.reshape(x.shape[:-1] + (groups, width))
    return x / jnp.sqrt(jnp.sum(x * x, axis=-1, keepdims=True) + _EPS)


def uniform_lin_weights() -> list:
    """Weight-free fallback head: uniform 1/C per layer (paper's unweighted
    "lpips baseline"); replaced verbatim by a real checkpoint via
    load_lin_weights."""
    return [np.full((c,), 1.0 / c, np.float32) for c in TAP_WIDTHS]


def load_lin_weights(path: str) -> list:
    """Ingest an official LPIPS linear head.

    .pth / .pt: torch state_dict with ``lin{i}.model.1.weight`` (1,C,1,1)
    (the upstream lpips package layout). .npz: arrays ``lin{i}`` of shape
    (C,). Negative entries are clamped to 0 exactly as the official
    implementation does at scoring time."""
    if path.endswith((".pth", ".pt")):
        import torch
        sd = torch.load(path, map_location="cpu")
        if hasattr(sd, "state_dict"):
            sd = sd.state_dict()
        arrays = {k: np.asarray(v) for k, v in sd.items()}
        lins = [arrays[f"lin{i}.model.1.weight"].reshape(-1)
                for i in range(len(TAP_WIDTHS))]
    else:
        arrays = dict(np.load(path))
        lins = [np.asarray(arrays[f"lin{i}"]).reshape(-1)
                for i in range(len(TAP_WIDTHS))]
    for i, (w, c) in enumerate(zip(lins, TAP_WIDTHS)):
        if w.shape[0] != c:
            raise ValueError(
                f"lin{i} has {w.shape[0]} channels, tap expects {c}")
    return [np.maximum(w.astype(np.float32), 0.0) for w in lins]


def get_lin_weights(path: str = "") -> list:
    """Real head if a weights file is available, else the uniform fallback."""
    path = path or os.environ.get("LPIPS_WEIGHTS", "")
    if path and os.path.exists(path):
        return load_lin_weights(path)
    return uniform_lin_weights()


def lpips_distance(vgg_params: Any, a: jnp.ndarray, b: jnp.ndarray,
                   lin_weights: Optional[Sequence] = None,
                   per_sample: bool = False) -> jnp.ndarray:
    """LPIPS distance between image batches in [-1, 1], NHWC.

    vgg_params: models.vgg params (pretrained or random-feature fallback).
    lin_weights: list of 5 per-channel weight vectors (get_lin_weights()).
    """
    if lin_weights is None:
        lin_weights = uniform_lin_weights()
    model = VGG19Features(dtype=jnp.bfloat16)
    fa = model.apply({"params": vgg_params}, a)
    fb = model.apply({"params": vgg_params}, b)
    d = 0.0
    for w, width, x, y in zip(lin_weights, TAP_WIDTHS, fa, fb):
        diff = _normalize_tap(x, width) - _normalize_tap(y, width)
        # w (.) diff, squared, summed over channels, averaged over space
        # (+ the packed pixel-group axis for tap 0, which IS space)
        per_loc = jnp.sum(jnp.asarray(w) * diff * diff, axis=-1)
        axes = tuple(range(1, per_loc.ndim))
        d = d + jnp.mean(per_loc, axis=axes if per_sample else None)
    return d
