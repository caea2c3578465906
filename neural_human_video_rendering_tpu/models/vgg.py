"""VGG19 feature extractor for the perceptual loss (SURVEY.md §2 #14/#18).

The reference uses torchvision VGG19 features with the pix2pixHD tap points
(relu1_1, relu2_1, relu3_1, relu4_1, relu5_1) and loss weights
[1/32, 1/16, 1/8, 1/4, 1] (reference lineage: README.md:101,
requirment.txt:5). Rebuilt here as a fixed (non-trained) flax module.

Weights: this environment has no torchvision and no network egress, so
pretrained ImageNet weights cannot be fetched. The extractor therefore
supports two modes:
  * `load_pretrained(path)` — ingest a torchvision `vgg19` state_dict saved
    as .npz / .pth (keys `features.{i}.weight/bias`, OIHW) and convert to
    NHWC flax params. Drop a file at $VGG19_WEIGHTS or pass --vgg_weights.
  * deterministic random features (seed 0) — random VGG-architecture
    features are a serviceable perceptual distance (random-feature
    perceptual metrics literature); training runs fine, and swapping in real
    weights later only changes the loss landscape, not the code.
"""

from __future__ import annotations

import os
from typing import Any, List, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

# convs per block for VGG19; taps after the first conv+relu of each block
_CFG = ((64, 2), (128, 2), (256, 4), (512, 4), (512, 4))
FEATURE_WEIGHTS = (1 / 32, 1 / 16, 1 / 8, 1 / 4, 1.0)

# torchvision `features` indices of conv layers, in order
_TV_CONV_IDX = (0, 2, 5, 7, 10, 12, 14, 16, 19, 21, 23, 25, 28, 30, 32, 34)


class VGG19Features(nn.Module):
    """Input (B,H,W,3) in [-1,1] -> list of 5 tap activations."""
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> List[jnp.ndarray]:
        # [-1,1] -> [0,1] -> ImageNet normalization
        x = (x + 1.0) * 0.5
        mean = jnp.asarray([0.485, 0.456, 0.406])
        std = jnp.asarray([0.229, 0.224, 0.225])
        x = ((x - mean) / std).astype(self.dtype)
        taps = []
        conv_i = 0
        # Block 1 runs EXACTLY in space-to-depth-packed space: full-res
        # 3-channel convs are layout-bound on TPU (~1 TF/s measured). A 3x3
        # conv on the original grid equals a 3x3 conv on the s2d(2) grid
        # with rearranged (4x in / 4x out channel) weights — load_pretrained
        # performs that exact weight transform, pack_conv_weights. The
        # relu1_1 tap is compared in packed space (the L1 mean is
        # permutation-invariant) and max-pool over 2x2 pixels becomes a max
        # over the 4 channel groups, so nothing is ever unpacked.
        from .layers import space_to_depth
        assert x.shape[1] % 2 == 0 and x.shape[2] % 2 == 0
        x = space_to_depth(x, 2)
        for c in range(_CFG[0][1]):
            x = nn.Conv(4 * _CFG[0][0], (3, 3), padding="SAME",
                        dtype=self.dtype, param_dtype=jnp.float32,
                        name=f"conv{conv_i}")(x)
            x = nn.relu(x)
            if c == 0:
                taps.append(x.astype(jnp.float32))
            conv_i += 1
        # packed 2x2-pixel max pool: max over the 4 channel groups
        w1 = _CFG[0][0]
        x = jnp.maximum(x[..., : 2 * w1], x[..., 2 * w1:])
        x = jnp.maximum(x[..., :w1], x[..., w1:])
        for block, (width, n_convs) in enumerate(_CFG):
            if block == 0:
                continue
            last_block = block == len(_CFG) - 1
            for c in range(n_convs):
                x = nn.Conv(width, (3, 3), padding="SAME", dtype=self.dtype,
                            param_dtype=jnp.float32,
                            name=f"conv{conv_i}")(x)
                x = nn.relu(x)
                if c == 0:
                    taps.append(x.astype(jnp.float32))
                    if last_block:
                        return taps   # relu5_1 is the deepest tap used
                conv_i += 1
            if not last_block:
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
        return taps


def init_vgg_params(rng: jax.Array = None, image_size: int = 64):
    """Deterministic random-feature VGG params (documented fallback)."""
    rng = jax.random.PRNGKey(0) if rng is None else rng
    model = VGG19Features()
    dummy = jnp.zeros((1, image_size, image_size, 3), jnp.float32)
    return jax.jit(model.init)(rng, dummy)["params"]


def load_pretrained(path: str):
    """Convert a torchvision vgg19 state_dict (.npz or .pth) to flax params.

    .npz: arrays under keys `features.{i}.weight` / `features.{i}.bias`.
    .pth: loaded via torch (CPU) if available.
    """
    if path.endswith(".pth") or path.endswith(".pt"):
        import torch
        sd = torch.load(path, map_location="cpu")
        if hasattr(sd, "state_dict"):
            sd = sd.state_dict()
        arrays = {k: v.numpy() for k, v in sd.items()}
    else:
        arrays = dict(np.load(path))
    params = {}
    # only convs up to the deepest tap (relu5_1 = torchvision features.28)
    # exist in the module
    for conv_i, tv_i in enumerate(_TV_CONV_IDX[:13]):
        w = arrays[f"features.{tv_i}.weight"]   # OIHW
        b = arrays[f"features.{tv_i}.bias"]
        kernel = np.transpose(w, (2, 3, 1, 0))  # HWIO
        if conv_i < _CFG[0][1]:
            kernel, b = pack_conv_weights(kernel, b, 2)  # block-1 runs packed
        params[f"conv{conv_i}"] = {
            "kernel": jnp.asarray(kernel),
            "bias": jnp.asarray(b),
        }
    return params


def pack_conv_weights(w: np.ndarray, b: np.ndarray, f: int = 2):
    """Exact weight transform: 3x3 SAME conv on the original grid -> 3x3
    SAME conv on the space_to_depth(f) grid.

    Packed channel order matches layers.space_to_depth:
    k = row_offset * (f*C) + col_offset * C + c. Output pixel (fH+m, fW+n)
    needs original tap (fH+m+dy-1, fW+n+dx-1) = packed pixel
    (H + (m+dy-1)//f, W + (n+dx-1)//f) channel group ((m+dy-1)%f,
    (n+dx-1)%f); offsets stay within one packed step, so the packed kernel
    is again 3x3 (3/4 structurally zero — MXU cost 4x FLOPs but ~100x
    better utilization than a 3-channel full-res conv). Border behavior is
    exact: packed SAME padding zero-fills precisely the original padded
    rows, and taps beyond them carry zero weights.
    """
    K = w.shape[0]
    assert K == 3 and w.shape[1] == 3, "transform written for 3x3 convs"
    Cin, Cout = w.shape[2], w.shape[3]
    wp = np.zeros((3, 3, f * f * Cin, f * f * Cout), w.dtype)
    for m in range(f):
        for n in range(f):
            out_sl = slice(m * f * Cout + n * Cout,
                           m * f * Cout + (n + 1) * Cout)
            for dy in range(K):
                a, i = divmod(m + dy - 1, f)
                for dx in range(K):
                    bb, j = divmod(n + dx - 1, f)
                    in_sl = slice(i * f * Cin + j * Cin,
                                  i * f * Cin + (j + 1) * Cin)
                    wp[a + 1, bb + 1, in_sl, out_sl] += w[dy, dx]
    return wp, np.tile(b, f * f)


def get_vgg_params(weights_path: str = ""):
    """Pretrained params if a weights file is available, else random-feature."""
    path = weights_path or os.environ.get("VGG19_WEIGHTS", "")
    if path and os.path.exists(path):
        return load_pretrained(path)
    return init_vgg_params()
