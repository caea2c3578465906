"""Compact host->device wire format for training batches.

A 512px stage-2 batch in float32 is ~14 MB/sample (image + prev + mask +
IUV + two flows); over a tunneled/remote device link the per-step upload —
not compute — bounds real training throughput (measured: ~70 s epochs vs
the 7 s the compiled step sustains). Every image-like modality is 8-bit at
the source (PNG frames/masks, IUV codes) so shipping float32 is pure waste:
pack to uint8/float16 on the host, upload ~4x fewer bytes, and dequantize
on device as the first (fused, free) ops of the jitted step.

Precision, honestly: bit-exact when the host pipeline leaves values on the
decoder's 1/255 grid (native-resolution training, NEAREST-resized masks/
IUV). When an interpolating resize ran first (e.g. --loadSize below the
native resolution: INTER_AREA frames, scale_width letterboxing), values
leave the 8-bit grid and re-quantization rounds them by up to 1/255
(~0.002 in [-1,1] — below the bf16 compute noise the step runs in
anyway). flow/Laplace ship as float16 after the canvas rescale (max
rounding ~1e-3 relative). `--no_wire_pack` restores exact float32 at 4x
the wire bytes.

Packing runs in the BatchLoader's worker thread; `unpack_batch` is
dtype-driven, so raw float32 batches pass through unchanged and the same
jitted step serves both formats without recompiling gymnastics.
"""

from __future__ import annotations

from typing import Dict

import numpy as np

# [-1, 1] images quantized on the decoder's own 8-bit grid
_U8_SYM = ("image", "image_prev", "bg", "pose_img", "pose_img_prev")
_U8_UNIT = ("mask", "dp_uv")          # [0, 1]
_F16 = ("flow", "flow_inv", "laplace")


def pack_batch(batch: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """float32 host batch -> compact wire batch (uint8 / float16)."""
    out = {}
    for k, v in batch.items():
        if k in _U8_SYM:
            out[k] = np.round((v.astype(np.float32) + 1.0) * 127.5) \
                .astype(np.uint8)
        elif k in _U8_UNIT:
            out[k] = np.round(v.astype(np.float32) * 255.0).astype(np.uint8)
        elif k == "dp_parts":
            out[k] = v.astype(np.uint8)          # 0..24
        elif k in _F16:
            out[k] = v.astype(np.float16)
        else:
            out[k] = v
    return out


def unpack_batch(batch):
    """Wire batch -> float32/int32 compute batch, as device (jnp) ops.

    Dtype-driven: float32 inputs pass through untouched, so steps accept
    both raw and packed batches.
    """
    import jax.numpy as jnp

    out = {}
    for k, v in batch.items():
        if k in _U8_SYM and v.dtype == jnp.uint8:
            out[k] = v.astype(jnp.float32) / 127.5 - 1.0
        elif k in _U8_UNIT and v.dtype == jnp.uint8:
            out[k] = v.astype(jnp.float32) / 255.0
        elif k == "dp_parts":
            out[k] = v.astype(jnp.int32)
        elif k in _F16 and v.dtype == jnp.float16:
            out[k] = v.astype(jnp.float32)
        else:
            out[k] = v
    return out
