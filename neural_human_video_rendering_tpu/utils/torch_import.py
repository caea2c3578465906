"""Import pix2pixHD-style PyTorch checkpoints into this framework.

The reference trains pix2pixHD-lineage generators and saves per-subnet
``.pth`` state_dicts (SURVEY.md §2 #21; reference: --load_pretrain_TransG /
--which_epoch train_start/pretrain_start.sh:29-30, test_start/start.sh:28).
A reference user migrating here can convert those checkpoints instead of
retraining: this module maps an ordered pix2pixHD ``GlobalGenerator``
state_dict onto our flax ``GlobalGenerator`` parameter tree.

Weight-layout transforms (verified numerically against torch in
tests/test_torch_import.py — full-network output parity to ~1e-5):
  * Conv2d       (O, I, kH, kW)  -> flax Conv kernel (kH, kW, I, O)
  * ConvTranspose2d (I, O, kH, kW) -> flax ConvTranspose kernel
    (kH, kW, I, O) with BOTH spatial axes flipped (torch's deconv is the
    gradient of conv = input-dilated correlation with a flipped kernel);
    models.layers.Upsample pads (1, 2) to match torch's (padding=1,
    output_padding=1) alignment exactly.
  * InstanceNorm2d is affine-free in pix2pixHD — no parameters to map.

Requires the parity topology: pad_mode='reflect', upsample_mode='deconv',
stem_s2d=head_s2d=1 (the importer checks shapes layer-by-layer and reports
the first mismatch). torch is only needed to read ``.pth``; ``.npz`` dumps
of the same state_dict work without torch.
"""

from __future__ import annotations

import re
from typing import Any, Dict, List, Tuple

import numpy as np


def _natural(name: str) -> Tuple[str, int]:
    m = re.match(r"(.*)_(\d+)$", name)
    return (m.group(1), int(m.group(2))) if m else (name, -1)


def _module_order(gg_params: Dict[str, Any]) -> List[Tuple[str, ...]]:
    """Execution-ordered conv-param paths inside one GlobalGenerator tree.

    flax name-sorts children, but execution order is: ConvNormRelu_0
    (stem) .. ConvNormRelu_{nd} (downs), ResnetBlock_* (two convs each),
    Upsample_*, ConvNormRelu_{nd+1} (head). Reconstructed from the index
    structure; `nd` = #Upsample modules (parity topology).
    """
    cnr = sorted((k for k in gg_params if k.startswith("ConvNormRelu_")),
                 key=_natural)
    rbs = sorted((k for k in gg_params if k.startswith("ResnetBlock_")),
                 key=_natural)
    ups = sorted((k for k in gg_params if k.startswith("Upsample_")),
                 key=_natural)
    nd = len(ups)
    if len(cnr) != nd + 2:
        raise ValueError(
            f"unsupported topology: {len(cnr)} ConvNormRelu modules with "
            f"{nd} Upsamples — importer needs the parity config "
            "(stem_s2d=head_s2d=1, upsample_mode=deconv)")
    order: List[Tuple[str, ...]] = []
    for k in cnr[: nd + 1]:                      # stem + downsamples
        order.append((k, "Conv_0"))
    for rb in rbs:
        order.append((rb, "ConvNormRelu_0", "Conv_0"))
        order.append((rb, "ConvNormRelu_1", "Conv_0"))
    for up in ups:
        order.append((up, "ConvTranspose_0"))
    order.append((cnr[nd + 1], "Conv_0"))        # head
    return order


def _get(tree: Dict[str, Any], path: Tuple[str, ...]) -> Dict[str, Any]:
    for p in path:
        tree = tree[p]
    return tree


def _set(tree: Dict[str, Any], path: Tuple[str, ...], value: Dict[str, Any]):
    for p in path[:-1]:
        tree = tree[p]
    tree[path[-1]] = value


def ordered_torch_convs(state_dict: Dict[str, Any]) -> List[Tuple[str, np.ndarray, np.ndarray]]:
    """(name, weight, bias) for every 4-D conv tensor, in state_dict order
    (torch state_dicts preserve module definition order)."""
    out = []
    for k in state_dict:
        if not k.endswith(".weight"):
            continue
        w = np.asarray(state_dict[k])
        if w.ndim != 4:
            continue
        bkey = k[: -len(".weight")] + ".bias"
        b = np.asarray(state_dict[bkey]) if bkey in state_dict else None
        out.append((k, w, b))
    return out


def convert_global_generator(state_dict: Dict[str, Any],
                             target_params: Dict[str, Any]) -> Dict[str, Any]:
    """Map a pix2pixHD GlobalGenerator state_dict onto our flax tree.

    `target_params` is the init tree of ONE models.generators.GlobalGenerator
    (e.g. params['GlobalGenerator_0'] of TransG). Returns a new tree of the
    same structure with converted weights.
    """
    import copy
    out = copy.deepcopy(
        {k: v for k, v in target_params.items()})  # plain nested dicts
    order = _module_order(out)
    convs = ordered_torch_convs(state_dict)
    if len(convs) != len(order):
        raise ValueError(
            f"conv count mismatch: checkpoint has {len(convs)} conv layers, "
            f"target expects {len(order)} — architecture flags differ")
    for (name, w, b), path in zip(convs, order):
        leaf = _get(out, path)
        is_deconv = path[-1].startswith("ConvTranspose")
        if is_deconv:
            k = np.ascontiguousarray(w.transpose(2, 3, 0, 1)[::-1, ::-1])
        else:
            k = np.ascontiguousarray(w.transpose(2, 3, 1, 0))
        if tuple(k.shape) != tuple(np.shape(leaf["kernel"])):
            raise ValueError(
                f"shape mismatch at {'/'.join(path)} <- {name}: "
                f"{k.shape} vs {np.shape(leaf['kernel'])}")
        new = {"kernel": k.astype(np.float32)}
        if "bias" in leaf:
            if b is None:
                raise ValueError(f"{name}: checkpoint has no bias")
            new["bias"] = np.asarray(b, np.float32)
        _set(out, path, new)
    return out


def load_torch_state_dict(path: str) -> Dict[str, Any]:
    """Read a .pth (torch) or .npz state_dict; strips DataParallel
    'module.' prefixes."""
    if path.endswith(".npz"):
        sd = dict(np.load(path))
    else:
        import torch
        raw = torch.load(path, map_location="cpu", weights_only=True)
        if hasattr(raw, "state_dict"):
            raw = raw.state_dict()
        sd = {k: v.numpy() if hasattr(v, "numpy") else np.asarray(v)
              for k, v in raw.items()}
    return {k[len("module."):] if k.startswith("module.") else k: v
            for k, v in sd.items()}
