"""Quality-parity evaluation: rendered frames vs ground-truth frames.

The reference ships no eval script (SURVEY.md §6 — its paper reports
perceptual metrics, but nothing on disk reproduces them); BASELINE.md's
north star is "LPIPS/SSIM parity with reference renders at 512px". This
module is the measurement contract for that target: given two frame
directories (e.g. `--results_dir` output of test.py and the real video
frames, or renders from two frameworks), it reports PSNR, SSIM and a
VGG-feature perceptual distance (LPIPS-style; exact LPIPS needs the
torchvision weights — drop them at $VGG19_WEIGHTS, see models/vgg.py).

Frames are matched by the numeric part of their basenames (so
`frame00007_synthesized.jpg` pairs with `frame00007.png`), falling back to
sorted order when either side has no digits. All metric math runs batched
under jit.
"""

from __future__ import annotations

import json
import os
import re
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..data import dataset as dsm
from ..models import vgg as vggm
from ..utils import metrics as M


def _frame_key(name: str) -> str:
    """Digits of a basename, as the pairing key ('frame00007_synth' -> '00007')."""
    digits = re.findall(r"\d+", os.path.splitext(name)[0])
    return digits[-1] if digits else name


def pair_frames(dir_a: str, dir_b: str) -> List[Tuple[str, str]]:
    """Pair image files across two dirs by frame number (sorted-order fallback)."""
    fa, fb = dsm.list_images(dir_a), dsm.list_images(dir_b)
    if not fa or not fb:
        raise FileNotFoundError(f"no images in {dir_a if not fa else dir_b}")
    ka = {_frame_key(f): f for f in fa}
    kb = {_frame_key(f): f for f in fb}
    # numeric sort where keys are frame numbers: lexicographic order breaks
    # non-zero-padded names (frame1, frame10, frame11, ..., frame2), which
    # PSNR/SSIM would survive but the temporal metric's consecutive-pair
    # assumption would not
    common = sorted(set(ka) & set(kb),
                    key=lambda k: (0, int(k)) if k.isdigit() else (1, k))
    if common:
        return [(ka[k], kb[k]) for k in common]
    n = min(len(fa), len(fb))
    return list(zip(fa[:n], fb[:n]))


def _metric_fns(vgg_params, want_vgg: bool, lpips_lin):
    @jax.jit
    def batch_metrics(a, b):
        # per-sample vectors so padded tail entries can be dropped exactly
        # (a padded-batch mean would over-weight the duplicated last frame,
        # ADVICE r1 #4)
        out = {"psnr": M.psnr(a, b, per_sample=True),
               "ssim": M.ssim(a, b, per_sample=True)}
        if want_vgg:
            out["vgg_dist"] = M.vgg_distance(vgg_params, a, b,
                                             per_sample=True)
        if lpips_lin is not None:
            from ..utils.lpips import lpips_distance
            out["lpips"] = lpips_distance(vgg_params, a, b, lpips_lin,
                                          per_sample=True)
        return out
    return batch_metrics


def temporal_flicker(results_dir: str, gt_dir: str, pairs, size: int,
                     batch_size: int = 8) -> Dict[str, float]:
    """Temporal-consistency metric over CONSECUTIVE frame pairs.

    Video renderers can score well per-frame yet flicker; the reference's
    whole --lambda_Temp mechanism exists to prevent that (SURVEY.md §2
    #18). Reported: mean |f_t - f_{t-1}| of the renders, the same for the
    ground truth (the sequence's intrinsic motion energy), and their
    ratio — 1.0 means the renders carry exactly the GT's temporal
    variation; >1 is flicker, <1 is over-smoothing."""
    @jax.jit
    def diff(a, b):
        return jnp.mean(jnp.abs(a - b), axis=(1, 2, 3))

    def seq_l1(d, names):
        total, n = 0.0, 0
        for s in range(0, len(names) - 1, batch_size):
            chunk = [(names[i], names[i + 1])
                     for i in range(s, min(s + batch_size,
                                           len(names) - 1))]
            padded = chunk + [chunk[-1]] * (batch_size - len(chunk))
            a = jnp.asarray(np.stack([dsm.load_image(os.path.join(d, p[0]),
                                                     size) for p in padded]))
            b = jnp.asarray(np.stack([dsm.load_image(os.path.join(d, p[1]),
                                                     size) for p in padded]))
            total += float(np.sum(np.asarray(diff(a, b))[:len(chunk)]))
            n += len(chunk)
        return total / max(n, 1)

    res_l1 = seq_l1(results_dir, [p[0] for p in pairs])
    gt_l1 = seq_l1(gt_dir, [p[1] for p in pairs])
    return {"temporal_l1": res_l1, "temporal_l1_gt": gt_l1,
            "flicker_ratio": res_l1 / max(gt_l1, 1e-8)}


def evaluate_dirs(results_dir: str, gt_dir: str, size: int = 512,
                  batch_size: int = 8, max_frames: Optional[int] = None,
                  use_vgg: bool = True, use_lpips: bool = False,
                  lpips_weights: str = "",
                  use_temporal: bool = False) -> Dict[str, float]:
    """Mean PSNR / SSIM / VGG / LPIPS distances over paired frames."""
    pairs = pair_frames(results_dir, gt_dir)
    if max_frames is not None:
        pairs = pairs[:max_frames]

    vgg_params = vggm.get_vgg_params() if (use_vgg or use_lpips) else None
    lpips_lin = None
    if use_lpips:
        from ..utils.lpips import get_lin_weights
        lpips_lin = get_lin_weights(lpips_weights)
    fn = _metric_fns(vgg_params, use_vgg, lpips_lin)

    sums: Dict[str, float] = {}
    n_frames = 0
    for start in range(0, len(pairs), batch_size):
        chunk = pairs[start:start + batch_size]
        # pad the tail so the compiled metric sees one batch shape; padded
        # entries are sliced off the per-sample vectors before averaging
        padded = chunk + [chunk[-1]] * (batch_size - len(chunk))
        a = jnp.asarray(np.stack([
            dsm.load_image(os.path.join(results_dir, p[0]), size) for p in padded]))
        b = jnp.asarray(np.stack([
            dsm.load_image(os.path.join(gt_dir, p[1]), size) for p in padded]))
        vals = fn(a, b)
        for k, v in vals.items():
            sums[k] = sums.get(k, 0.0) + float(np.sum(
                np.asarray(v)[:len(chunk)]))
        n_frames += len(chunk)
    out = {k: v / n_frames for k, v in sums.items()}
    if use_temporal and len(pairs) > 1:
        out.update(temporal_flicker(results_dir, gt_dir, pairs, size,
                                    batch_size))
    out["frames"] = float(len(pairs))
    return out


def main(argv=None) -> Dict[str, float]:
    import argparse
    p = argparse.ArgumentParser(
        description="PSNR/SSIM/perceptual parity between two frame directories")
    p.add_argument("--results_dir", required=True,
                   help="rendered frames (test.py output images dir)")
    p.add_argument("--gt_dir", required=True,
                   help="ground-truth / reference frames")
    p.add_argument("--loadSize", type=int, default=512)
    p.add_argument("--batch_size", type=int, default=8)
    p.add_argument("--max_frames", type=int, default=0, help="0 = all")
    p.add_argument("--no_vgg", action="store_true",
                   help="skip the VGG perceptual distance")
    p.add_argument("--metric", default="",
                   help="extra metrics, comma list; 'lpips' adds the LPIPS "
                        "distance (weight-gated: uniform linear head until "
                        "$LPIPS_WEIGHTS/--lpips_weights provides the "
                        "official checkpoint, utils/lpips.py); 'temporal' "
                        "adds consecutive-frame flicker vs the GT's own "
                        "motion energy")
    p.add_argument("--lpips_weights", default="",
                   help="LPIPS linear-head checkpoint (.pth of the lpips "
                        "package, or .npz with lin{i} arrays)")
    p.add_argument("--out", default="", help="also write metrics JSON here")
    a = p.parse_args(argv)

    extra = {m.strip() for m in a.metric.split(",") if m.strip()}
    unknown = extra - {"lpips", "temporal"}
    if unknown:
        p.error(f"--metric accepts 'lpips' and/or 'temporal' (got "
                f"{sorted(unknown)}); PSNR/SSIM are always computed and "
                "the VGG distance is controlled by --no_vgg")
    res = evaluate_dirs(a.results_dir, a.gt_dir, a.loadSize, a.batch_size,
                        a.max_frames or None, use_vgg=not a.no_vgg,
                        use_lpips="lpips" in extra,
                        lpips_weights=a.lpips_weights,
                        use_temporal="temporal" in extra)
    line = json.dumps({k: round(v, 5) for k, v in res.items()})
    print(line)
    if a.out:
        os.makedirs(os.path.dirname(a.out) or ".", exist_ok=True)
        with open(a.out, "w") as f:
            f.write(line + "\n")
    return res
