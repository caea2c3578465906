#!/usr/bin/env python3
"""Convert a pix2pixHD-style PyTorch subnet checkpoint (.pth/.npz state_dict)
into this framework's msgpack checkpoint format.

Reference users keep their trained checkpoints (SURVEY.md §2 #21;
e.g. ``30_net_TransG.pth``) instead of retraining:

    python tools/import_torch_checkpoint.py 30_net_TransG.pth \
        --label TransG --epoch 30 --out_dir ckpts/dance15 \
        --n_blocks_translate 5 [other reference sizing flags]

Writes ``{out_dir}/{epoch}_net_{label}.msgpack`` (+ latest copy) loadable by
--load_pretrain_TransG / --which_epoch. Requires the parity topology flags
the checkpoint was trained with (pad_mode=reflect, upsample_mode=deconv).
"""

import argparse
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    p = argparse.ArgumentParser(conflict_handler="resolve")
    p.add_argument("checkpoint", help=".pth or .npz state_dict")
    p.add_argument("--label", default="TransG",
                   choices=["TransG", "TexG", "BGNet"])
    p.add_argument("--epoch", default="latest")
    p.add_argument("--out_dir", required=True)
    from neural_human_video_rendering_tpu.config import _add_flags
    _add_flags(p)
    a = p.parse_args()

    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    from neural_human_video_rendering_tpu.runtime import setup_jax
    setup_jax()  # sitecustomize may outrank the env var; re-assert it
    import jax
    import jax.numpy as jnp

    from neural_human_video_rendering_tpu.config import Options
    import dataclasses
    opt = Options(**{f.name: getattr(a, f.name)
                     for f in dataclasses.fields(Options) if hasattr(a, f.name)})
    opt = dataclasses.replace(opt, pad_mode="reflect",
                              upsample_mode="deconv", stem_s2d=1, head_s2d=1,
                              bg_s2d=1)

    from neural_human_video_rendering_tpu.models.generators import (BGNet,
                                                                    TexG,
                                                                    TransG)
    from neural_human_video_rendering_tpu.utils import checkpoint as ckpt
    from neural_human_video_rendering_tpu.utils.torch_import import (
        convert_global_generator, load_torch_state_dict)

    S = max(opt.loadSize, 4 * 2 ** opt.n_downsample_translate)
    if a.label == "TransG":
        net = TransG(opt.n_parts, opt.ngf, opt.n_downsample_translate,
                     opt.n_blocks_translate, pad_mode="reflect",
                     upsample_mode="deconv")
        x = jnp.zeros((1, S, S, opt.pose_nc))
    elif a.label == "TexG":
        net = TexG(opt.n_parts, opt.tex_tile, opt.ngf_global,
                   opt.n_downsample_global, opt.n_blocks_global,
                   pad_mode="reflect", upsample_mode="deconv")
        x = jnp.zeros((1, S, S, opt.pose_nc))
    else:
        net = BGNet(32, opt.n_downsample_bg, opt.n_blocks_bg,
                    pad_mode="reflect", upsample_mode="deconv")
        x = jnp.zeros((1, S, S, 3))

    params = jax.jit(net.init)(jax.random.PRNGKey(0), x)["params"]
    sd = load_torch_state_dict(a.checkpoint)
    converted = convert_global_generator(sd, params["GlobalGenerator_0"])
    tree = dict(params)
    tree["GlobalGenerator_0"] = converted
    path = ckpt.save_net(a.out_dir, a.label, a.epoch, tree)
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
