#!/usr/bin/env python3
"""Export the inference forward (keypoints -> frame) as a serialized
StableHLO artifact for serving.

Captures the whole jitted pipeline — on-device pose rasterization, TransG,
TexG, texture warp, BG composite — as one portable `jax.export` artifact
(checkpoint weights baked in as constants) that a serving runtime can
deserialize and call without the model code:

    python tools/export_serving.py --name run --checkpoints_dir ckpts \
        --which_epoch 30 --batch 8 --out model.jaxexport [sizing flags]

Reload anywhere:  exported = jax.export.deserialize(blob)
                  frame = exported.call(joints)   # (B,18,3) -> (B,S,S,3)
"""

import argparse
import dataclasses
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def build_exported(opt, batch: int):
    """Returns (jax.export.Exported, example joints array)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax import export as jexport

    from neural_human_video_rendering_tpu.data import dataset as dsm
    from neural_human_video_rendering_tpu.train.state import create_train_state
    from neural_human_video_rendering_tpu.train.steps import build_pose_input
    from neural_human_video_rendering_tpu.utils import checkpoint as ckpt

    ds = dsm.SyntheticDataset(opt, length=batch)
    tex = (dsm.load_texture_atlas(opt.texture_path, opt.tex_tile,
                                  opt.tex_rows, opt.tex_cols)
           if opt.texture_path and os.path.isfile(opt.texture_path)
           else ds.texture_atlas())
    bg = (dsm.load_image(opt.bg_path, opt.train_size)
          if opt.bg_path and os.path.isfile(opt.bg_path) else ds.background())
    bundle = create_train_state(opt, jax.random.PRNGKey(opt.seed), tex, bg,
                                with_discriminator=False)
    state = bundle["state"]
    g_params = state.g_params
    if os.path.isdir(opt.run_dir) and ckpt.latest_epoch(opt.run_dir, "G"):
        g_params = ckpt.load_net(opt.run_dir, "G", opt.which_epoch, g_params)
        print(f"[export] baked G epoch {opt.which_epoch} from {opt.run_dir}",
              file=sys.stderr)
    else:
        print("[export] no checkpoint found -> random-init weights",
              file=sys.stderr)

    renderer = bundle["renderer"]
    assets = (state.static_tex, state.bg, state.tex_mask)

    def serve(joints):
        static_tex, bg_a, tex_mask = assets
        pose = build_pose_input(opt, joints, None)
        outs = renderer.apply({"params": g_params}, pose, bg_a[None],
                              static_tex[None], tex_mask)
        return outs["fake"]

    joints = jnp.asarray(np.stack([ds[i]["joints"] for i in range(batch)]))
    exported = jexport.export(jax.jit(serve))(joints)
    return exported, joints


def main():
    from neural_human_video_rendering_tpu.config import Options, _add_flags
    p = argparse.ArgumentParser(conflict_handler="resolve")
    p.add_argument("--out", required=True)
    p.add_argument("--batch", type=int, default=8)
    _add_flags(p)
    a = p.parse_args()
    opt = Options(**{f.name: getattr(a, f.name)
                     for f in dataclasses.fields(Options) if hasattr(a, f.name)})

    exported, joints = build_exported(opt, a.batch)
    blob = exported.serialize()
    with open(a.out, "wb") as f:
        f.write(blob)
    print(f"wrote {a.out} ({len(blob) / 1e6:.1f} MB), "
          f"input joints{tuple(joints.shape)} -> frame "
          f"({a.batch}, {opt.train_size}, {opt.train_size}, 3)")


if __name__ == "__main__":
    main()
