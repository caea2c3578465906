"""pre_train_tex driver behavior: --use_mask_texture masking and
--continue_train resume (reference flags: pre_train_tex.sh:12; pix2pixHD
continue_train semantics)."""

import dataclasses
import os

import jax.numpy as jnp
import numpy as np

from neural_human_video_rendering_tpu.train.drivers import run_pretrain_tex
from neural_human_video_rendering_tpu.utils import checkpoint as ckpt


def _opt(tiny_opt, tmp_path, **kw):
    kw.setdefault("niter", 1)
    return dataclasses.replace(
        tiny_opt, checkpoints_dir=str(tmp_path), name="texstage",
        no_decay=True, save_epoch_freq=1, print_freq=100,
        display_freq=10 ** 9, no_html=True, **kw)


def test_masked_pretrain_and_resume(tiny_opt, tmp_path, capsys):
    opt = _opt(tiny_opt, tmp_path, use_mask_texture=True)
    carry = run_pretrain_tex(opt)
    params_ep1 = carry[0]
    run_dir = opt.run_dir
    assert os.path.isfile(os.path.join(run_dir, "1_net_TexG.msgpack"))
    assert ckpt.latest_epoch(run_dir, "TexG") == "1"

    # resume: params start from the epoch-1 checkpoint, not random init,
    # and the epoch counter CONTINUES (pix2pixHD continue_train semantics:
    # a 2-epoch schedule resumed from epoch 1 trains only epoch 2 — it
    # does not re-run and re-log epoch 1)
    opt2 = _opt(tiny_opt, tmp_path, use_mask_texture=True,
                continue_train=True, niter=2)
    capsys.readouterr()
    carry2 = run_pretrain_tex(opt2)
    out = capsys.readouterr().out
    assert "[ckpt] resumed at epoch 2" in out
    assert "End of epoch 2 / 2" in out and "End of epoch 1" not in out

    # training moved the params on from the restored point
    import jax
    leaves1 = jnp.concatenate([x.ravel() for x in
                               jax.tree_util.tree_leaves(params_ep1)])
    leaves2 = jnp.concatenate([x.ravel() for x in
                               jax.tree_util.tree_leaves(carry2[0])])
    assert leaves1.shape == leaves2.shape
    assert not np.allclose(np.asarray(leaves1), np.asarray(leaves2))
