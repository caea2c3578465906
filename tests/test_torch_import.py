"""Torch checkpoint import: numerical parity of a converted pix2pixHD
GlobalGenerator against the torch original (SURVEY.md §2 #21 migration
path; transforms documented in utils/torch_import.py)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from neural_human_video_rendering_tpu.models.generators import \
    GlobalGenerator  # noqa: E402
from neural_human_video_rendering_tpu.utils.torch_import import (  # noqa: E402
    convert_global_generator, ordered_torch_convs)

NGF, N_DOWN, N_BLOCKS, IN_NC, OUT_NC = 4, 2, 2, 3, 5


def _torch_global_generator():
    """pix2pixHD GlobalGenerator (reflect stem/head + resblocks, zero-pad
    stride-2 downs, ConvTranspose2d(k3,s2,p1,op1) ups, affine-free IN)."""
    import torch.nn as nn

    class ResBlock(nn.Module):
        def __init__(self, dim):
            super().__init__()
            self.body = nn.Sequential(
                nn.ReflectionPad2d(1), nn.Conv2d(dim, dim, 3),
                nn.InstanceNorm2d(dim), nn.ReLU(True),
                nn.ReflectionPad2d(1), nn.Conv2d(dim, dim, 3),
                nn.InstanceNorm2d(dim))

        def forward(self, x):
            return x + self.body(x)

    layers = [nn.ReflectionPad2d(3), nn.Conv2d(IN_NC, NGF, 7),
              nn.InstanceNorm2d(NGF), nn.ReLU(True)]
    for i in range(N_DOWN):
        m = NGF * 2 ** i
        layers += [nn.Conv2d(m, m * 2, 3, stride=2, padding=1),
                   nn.InstanceNorm2d(m * 2), nn.ReLU(True)]
    dim = NGF * 2 ** N_DOWN
    layers += [ResBlock(dim) for _ in range(N_BLOCKS)]
    for i in range(N_DOWN):
        m = NGF * 2 ** (N_DOWN - i)
        layers += [nn.ConvTranspose2d(m, m // 2, 3, stride=2, padding=1,
                                      output_padding=1),
                   nn.InstanceNorm2d(m // 2), nn.ReLU(True)]
    layers += [nn.ReflectionPad2d(3), nn.Conv2d(NGF, OUT_NC, 7), nn.Tanh()]
    return nn.Sequential(*layers)


def test_converted_generator_matches_torch_outputs():
    tg = _torch_global_generator()
    tg.eval()
    x = np.random.RandomState(0).randn(2, 16, 16, IN_NC).astype(np.float32)
    with torch.no_grad():
        ty = tg(torch.from_numpy(x.transpose(0, 3, 1, 2))) \
            .numpy().transpose(0, 2, 3, 1)

    fg = GlobalGenerator(OUT_NC, NGF, N_DOWN, N_BLOCKS, final_tanh=True,
                         pad_mode="reflect", upsample_mode="deconv")
    init = fg.init(jax.random.PRNGKey(0), jnp.asarray(x))["params"]
    sd = {k: v.numpy() for k, v in tg.state_dict().items()}
    conv = convert_global_generator(sd, init)
    jy = np.asarray(fg.apply({"params": conv}, jnp.asarray(x)))

    assert jy.shape == ty.shape
    np.testing.assert_allclose(jy, ty, atol=2e-5, rtol=1e-4)


def test_conv_count_and_shape_guards():
    fg = GlobalGenerator(OUT_NC, NGF, N_DOWN, N_BLOCKS, final_tanh=True,
                         pad_mode="reflect", upsample_mode="deconv")
    init = fg.init(jax.random.PRNGKey(0),
                   jnp.zeros((1, 16, 16, IN_NC)))["params"]
    tg = _torch_global_generator()
    sd = {k: v.numpy() for k, v in tg.state_dict().items()}
    # drop one conv -> count mismatch must be reported
    first_w = next(k for k in sd if k.endswith(".weight"))
    bad = {k: v for k, v in sd.items() if not k.startswith(first_w[:-7])}
    with pytest.raises(ValueError, match="conv count mismatch"):
        convert_global_generator(bad, init)
    # ordered extraction sees exactly the conv layers, in definition order
    convs = ordered_torch_convs(sd)
    assert len(convs) == (1 + N_DOWN) + 2 * N_BLOCKS + N_DOWN + 1
    assert convs[0][1].shape == (NGF, IN_NC, 7, 7)
    assert convs[-1][1].shape == (OUT_NC, NGF, 7, 7)
