"""VGG19 feature extractor vs torch: pins the torchvision weight ingest
(load_pretrained-style OIHW->HWIO + the exact packed-space block-1 weight
transform pack_conv_weights) numerically against a real torch forward."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from neural_human_video_rendering_tpu.models.layers import \
    depth_to_space  # noqa: E402
from neural_human_video_rendering_tpu.models import vgg as vggm  # noqa: E402


def _torch_vgg19_taps(x_nchw):
    """Random-weight torch replica of torchvision vgg19.features up to
    relu5_1, returning the five pix2pixHD tap activations and a
    torchvision-keyed state_dict."""
    import torch.nn as nn
    torch.manual_seed(0)
    cfg = [(3, 64), (64, 64), "P", (64, 128), (128, 128), "P",
           (128, 256), (256, 256), (256, 256), (256, 256), "P",
           (256, 512), (512, 512), (512, 512), (512, 512), "P",
           (512, 512)]
    mods, sd, feats = [], {}, []
    tv_i = 0
    taps_at = set()
    convs_in_block = 0
    for item in cfg:
        if item == "P":
            mods.append(nn.MaxPool2d(2, 2))
            tv_i += 1
            convs_in_block = 0
            continue
        conv = nn.Conv2d(item[0], item[1], 3, padding=1)
        mods.append(conv)
        sd[f"features.{tv_i}.weight"] = conv.weight.detach().numpy()
        sd[f"features.{tv_i}.bias"] = conv.bias.detach().numpy()
        tv_i += 1
        mods.append(nn.ReLU())
        if convs_in_block == 0:
            taps_at.add(len(mods) - 1)
        tv_i += 1
        convs_in_block += 1
    seq = nn.Sequential(*mods)
    with torch.no_grad():
        h = x_nchw
        for i, m in enumerate(seq):
            h = m(h)
            if i in taps_at:
                feats.append(h.numpy().transpose(0, 2, 3, 1))
    return feats, sd


def test_vgg_taps_match_torch(tmp_path):
    S = 32
    rng = np.random.RandomState(1)
    img = rng.uniform(-1, 1, (2, S, S, 3)).astype(np.float32)

    # identical ImageNet preprocessing on the torch side (our module does it
    # internally from [-1,1] input)
    x01 = (img + 1.0) * 0.5
    mean = np.array([0.485, 0.456, 0.406], np.float32)
    std = np.array([0.229, 0.224, 0.225], np.float32)
    xt = torch.from_numpy(((x01 - mean) / std).transpose(0, 3, 1, 2).copy())
    t_feats, sd = _torch_vgg19_taps(xt)

    npz = str(tmp_path / "vgg19.npz")
    np.savez(npz, **sd)
    params = vggm.load_pretrained(npz)
    model = vggm.VGG19Features(dtype=jnp.float32)
    j_feats = model.apply({"params": params}, jnp.asarray(img))

    assert len(j_feats) == len(t_feats) == 5
    # relu1_1 lives in packed (s2d) space on our side — unpack to compare
    tap1 = np.asarray(depth_to_space(j_feats[0], 2))
    np.testing.assert_allclose(tap1, t_feats[0], atol=2e-4, rtol=1e-3)
    for j, t in zip(j_feats[1:], t_feats[1:]):
        np.testing.assert_allclose(np.asarray(j), t, atol=2e-4, rtol=1e-3)


def test_get_vgg_params_env_roundtrip(tmp_path, monkeypatch):
    _, sd = _torch_vgg19_taps(torch.zeros(1, 3, 16, 16))
    npz = str(tmp_path / "w.npz")
    np.savez(npz, **sd)
    monkeypatch.setenv("VGG19_WEIGHTS", npz)
    params = vggm.get_vgg_params()
    assert "conv0" in params and "conv12" in params
    # block-1 convs are packed: conv0 kernel takes 4*3 input channels
    assert params["conv0"]["kernel"].shape == (3, 3, 12, 256)
