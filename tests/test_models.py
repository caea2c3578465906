"""Network-zoo shape/namespace tests (SURVEY.md §2 #12-#17)."""

import jax
import jax.numpy as jnp
import numpy as np

from neural_human_video_rendering_tpu.models.discriminator import \
    MultiscaleDiscriminator
from neural_human_video_rendering_tpu.models.generators import (BGNet, TexG,
                                                                TransG)
from neural_human_video_rendering_tpu.models.renderer import (
    NeuralRenderer, renderer_from_options)
from neural_human_video_rendering_tpu.models.vgg import (VGG19Features,
                                                         init_vgg_params)

RNG = jax.random.PRNGKey(0)


def test_transg_output_shapes():
    m = TransG(n_parts=4, ngf=4, n_downsampling=2, n_blocks=1)
    x = jnp.zeros((2, 32, 32, 3))
    params = m.init(RNG, x)["params"]
    logits, uv = m.apply({"params": params}, x)
    assert logits.shape == (2, 32, 32, 5)
    assert uv.shape == (2, 32, 32, 4, 2)
    assert float(uv.min()) >= 0.0 and float(uv.max()) <= 1.0


def test_transg_uv_refine_head():
    """--uv_refine adds the half-res residual stack: named params exist,
    output shapes/ranges unchanged, and the refinement actually changes the
    output (fresh head conv — not an identity)."""
    import numpy as np
    x = jnp.asarray(np.random.RandomState(0).rand(2, 32, 32, 3)
                    .astype(np.float32))
    base = TransG(n_parts=4, ngf=4, n_downsampling=2, n_blocks=1)
    ref = TransG(n_parts=4, ngf=4, n_downsampling=2, n_blocks=1,
                 uv_refine=2, uv_refine_ngf=8)
    pb = base.init(RNG, x)["params"]
    pr = ref.init(RNG, x)["params"]
    extra = set(pr.keys()) - set(pb.keys())
    assert {"refine_stem", "refine_head"} <= extra
    assert {f"refine_block{i}" for i in range(2)} <= extra
    logits, uv = ref.apply({"params": pr}, x)
    assert logits.shape == (2, 32, 32, 5)
    assert uv.shape == (2, 32, 32, 4, 2)
    assert float(uv.min()) >= 0.0 and float(uv.max()) <= 1.0
    # shared-trunk outputs differ once the residual head applies
    logits_b, _ = base.apply({"params": pb}, x)
    assert not np.allclose(np.asarray(logits), np.asarray(logits_b))


def test_texg_output_shape():
    m = TexG(n_parts=4, tile=16, ngf=4, n_downsampling=1, n_blocks=1)
    x = jnp.zeros((2, 32, 32, 3))
    params = m.init(RNG, x)["params"]
    out = m.apply({"params": params}, x)
    assert out.shape == (2, 4, 16, 16, 3)
    assert float(jnp.abs(out).max()) <= 1.0


def test_bgnet_output_range():
    m = BGNet(ngf=4, n_downsampling=1, n_blocks=1)
    x = jnp.zeros((1, 32, 32, 3))
    params = m.init(RNG, x)["params"]
    out = m.apply({"params": params}, x)
    assert out.shape == (1, 32, 32, 3)
    assert float(jnp.abs(out).max()) <= 1.0


def test_multiscale_discriminator_structure():
    m = MultiscaleDiscriminator(num_D=2, ndf=4, n_layers=2)
    x = jnp.zeros((1, 32, 32, 6))
    params = m.init(RNG, x)["params"]
    outs = m.apply({"params": params}, x)
    assert len(outs) == 2                       # two scales
    for feats in outs:
        assert len(feats) == 4                  # n_layers + stride1 + logits
        assert feats[-1].shape[-1] == 1         # patch logits
    # second scale sees a 2x downsampled pyramid level (16px -> first conv
    # stride 2 with pad 2: (16+2*2-4)/2+1 = 9; full res gives 17)
    assert outs[0][0].shape[1] == 17
    assert outs[1][0].shape[1] == 9


def test_renderer_composition(tiny_opt):
    renderer = renderer_from_options(tiny_opt)
    S, T, P = tiny_opt.loadSize, tiny_opt.tex_tile, tiny_opt.n_parts
    pose = jnp.zeros((1, S, S, 3))
    bg = jnp.zeros((1, S, S, 3))
    tex = jnp.zeros((1, P, T, T, 3))
    params = renderer.init(RNG, pose, bg, tex, None)["params"]
    # per-subnet namespaces enable partial checkpoint restore
    assert set(params.keys()) == {"TransG", "TexG", "BGNet"}
    outs = renderer.apply({"params": params}, pose, bg, tex, None)
    assert outs["fake"].shape == (1, S, S, 3)
    assert outs["mask"].shape == (1, S, S, 1)
    assert outs["uv"].shape == (1, S, S, P, 2)
    assert outs["texture"].shape == (1, P, T, T, 3)
    # compositing identity: fake = mask*fg + (1-mask)*bg_refined
    recon = outs["mask"] * outs["fg"] + (1 - outs["mask"]) * outs["bg_refined"]
    np.testing.assert_allclose(np.asarray(outs["fake"]), np.asarray(recon),
                               atol=1e-5)


def test_vgg_taps():
    params = init_vgg_params(image_size=32)
    m = VGG19Features()
    feats = m.apply({"params": params}, jnp.zeros((1, 32, 32, 3)))
    assert len(feats) == 5
    # relu1_1 tap lives in space-to-depth-packed space (same elements)
    assert feats[0].shape == (1, 16, 16, 256)
    assert feats[4].shape == (1, 2, 2, 512)


def test_vgg_packed_block_exact():
    """pack_conv_weights: packed 3x3 conv + channel-group max-pool must be
    bit-exact (up to fp assoc) with the original conv+conv+pool block."""
    from neural_human_video_rendering_tpu.models.layers import space_to_depth
    from neural_human_video_rendering_tpu.models.vgg import pack_conv_weights

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(2, 16, 16, 3).astype(np.float32))
    w0 = rng.randn(3, 3, 3, 8).astype(np.float32) * 0.3
    b0 = rng.randn(8).astype(np.float32) * 0.1
    w1 = rng.randn(3, 3, 8, 8).astype(np.float32) * 0.3
    b1 = rng.randn(8).astype(np.float32) * 0.1

    def conv(x, w, b):
        return jax.lax.conv_general_dilated(
            x, w, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC")) + b

    ref = jax.nn.relu(conv(jax.nn.relu(conv(x, w0, b0)), w1, b1))
    ref_tap = jax.nn.relu(conv(x, w0, b0))
    ref_pool = jax.lax.reduce_window(ref, -jnp.inf, jax.lax.max,
                                     (1, 2, 2, 1), (1, 2, 2, 1), "VALID")

    w0p, b0p = pack_conv_weights(w0, b0)
    w1p, b1p = pack_conv_weights(w1, b1)
    xp = space_to_depth(x, 2)
    h = jax.nn.relu(conv(xp, jnp.asarray(w0p), jnp.asarray(b0p)))
    tap_p = h
    h = jax.nn.relu(conv(h, jnp.asarray(w1p), jnp.asarray(b1p)))
    C = 8
    pool_p = jnp.maximum(h[..., : 2 * C], h[..., 2 * C:])
    pool_p = jnp.maximum(pool_p[..., :C], pool_p[..., C:])

    np.testing.assert_allclose(np.asarray(space_to_depth(ref_tap, 2)),
                               np.asarray(tap_p), atol=1e-5)
    np.testing.assert_allclose(np.asarray(pool_p), np.asarray(ref_pool),
                               atol=1e-5)


def test_space_to_depth_roundtrip():
    import numpy as np
    from neural_human_video_rendering_tpu.models.layers import (
        depth_to_space, space_to_depth)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(2, 8, 12, 5).astype(np.float32))
    for f in (2, 4):
        y = space_to_depth(x, f)
        assert y.shape == (2, 8 // f, 12 // f, f * f * 5)
        np.testing.assert_array_equal(np.asarray(depth_to_space(y, f)),
                                      np.asarray(x))


def test_global_generator_s2d_shapes():
    from neural_human_video_rendering_tpu.models.generators import (
        GlobalGenerator)
    m = GlobalGenerator(out_nc=7, ngf=4, n_downsampling=2, n_blocks=1,
                        stem_s2d=2, head_s2d=2)
    x = jnp.zeros((1, 32, 32, 3))
    params = m.init(jax.random.PRNGKey(0), x)["params"]
    y = m.apply({"params": params}, x)
    assert y.shape == (1, 32, 32, 7)
    # factors beyond the schedule clamp instead of failing
    m4 = GlobalGenerator(out_nc=3, ngf=4, n_downsampling=1, n_blocks=1,
                         stem_s2d=4, head_s2d=4)
    params = m4.init(jax.random.PRNGKey(0), x)["params"]
    assert m4.apply({"params": params}, x).shape == (1, 32, 32, 3)
