"""Wire-format batches: lossless round trip for 8-bit-sourced modalities,
f16 tolerance for flow, and train-step equivalence packed vs raw."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from neural_human_video_rendering_tpu.data import dataset as dsm
from neural_human_video_rendering_tpu.data import wire


def _batch(tiny_opt, n=2):
    ds = dsm.SyntheticDataset(tiny_opt, length=n)
    return dsm.collate([ds[i] for i in range(n)])


def test_roundtrip_lossless_for_8bit_sources(tiny_opt, tmp_path):
    """Samples decoded from real 8-bit files survive pack->unpack EXACTLY."""
    from corpus import make_corpus
    c = make_corpus(str(tmp_path), n=3, size=32)
    opt = dataclasses.replace(
        tiny_opt, loadSize=32, pose_path=c["openpose_json"],
        img_path=c["frames"], mask_path=c["mask"],
        densepose_path=c["densepose"])
    ds = dsm.FrameDataset(opt, "train")
    batch = dsm.collate([ds[0], ds[1]])
    packed = wire.pack_batch(batch)
    assert packed["image"].dtype == np.uint8
    assert packed["mask"].dtype == np.uint8
    assert packed["dp_parts"].dtype == np.uint8
    assert packed["dp_uv"].dtype == np.uint8
    un = wire.unpack_batch({k: jnp.asarray(v) for k, v in packed.items()})
    for k in ("image", "image_prev", "mask", "dp_uv"):
        np.testing.assert_allclose(np.asarray(un[k]), batch[k], atol=1e-6,
                                   err_msg=k)
    np.testing.assert_array_equal(np.asarray(un["dp_parts"]),
                                  batch["dp_parts"])
    np.testing.assert_allclose(np.asarray(un["joints"]), batch["joints"])


def test_flow_f16_tolerance(tiny_opt):
    batch = _batch(tiny_opt)
    packed = wire.pack_batch(batch)
    assert packed["flow"].dtype == np.float16
    un = wire.unpack_batch({k: jnp.asarray(v) for k, v in packed.items()})
    np.testing.assert_allclose(np.asarray(un["flow"]), batch["flow"],
                               rtol=1e-3, atol=1e-3)


def test_wire_bytes_shrink(tiny_opt):
    batch = _batch(tiny_opt)
    raw = sum(v.nbytes for v in batch.values())
    packed = sum(v.nbytes for v in wire.pack_batch(batch).values())
    assert packed < raw / 2.5


def test_unpack_passthrough_on_raw_batches(tiny_opt):
    batch = {k: jnp.asarray(v) for k, v in _batch(tiny_opt).items()}
    un = wire.unpack_batch(batch)
    for k in batch:
        if k == "dp_parts":
            assert un[k].dtype == jnp.int32
        else:
            np.testing.assert_array_equal(np.asarray(un[k]),
                                          np.asarray(batch[k]))


def test_train_step_equivalent_packed_vs_raw(tiny_opt):
    """The jitted G+D step produces (near-)identical metrics on packed and
    raw batches — packing is a transport optimization, not a model change."""
    from neural_human_video_rendering_tpu.train import steps as st
    from neural_human_video_rendering_tpu.train.state import create_train_state

    opt = dataclasses.replace(tiny_opt, lambda_L2=500, lambda_UV=1000,
                              lambda_Prob=10, lambda_Temp=500,
                              use_densepose_loss=True, no_vgg_loss=True)
    ds = dsm.SyntheticDataset(opt, length=2)
    raw = dsm.collate([ds[0], ds[1]])
    # quantize once so raw and packed describe the SAME 8-bit data
    raw = {k: np.asarray(v) for k, v in
           wire.unpack_batch({k2: jnp.asarray(v2) for k2, v2 in
                              wire.pack_batch(raw).items()}).items()}
    packed = wire.pack_batch(raw)

    bundle = create_train_state(opt, jax.random.PRNGKey(0),
                                ds.texture_atlas(), ds.background())
    step = st.make_train_step(opt, bundle["renderer"], bundle["disc"],
                              bundle["vgg_params"], bundle["g_tx"],
                              bundle["d_tx"])
    # the step donates its state arg: give each call its own copy
    state2 = jax.tree.map(lambda x: jnp.copy(x) if hasattr(x, "dtype") else x,
                          bundle["state"])
    _, m_raw = step(bundle["state"],
                    {k: jnp.asarray(v) for k, v in raw.items()})
    _, m_packed = step(state2,
                       {k: jnp.asarray(v) for k, v in packed.items()})
    for k in m_raw:
        np.testing.assert_allclose(float(m_raw[k]), float(m_packed[k]),
                                   rtol=2e-3, atol=2e-3, err_msg=k)
