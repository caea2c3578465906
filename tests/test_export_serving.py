"""Serving export: the StableHLO artifact round-trips and reproduces the
live forward exactly, in both weight modes (tools/export_serving.py)."""

import dataclasses
import sys

import numpy as np
import pytest


def test_export_roundtrip_baked_weights(tiny_opt):
    jexport = pytest.importorskip("jax.export")
    sys.path.insert(0, "/root/repo/tools")
    import export_serving as es

    opt = dataclasses.replace(tiny_opt, use_pallas_warp=False)
    exported, joints, _ = es.build_exported(opt, batch=2, bake_weights=True)
    blob = exported.serialize()
    assert len(blob) > 1000

    restored = jexport.deserialize(bytearray(blob))
    out = np.asarray(restored.call(joints))
    assert out.shape == (2, opt.loadSize, opt.loadSize, 3)
    assert np.isfinite(out).all()

    # matches the original Exported's own call bit-for-bit
    ref = np.asarray(exported.call(joints))
    np.testing.assert_array_equal(out, ref)


def test_export_params_as_arguments(tiny_opt, tmp_path):
    """Default mode: small program + weight sidecar; identical output to
    the baked artifact."""
    jexport = pytest.importorskip("jax.export")
    sys.path.insert(0, "/root/repo/tools")
    import flax.serialization as fser
    import export_serving as es

    opt = dataclasses.replace(tiny_opt, use_pallas_warp=False)
    baked, joints, _ = es.build_exported(opt, batch=2, bake_weights=True,
                                         out_uint8=True)
    out_path = str(tmp_path / "m.jaxexport")
    es.save_artifact(opt, 2, out_path, bake_weights=False)   # uint8 default

    import os
    assert os.path.isfile(out_path + ".params")
    # the program itself is much smaller than the weights it consumes
    assert os.path.getsize(out_path) < os.path.getsize(out_path + ".params")

    with open(out_path, "rb") as f:
        restored = jexport.deserialize(bytearray(f.read()))
    with open(out_path + ".params", "rb") as f:
        params = fser.msgpack_restore(f.read())
    out = np.asarray(restored.call(params, np.asarray(joints)))
    ref = np.asarray(baked.call(joints))
    assert out.dtype == np.uint8 and ref.dtype == np.uint8
    # constant-folded (baked) vs runtime-argument weights fuse differently;
    # float rounding can move a quantized level by at most 1
    assert np.abs(out.astype(np.int16) - ref.astype(np.int16)).max() <= 1
