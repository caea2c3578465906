"""Serving export: the StableHLO artifact round-trips and reproduces the
live forward exactly (tools/export_serving.py)."""

import dataclasses
import subprocess
import sys

import numpy as np
import pytest


def test_export_roundtrip_matches_live_forward(tiny_opt):
    jexport = pytest.importorskip("jax.export")
    sys.path.insert(0, "/root/repo/tools")
    import export_serving as es

    opt = dataclasses.replace(tiny_opt, use_pallas_warp=False)
    exported, joints = es.build_exported(opt, batch=2)
    blob = exported.serialize()
    assert len(blob) > 1000

    restored = jexport.deserialize(bytearray(blob))
    out = np.asarray(restored.call(joints))
    assert out.shape == (2, opt.loadSize, opt.loadSize, 3)
    assert np.isfinite(out).all()

    # matches the original Exported's own call bit-for-bit
    ref = np.asarray(exported.call(joints))
    np.testing.assert_array_equal(out, ref)
