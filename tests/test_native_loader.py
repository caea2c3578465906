"""Native C++ decode/prefetch runtime tests (native/loader.cpp)."""

import os

import cv2
import numpy as np
import pytest

from neural_human_video_rendering_tpu.data import native_loader as nl

pytestmark = pytest.mark.skipif(not nl.available(),
                                reason="native loader not built")


@pytest.fixture()
def img_dir(tmp_path):
    rng = np.random.RandomState(0)
    paths = []
    for i in range(6):
        img = (rng.rand(40, 40, 3) * 255).astype(np.uint8)
        p = str(tmp_path / f"f{i}.png")
        cv2.imwrite(p, img)
        paths.append(p)
    return paths


def test_decode_matches_cv2(img_dir):
    out = nl.decode_image(img_dir[0], 32)
    ref = cv2.cvtColor(cv2.imread(img_dir[0]), cv2.COLOR_BGR2RGB)
    ref = cv2.resize(ref, (32, 32), interpolation=cv2.INTER_LINEAR)
    ref = ref.astype(np.float32) / 255.0 * 2 - 1
    assert out.shape == (32, 32, 3) and out.dtype == np.float32
    assert np.abs(out - ref).max() < 0.02


def test_decode_identity_size(img_dir):
    """No-resize path is exact."""
    out = nl.decode_image(img_dir[1], 40)
    ref = cv2.cvtColor(cv2.imread(img_dir[1]), cv2.COLOR_BGR2RGB)
    ref = ref.astype(np.float32) / 255.0 * 2 - 1
    np.testing.assert_allclose(out, ref, atol=1e-5)


def test_decode_jpeg(tmp_path):
    img = np.full((30, 30, 3), 128, np.uint8)
    p = str(tmp_path / "a.jpg")
    cv2.imwrite(p, img)
    out = nl.decode_image(p, 16)
    assert np.abs(out - (128 / 255 * 2 - 1)).max() < 0.05


def test_gray_and_label_modes(tmp_path):
    m = np.zeros((20, 20), np.uint8)
    m[5:15, 5:15] = 255
    p = str(tmp_path / "m.png")
    cv2.imwrite(p, m)
    g = nl.decode_image(p, 20, nl.MODE_GRAY)
    assert g.shape == (20, 20)
    np.testing.assert_allclose(g, m.astype(np.float32) / 255.0, atol=1e-5)
    lab = nl.decode_image(p, 10, nl.MODE_LABEL)
    assert lab.shape == (10, 10, 3) and lab.dtype == np.uint8
    assert set(np.unique(lab)) <= {0, 255}


def test_batcher_matches_single(img_dir):
    b = nl.NativeBatcher(img_dir, 32, nl.MODE_RGB, threads=3)
    b.submit([0, 2, 4, 5])
    arr = b.wait()
    assert arr.shape == (4, 32, 32, 3)
    for j, i in enumerate([0, 2, 4, 5]):
        np.testing.assert_allclose(arr[j], nl.decode_image(img_dir[i], 32))
    # reuse across batches
    b.submit([1])
    np.testing.assert_allclose(b.wait()[0], nl.decode_image(img_dir[1], 32))
    b.close()


def test_decode_missing_file_errors(tmp_path):
    with pytest.raises(IOError):
        nl.decode_image(str(tmp_path / "nope.png"), 16)


def test_batcher_reports_errors(img_dir, tmp_path):
    bad = str(tmp_path / "corrupt.png")
    with open(bad, "wb") as f:
        f.write(b"\x89Pnotapng")
    b = nl.NativeBatcher(img_dir + [bad], 16, nl.MODE_RGB, threads=2)
    b.submit([0, len(img_dir)])
    with pytest.raises(IOError):
        b.wait()
    b.close()


def test_rgb_mask_luminance_matches_cv2(tmp_path):
    """mode 1 (gray) on an RGB file: native luminance matches the cv2
    IMREAD_GRAYSCALE fallback (BT.601)."""
    if not nl.available():
        pytest.skip("native loader unavailable")
    import cv2
    rng = np.random.default_rng(7)
    img = rng.integers(0, 255, (24, 24, 3), dtype=np.uint8)
    p = str(tmp_path / "m.png")
    cv2.imwrite(p, cv2.cvtColor(img, cv2.COLOR_RGB2BGR))
    native = nl.decode_image(p, 24, nl.MODE_GRAY)
    ref = cv2.imread(p, cv2.IMREAD_GRAYSCALE).astype(np.float32) / 255.0
    assert np.abs(native - ref).max() < 2.5 / 255.0


def test_submit_bad_index_leaves_pool_usable(tmp_path):
    if not nl.available():
        pytest.skip("native loader unavailable")
    import cv2
    rng = np.random.default_rng(8)
    paths = []
    for i in range(3):
        p = str(tmp_path / f"f{i}.png")
        cv2.imwrite(p, rng.integers(0, 255, (16, 16, 3), dtype=np.uint8))
        paths.append(p)
    b = nl.NativeBatcher(paths, 16, nl.MODE_RGB, threads=2)
    with pytest.raises(RuntimeError):
        b.submit([0, 99])          # out-of-range index rejected atomically
    b.submit([0, 1, 2])            # pool still serviceable afterwards
    out = b.wait()
    assert out.shape == (3, 16, 16, 3)
    assert np.isfinite(out).all()
    b.close()
