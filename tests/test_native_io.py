"""Native C++ IO runtime vs PIL parity (skipped when the lib isn't built)."""
import numpy as np
import pytest

from splatformer_tpu.data import native_io


@pytest.fixture
def png_files(tmp_path, rng):
    from PIL import Image
    paths = []
    for i in range(3):
        arr = (rng.uniform(size=(24, 32, 4)) * 255).astype(np.uint8)
        p = tmp_path / f"img{i}.png"
        Image.fromarray(arr, "RGBA").save(p)
        paths.append((str(p), arr))
    return paths


def test_decode_matches_pil(png_files):
    if not native_io.available():
        pytest.skip("native lib not built (make -C native)")
    for path, arr in png_files:
        out = native_io.decode_image(path)
        assert out.shape == (24, 32, 4)
        np.testing.assert_allclose(out, arr.astype(np.float32) / 255.0,
                                   atol=1e-6)


def test_decode_batch_threads(png_files):
    if not native_io.available():
        pytest.skip("native lib not built (make -C native)")
    paths = [p for p, _ in png_files]
    out = native_io.decode_batch(paths)
    assert out.shape == (3, 24, 32, 4)
    for i, (_, arr) in enumerate(png_files):
        np.testing.assert_allclose(out[i], arr.astype(np.float32) / 255.0,
                                   atol=1e-6)


def test_image_info(png_files):
    path, arr = png_files[0]
    w, h, c = native_io.image_info(path)
    assert (w, h, c) == (32, 24, 4)
