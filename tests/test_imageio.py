"""Native image loader vs cv2 oracle (cv2 encodes the fixtures AND provides
the reference decode — the product path never imports it)."""

import numpy as np
import pytest

from fastmatch_tpu.utils.imageio import load_gray
from synth import render_blob_image


@pytest.fixture(scope="module")
def img():
    rng = np.random.default_rng(3)
    return (render_blob_image(rng, (120, 160)) * 255).astype(np.uint8)


class TestLoadGray:
    def test_png_roundtrip(self, img, tmp_path):
        import cv2

        p = str(tmp_path / "x.png")
        cv2.imwrite(p, img)
        out = load_gray(p)
        assert out.shape == img.shape and out.dtype == np.float32
        np.testing.assert_allclose(out, img / 255.0, atol=1 / 255.0)

    def test_jpeg_close(self, img, tmp_path):
        import cv2

        p = str(tmp_path / "x.jpg")
        cv2.imwrite(p, img, [cv2.IMWRITE_JPEG_QUALITY, 95])
        out = load_gray(p)
        ref = cv2.imread(p, cv2.IMREAD_GRAYSCALE) / 255.0
        assert out.shape == img.shape
        assert np.abs(out - ref).mean() < 0.01  # both decode the same file

    def test_pgm(self, img, tmp_path):
        p = str(tmp_path / "x.pgm")
        with open(p, "wb") as f:
            f.write(f"P5\n{img.shape[1]} {img.shape[0]}\n255\n".encode())
            f.write(img.tobytes())
        out = load_gray(p)
        np.testing.assert_allclose(out, img / 255.0, atol=1 / 255.0)

    def test_ppm_color_to_gray(self, img, tmp_path):
        rgb = np.stack([img, img // 2, img // 3], axis=-1)
        p = str(tmp_path / "x.ppm")
        with open(p, "wb") as f:
            f.write(f"P6\n{img.shape[1]} {img.shape[0]}\n255\n".encode())
            f.write(rgb.tobytes())
        out = load_gray(p)
        expected = (0.299 * rgb[..., 0] + 0.587 * rgb[..., 1] + 0.114 * rgb[..., 2]) / 255.0
        np.testing.assert_allclose(out, expected, atol=2 / 255.0)

    def test_resize(self, img, tmp_path):
        import cv2

        p = str(tmp_path / "y.png")
        cv2.imwrite(p, img)
        out = load_gray(p, size=(80, 60))
        assert out.shape == (60, 80)
        ref = cv2.resize(img.astype(np.float32) / 255.0, (80, 60),
                         interpolation=cv2.INTER_LINEAR)
        assert np.abs(out - ref).mean() < 0.01

    def test_missing_file(self):
        with pytest.raises(IOError):
            load_gray("/nonexistent/file.png")
