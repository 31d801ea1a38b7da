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


class TestFrameLoader:
    """Native threaded prefetch loader (loader.cpp): in-order delivery,
    content parity with the sequential decoder, error skipping."""

    def _write_pgm(self, path, img):
        h, w = img.shape
        with open(path, "wb") as fh:
            fh.write(f"P5\n{w} {h}\n255\n".encode())
            fh.write((img * 255).astype(np.uint8).tobytes())

    def test_inorder_and_parity(self, rng, tmp_path):
        from fastmatch_tpu.utils.imageio import FrameLoader, load_gray

        paths = []
        for i in range(12):
            img = rng.random((32 + 8 * (i % 3), 48)).astype(np.float32)
            p = str(tmp_path / f"f{i:03d}.pgm")
            self._write_pgm(p, img)
            paths.append(p)
        with FrameLoader(paths, size=(48, 32), n_threads=3, prefetch=4) as fl:
            got = list(fl)
        assert [i for i, _ in got] == list(range(12))
        for i, img in got:
            ref = load_gray(paths[i], size=(48, 32))
            np.testing.assert_allclose(img, ref, atol=1e-6)

    def test_decode_error_skipped(self, rng, tmp_path):
        from fastmatch_tpu.utils.imageio import FrameLoader

        good = str(tmp_path / "ok.pgm")
        self._write_pgm(good, rng.random((16, 16)).astype(np.float32))
        bad = str(tmp_path / "bad.pgm")
        with open(bad, "wb") as fh:
            fh.write(b"not an image")
        with FrameLoader([good, bad, good], size=(16, 16)) as fl:
            got = list(fl)
        assert [i for i, _ in got] == [0, 2]
