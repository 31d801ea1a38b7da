"""ORB binary features (features/orb.py) + Hamming matching (matching/hamming.py).

Tiers (SURVEY.md §5.2): popcount-anchor vs MXU-route parity (the binary
analog of the jnp-vs-pallas kernel parity gate — for binary descriptors
the bf16 MXU path must be EXACT, not >=99%), a numpy popcount oracle, a
cv2 ORB detector oracle, and geometric self-consistency of the full
detect->describe->match loop under translation and rotation (the
synthetic-warp contract the SIFT module uses).
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fastmatch_tpu.core.containers import (BinaryDescriptors,
                                           binary_descriptors_from_numpy,
                                           pack_bits, unpack_bits_signed)
from fastmatch_tpu.features.orb import ORBConfig, detect_and_describe_orb
from fastmatch_tpu.matching.hamming import (hamming_distance_matrix,
                                            match_batch_hamming,
                                            match_pair_hamming,
                                            match_pair_hamming_jnp)
from fastmatch_tpu.matching.matcher import BIG


def random_packed(rng, n, w=8):
    return rng.integers(0, 2 ** 32, size=(n, w), dtype=np.uint64).astype(np.uint32)


def blob_image(rng, h=160, w=160, n_blobs=40, margin=25):
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    img = np.zeros((h, w), np.float32)
    for _ in range(n_blobs):
        y, x = rng.uniform(margin, h - margin), rng.uniform(margin, w - margin)
        r = rng.uniform(3, 8)
        img += float(rng.uniform(0.3, 1.0)) * (((yy - y) ** 2 + (xx - x) ** 2) <= r * r)
    return np.clip(img, 0.0, 1.0)


class TestPacking:
    def test_pack_unpack_roundtrip(self):
        rng = np.random.default_rng(0)
        bits = rng.integers(0, 2, size=(17, 256)).astype(bool)
        packed = pack_bits(jnp.asarray(bits))
        assert packed.shape == (17, 8) and packed.dtype == jnp.uint32
        signed = unpack_bits_signed(packed, jnp.ones((17,), bool))
        np.testing.assert_array_equal(np.asarray(signed), 2.0 * bits - 1.0)

    def test_masked_rows_unpack_to_zero(self):
        packed = jnp.asarray(np.full((4, 8), 0xFFFFFFFF, np.uint32))
        mask = jnp.asarray([True, False, True, False])
        signed = np.asarray(unpack_bits_signed(packed, mask))
        assert (signed[1] == 0).all() and (signed[3] == 0).all()
        assert (signed[0] == 1).all()

    def test_hamming_matrix_vs_numpy(self):
        rng = np.random.default_rng(1)
        a, b = random_packed(rng, 33), random_packed(rng, 57)
        h = np.asarray(hamming_distance_matrix(jnp.asarray(a), jnp.asarray(b)))
        bits_a = np.unpackbits(a.view(np.uint8), axis=1)
        bits_b = np.unpackbits(b.view(np.uint8), axis=1)
        expect = (bits_a[:, None, :] != bits_b[None, :, :]).sum(-1)
        np.testing.assert_array_equal(h, expect)


class TestHammingMatcher:
    @pytest.fixture(scope="class")
    def banks(self):
        rng = np.random.default_rng(2)
        a = random_packed(rng, 300)
        b = a.copy()
        b[:150] = random_packed(rng, 150)
        # flip a few bits of the copied half: near-duplicates with small
        # nonzero distances exercise the ratio boundary (integer ratios
        # like 4/5 are exactly the f32-threshold trap _ratio_sqrt guards).
        flip = rng.integers(0, 2, size=(150, 8), dtype=np.uint64).astype(np.uint32)
        flip &= random_packed(rng, 150) & random_packed(rng, 150)
        b[150:] ^= flip
        return (binary_descriptors_from_numpy(a, 512),
                binary_descriptors_from_numpy(b, 512))

    def test_mxu_route_is_exact(self, banks):
        """The +-1-unpack / L2-kernel route must be decision- and
        distance-identical to the popcount anchor (module contract)."""
        a, b = banks
        ma = match_pair_hamming_jnp(a, b, ratio=0.8)
        for backend in ("mxu", "mxu_jnp"):
            mb = match_pair_hamming(a, b, ratio=0.8, backend=backend)
            va = np.asarray(ma.valid)
            np.testing.assert_array_equal(va, np.asarray(mb.valid))
            np.testing.assert_array_equal(np.asarray(ma.idx)[va],
                                          np.asarray(mb.idx)[va])
            np.testing.assert_allclose(np.asarray(ma.dist)[va],
                                       np.asarray(mb.dist)[va])

    def test_identical_banks_mutual(self, banks):
        a, _ = banks
        m = match_pair_hamming_jnp(a, a, ratio=0.99, cross_check=True)
        valid = np.asarray(m.valid)
        idx = np.asarray(m.idx)
        # self-match has h=0 and distinct random rows give h2nd>0: every
        # valid row must match itself, and all live rows must be valid.
        assert (idx[valid] == np.arange(len(idx))[valid]).all()
        assert valid.sum() == int(a.count())

    def test_batched_parity(self, banks):
        a, b = banks
        ab = jax.tree.map(lambda x: jnp.stack([x, x]), a)
        bb = jax.tree.map(lambda x: jnp.stack([x, x]), b)
        single = match_pair_hamming_jnp(a, b, ratio=0.8)
        for backend in ("popcount", "mxu"):
            mb = match_batch_hamming(ab, bb, ratio=0.8, backend=backend)
            for i in range(2):
                np.testing.assert_array_equal(np.asarray(mb.valid)[i],
                                              np.asarray(single.valid))

    def test_all_masked_bank(self):
        rng = np.random.default_rng(3)
        a = binary_descriptors_from_numpy(random_packed(rng, 10), 16)
        b = BinaryDescriptors(packed=jnp.zeros((16, 8), jnp.uint32),
                              mask=jnp.zeros((16,), bool))
        m = match_pair_hamming_jnp(a, b)
        assert int(m.count()) == 0
        assert (np.asarray(m.dist) == BIG).all()


class TestORBDetector:
    @pytest.fixture(scope="class")
    def img(self):
        return blob_image(np.random.default_rng(4))

    def test_detects_and_describes(self, img):
        cfg = ORBConfig(capacity=256, n_levels=2)
        kps, desc = detect_and_describe_orb(jnp.asarray(img), cfg)
        n = int(kps.mask.sum())
        assert n > 20
        assert desc.packed.shape == (256, 8)
        assert bool((np.asarray(desc.packed)[~np.asarray(desc.mask)] == 0).all())
        # live descriptors are not degenerate (all-zero / all-one bits)
        pc = np.unpackbits(np.asarray(desc.packed).view(np.uint8), axis=1).sum(1)
        live = np.asarray(desc.mask)
        assert (pc[live] > 16).all() and (pc[live] < 240).all()

    def test_corners_near_cv2_fast(self, img):
        """cv2 FAST oracle (detector-level sanity): most cv2 corners have one
        of ours within 2 px. Thresholds/NMS differ; this is recall, not
        bit parity."""
        cv2 = pytest.importorskip("cv2")
        det = cv2.FastFeatureDetector_create(threshold=20)
        cv_kps = det.detect((img * 255).astype(np.uint8), None)
        cv_xy = np.array([k.pt for k in cv_kps], np.float32).reshape(-1, 2)
        # compare against our level-0 detections only (cv2 is single-scale)
        cfg = ORBConfig(capacity=512, n_levels=1)
        kps, _ = detect_and_describe_orb(jnp.asarray(img), cfg)
        ours = np.asarray(kps.xy)[np.asarray(kps.mask)]
        b = cfg.patch // 2
        inner = ((cv_xy[:, 0] >= b) & (cv_xy[:, 0] < img.shape[1] - b)
                 & (cv_xy[:, 1] >= b) & (cv_xy[:, 1] < img.shape[0] - b))
        cv_xy = cv_xy[inner]
        if len(cv_xy) == 0:
            pytest.skip("cv2 FAST found no interior corners on this image")
        d = np.hypot(cv_xy[:, None, 0] - ours[None, :, 0],
                     cv_xy[:, None, 1] - ours[None, :, 1]).min(axis=1)
        recall = float((d <= 2.0).mean())
        assert recall >= 0.6, f"recall vs cv2 FAST {recall:.2f}"

    def test_translation_matching(self, img):
        cfg = ORBConfig(capacity=256, n_levels=2)
        img2 = np.roll(img, (7, -5), axis=(0, 1))
        _, d1 = detect_and_describe_orb(jnp.asarray(img), cfg)
        k1, _ = detect_and_describe_orb(jnp.asarray(img), cfg)
        k2, d2 = detect_and_describe_orb(jnp.asarray(img2), cfg)
        m = match_pair_hamming_jnp(d1, d2, ratio=0.8)
        valid, idx = np.asarray(m.valid), np.asarray(m.idx)
        delta = np.asarray(k2.xy)[idx] - np.asarray(k1.xy)
        good = valid & (np.abs(delta[:, 0] + 5) < 2.5) & (np.abs(delta[:, 1] - 7) < 2.5)
        assert valid.sum() >= 20
        assert good.sum() >= 0.7 * valid.sum()

    def test_cli_match_orb(self, img, tmp_path):
        cv2 = pytest.importorskip("cv2")
        a = tmp_path / "a.png"
        b = tmp_path / "b.png"
        cv2.imwrite(str(a), (img * 255).astype(np.uint8))
        cv2.imwrite(str(b), (np.roll(img, (6, -4), axis=(0, 1)) * 255).astype(np.uint8))
        out = tmp_path / "m.npz"
        import sys
        from fastmatch_tpu.cli import main
        argv = sys.argv
        try:
            sys.argv = ["fastmatch-tpu", "match", str(a), str(b),
                        "--feature", "orb", "--out", str(out)]
            main()
        finally:
            sys.argv = argv
        pairs = np.load(out)["pairs"]
        assert len(pairs) >= 20

    def test_rotation_invariance(self):
        scipy_nd = pytest.importorskip("scipy.ndimage")
        rng = np.random.default_rng(5)
        img = blob_image(rng, 200, 200, n_blobs=50, margin=50)
        h = w = 200
        th = math.radians(30.0)
        c0 = (w - 1) / 2
        ct, st = math.cos(th), math.sin(th)
        yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
        sx = ct * (xx - c0) + st * (yy - c0) + c0
        sy = -st * (xx - c0) + ct * (yy - c0) + c0
        img2 = scipy_nd.map_coordinates(img, [sy, sx], order=1)
        cfg = ORBConfig(capacity=256, n_levels=2)
        k1, d1 = detect_and_describe_orb(jnp.asarray(img), cfg)
        k2, d2 = detect_and_describe_orb(jnp.asarray(img2), cfg)
        m = match_pair_hamming_jnp(d1, d2, ratio=0.8)
        valid, idx = np.asarray(m.valid), np.asarray(m.idx)
        p1, p2 = np.asarray(k1.xy), np.asarray(k2.xy)
        fx = ct * (p1[:, 0] - c0) - st * (p1[:, 1] - c0) + c0
        fy = st * (p1[:, 0] - c0) + ct * (p1[:, 1] - c0) + c0
        err = np.hypot(p2[idx][:, 0] - fx, p2[idx][:, 1] - fy)
        good = valid & (err < 3.0)
        assert valid.sum() >= 15
        assert good.sum() >= 0.6 * valid.sum(), (
            f"{good.sum()}/{valid.sum()} geometrically consistent under 30deg")
