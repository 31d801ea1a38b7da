"""Feature tests (SURVEY.md §5.2): detector on synthetic textures, and
downstream match agreement on ground-truth warped pairs.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from fastmatch_tpu.features.sift import SIFTConfig, detect_and_describe
from fastmatch_tpu.matching.matcher import match_pair_jnp
from synth import render_blob_image

CFG = SIFTConfig(capacity=512, n_octaves=3)


class TestDetector:
    def test_finds_blobs(self, rng):
        img = render_blob_image(rng, (256, 256), n_blobs=30)
        kps, descs = detect_and_describe(jnp.asarray(img), CFG)
        n = int(kps.count())
        assert n > 20, f"only {n} keypoints on a 30-blob image"
        assert int(descs.count()) == n
        # All detections inside the image.
        xy = np.asarray(kps.xy)[np.asarray(kps.mask)]
        assert (xy >= 0).all() and (xy[:, 0] < 256).all() and (xy[:, 1] < 256).all()

    def test_descriptors_unit_norm(self, rng):
        img = render_blob_image(rng, (256, 256))
        _, descs = detect_and_describe(jnp.asarray(img), CFG)
        m = np.asarray(descs.mask)
        norms = np.linalg.norm(np.asarray(descs.data)[m], axis=1)
        np.testing.assert_allclose(norms, 1.0, atol=1e-4)
        # Padded rows are zero.
        np.testing.assert_array_equal(np.asarray(descs.data)[~m], 0.0)

    def test_blank_image_no_keypoints(self):
        img = jnp.zeros((256, 256))
        kps, _ = detect_and_describe(img, CFG)
        assert int(kps.count()) == 0

    def test_scores_sorted_and_masked(self, rng):
        img = render_blob_image(rng, (256, 256))
        kps, _ = detect_and_describe(jnp.asarray(img), CFG)
        mask = np.asarray(kps.mask)
        # All valid entries precede invalid ones (global top-k ordering).
        first_invalid = mask.argmin() if (~mask).any() else len(mask)
        assert mask[:first_invalid].all() and not mask[first_invalid:].any()


class TestWarpedPairAgreement:
    """Detector+descriptor end-to-end: matches across a known warp must land
    where the warp says (the synthetic stand-in for cv2 parity; SURVEY §8.2).
    """

    @pytest.mark.parametrize("transform", ["shift", "rot90"])
    def test_match_consistency(self, rng, transform):
        img = render_blob_image(rng, (256, 256), n_blobs=40)
        if transform == "shift":
            shift = 24
            img2 = np.roll(img, (shift, 0), axis=(0, 1))
            def fwd(xy):  # maps img coords -> img2 coords
                return xy + np.array([0.0, shift])
        else:
            img2 = np.rot90(img).copy()  # (x, y) -> (y, W-1-x)
            def fwd(xy):
                return np.stack([xy[:, 1], 255.0 - xy[:, 0]], axis=1)
        kp1, d1 = detect_and_describe(jnp.asarray(img), CFG)
        kp2, d2 = detect_and_describe(jnp.asarray(img2), CFG)
        assert int(kp1.count()) > 15
        m = match_pair_jnp(d1, d2, ratio=0.8)
        valid = np.asarray(m.valid)
        idx = np.asarray(m.idx)
        xy1 = np.asarray(kp1.xy)
        xy2 = np.asarray(kp2.xy)
        n_match = valid.sum()
        assert n_match >= 10, f"only {n_match} matches across {transform}"
        pred = fwd(xy1[valid])
        got = xy2[idx[valid]]
        err = np.linalg.norm(pred - got, axis=1)
        inliers = (err < 3.0).mean()
        assert inliers >= 0.8, f"{transform}: inlier rate {inliers:.2f} (n={n_match})"
