"""Place recognition (matching/vlad.py + pipeline/retrieval.py): VLAD
frame descriptors, keyframe retrieval, hierarchical localization.

Discrimination is tested on a synthetic "corridor" map whose frames
observe DISJOINT landmark groups (distinct places); the e2e hierarchical
localizer reuses test_localize's SLAM-built circle map."""

from types import SimpleNamespace

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from fastmatch_tpu.matching.vlad import (
    retrieve, train_vocabulary, vlad_encode)
from fastmatch_tpu.pipeline.retrieval import (
    build_keyframe_db, localize_hierarchical, query_frames)
from test_localize import built_map  # noqa: F401 (module-scoped fixture)


def _corridor_map(rng, n_places=12, per_place=40, dim=128):
    """Fake map record: place i's frame observes only landmark group i."""
    from synth import random_descriptors

    P = n_places * per_place
    desc = random_descriptors(rng, P, dim=dim)
    obs_cam = np.repeat(np.arange(n_places, dtype=np.int32), per_place)
    obs_pt = np.arange(P, dtype=np.int32)
    return SimpleNamespace(
        points=rng.standard_normal((P, 3)).astype(np.float32),
        pt_mask=np.ones(P, bool),
        pt_desc=desc.astype(np.float32),
        obs_cam=obs_cam,
        obs_pt=obs_pt,
        obs_mask=np.ones(P, bool),
        pose_mask=np.concatenate([np.ones(n_places, bool),
                                  np.zeros(4, bool)]),
    )


class TestVlad:
    def test_masked_rows_ignored(self):
        rng = np.random.default_rng(0)
        d = rng.standard_normal((64, 128)).astype(np.float32)
        vocab = train_vocabulary(jax.random.PRNGKey(0), d,
                                 np.ones(64, bool), n_words=8)
        v_clean = vlad_encode(d[:40], np.ones(40, bool), vocab)
        # Same live rows + 24 rows of masked junk must encode identically.
        junk = np.concatenate(
            [d[:40], 1e3 * rng.standard_normal((24, 128))]).astype(np.float32)
        mask = np.concatenate([np.ones(40, bool), np.zeros(24, bool)])
        v_junk = vlad_encode(junk, mask, vocab)
        np.testing.assert_allclose(np.asarray(v_clean), np.asarray(v_junk),
                                   atol=1e-6)
        assert abs(float(jnp.linalg.norm(v_clean)) - 1.0) < 1e-5

    def test_all_masked_is_zero_and_never_retrieves(self):
        rng = np.random.default_rng(1)
        d = rng.standard_normal((32, 128)).astype(np.float32)
        vocab = train_vocabulary(jax.random.PRNGKey(0), d,
                                 np.ones(32, bool), n_words=4)
        v = vlad_encode(d, np.zeros(32, bool), vocab)
        assert float(jnp.abs(v).max()) == 0.0
        db = jnp.stack([vlad_encode(d, np.ones(32, bool), vocab), v])
        s, ids = retrieve(db[:1], db, jnp.array([True, False]), topk=2)
        assert int(ids[0, 0]) == 0 and not np.isfinite(float(s[0, 1]))

    def test_corridor_top1(self):
        """Every place retrieves itself from a noisy re-observation."""
        rng = np.random.default_rng(2)
        rec = _corridor_map(rng)
        db = build_keyframe_db(rec, n_words=32, min_obs=4, seed=0)
        assert int(np.asarray(db.frame_mask).sum()) == 12
        hits = 0
        for place in range(12):
            ids = np.flatnonzero(np.asarray(rec.obs_cam) == place)
            d = rec.pt_desc[rec.obs_pt[ids]]
            noisy = d + 0.05 * rng.standard_normal(d.shape).astype(np.float32)
            noisy /= np.linalg.norm(noisy, axis=1, keepdims=True)
            s, top = query_frames(db, noisy, np.ones(len(ids), bool), topk=3)
            hits += int(top[0]) == place
        assert hits == 12

    def test_vocab_reuse(self):
        """An externally supplied codebook (e.g. the IVF index's) is used
        verbatim — no retraining."""
        rng = np.random.default_rng(3)
        rec = _corridor_map(rng, n_places=4)
        vocab = train_vocabulary(jax.random.PRNGKey(7), rec.pt_desc,
                                 rec.pt_mask, n_words=16)
        db = build_keyframe_db(rec, vocab=vocab)
        np.testing.assert_array_equal(np.asarray(db.vocab.words),
                                      np.asarray(vocab.words))


class TestShardedRetrieve:
    def test_bit_equal_on_integer_scores(self):
        """8-device bank-sharded retrieval == unsharded, bitwise, on +-1
        descriptors: every dot product is a small integer (no rounding to
        hide behind, regardless of matmul blocking) and ties are DENSE —
        the shard-major candidate merge must reproduce unsharded top_k's
        lower-index-first tie-break exactly. Dead rows included."""
        from fastmatch_tpu.dist.mesh import make_mesh
        from fastmatch_tpu.dist.retrieve import retrieve_sharded

        rng = np.random.default_rng(5)
        Q, F, D = 4, 64, 96
        q = rng.choice([-1.0, 1.0], (Q, D)).astype(np.float32)
        db = rng.choice([-1.0, 1.0], (F, D)).astype(np.float32)
        db[40] = db[9]  # exact duplicate spanning shards (1 and 5)
        mask = np.ones(F, bool)
        mask[17] = mask[63] = False
        mesh = make_mesh(n_data=1, n_bank=8)
        s0, i0 = retrieve(jnp.asarray(q), jnp.asarray(db),
                          jnp.asarray(mask), topk=6)
        s1, i1 = retrieve_sharded(jnp.asarray(q), jnp.asarray(db),
                                  jnp.asarray(mask), mesh, topk=6)
        np.testing.assert_array_equal(np.asarray(s0), np.asarray(s1))
        np.testing.assert_array_equal(np.asarray(i0), np.asarray(i1))

    def test_float_scores_match_to_rounding(self):
        """On generic float VLADs the per-row contraction differs from the
        unsharded matmul only by blocking-order rounding: same ids, scores
        to ~1 ulp."""
        from fastmatch_tpu.dist.mesh import make_mesh
        from fastmatch_tpu.dist.retrieve import retrieve_sharded

        rng = np.random.default_rng(6)
        q = rng.standard_normal((3, 128)).astype(np.float32)
        db = rng.standard_normal((64, 128)).astype(np.float32)
        mask = np.ones(64, bool)
        mesh = make_mesh(n_data=1, n_bank=8)
        s0, i0 = retrieve(jnp.asarray(q), jnp.asarray(db),
                          jnp.asarray(mask), topk=5)
        s1, i1 = retrieve_sharded(jnp.asarray(q), jnp.asarray(db),
                                  jnp.asarray(mask), mesh, topk=5)
        np.testing.assert_array_equal(np.asarray(i0), np.asarray(i1))
        np.testing.assert_allclose(np.asarray(s0), np.asarray(s1),
                                   rtol=1e-6, atol=1e-5)

    def test_shard_size_guard(self):
        from fastmatch_tpu.dist.mesh import make_mesh
        from fastmatch_tpu.dist.retrieve import retrieve_sharded

        mesh = make_mesh(n_data=1, n_bank=8)
        q = jnp.zeros((1, 8))
        with pytest.raises(ValueError):
            retrieve_sharded(q, jnp.zeros((16, 8)), jnp.ones(16, bool),
                             mesh, topk=4)  # 2 rows/shard < topk


class TestHierarchicalLocalize:
    def test_pose_consistency(self, built_map):
        """Retrieval-gated localization agrees with the map's own pose
        to the same bounds as the flat localizer (test_localize)."""
        from fastmatch_tpu.core.camera import Pinhole
        from test_localize import _pose_err

        scene, rec, qfeats = built_map
        db = build_keyframe_db(rec, n_words=32, seed=0)
        cam = Pinhole.from_K(scene.K)
        ok = 0
        for f in (5, 13, 21):
            xy, d, m = qfeats[f]
            r = localize_hierarchical(rec, db, xy, d, m, cam, topk=4)
            if bool(r.ok):
                dc, ang = _pose_err(rec, f, r.R, r.t)
                assert dc < 0.15 and ang < 2.0, (f, dc, ang)
                ok += 1
        assert ok >= 2

    def test_checkpoint_roundtrip(self, built_map, tmp_path):
        """DB built from a saved checkpoint localizes like one built from
        the live Reconstruction."""
        from fastmatch_tpu.core.camera import Pinhole
        from fastmatch_tpu.pipeline.checkpoint import save_map
        from fastmatch_tpu.pipeline.retrieval import map_from_checkpoint

        scene, rec, qfeats = built_map
        path = str(tmp_path / "map")
        save_map(rec, path)
        md = map_from_checkpoint(path)
        db = build_keyframe_db(md, n_words=32, seed=0)
        cam = Pinhole.from_K(scene.K)
        xy, d, m = qfeats[13]
        r = localize_hierarchical(md, db, xy, d, m, cam, topk=4)
        assert bool(r.ok) and int(r.n_inliers) >= 12

    def test_cli_retrieval(self, built_map, tmp_path, capsys):
        """`locate <map> <npz> --retrieval 4` end-to-end."""
        import json

        from fastmatch_tpu.cli import main
        from fastmatch_tpu.pipeline.checkpoint import save_map

        scene, rec, qfeats = built_map
        save_map(rec, str(tmp_path / "map"))
        xy, d, m = qfeats[13]
        np.savez(tmp_path / "q.npz", n_frames=1,
                 image_size=np.array([640, 480]),
                 xy_0=xy, desc_0=d, mask_0=m)
        rc = main(["locate", str(tmp_path / "map"), str(tmp_path / "q.npz"),
                   "--retrieval", "4"])
        assert rc == 0
        lines = [json.loads(l) for l in
                 capsys.readouterr().out.strip().splitlines()]
        assert lines[-1] == {"localized": 1, "of": 1, "retrieval": 4}
        assert lines[0]["ok"] and lines[0]["n_inliers"] >= 12
