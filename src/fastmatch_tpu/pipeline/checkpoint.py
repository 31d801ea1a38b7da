"""Checkpoint/resume of map state via orbax (component T23).

The checkpointable state is the full reconstruction pytree: poses,
landmarks, descriptor bank, observation table, counters, and the config
hash (restores refuse a mismatched config unless forced). Sharded arrays
restore with the same NamedShardings they were saved with (orbax handles
the layout); the fault-tolerance model is checkpoint-restart (SURVEY.md
§6.3): on host loss, relaunch the slice and resume from the last snapshot.
"""

from __future__ import annotations

import os

import numpy as np


def _state_dict(rec) -> dict:
    return {
        "R": rec.R,
        "t": rec.t,
        "pose_mask": rec.pose_mask,
        "points": rec.points,
        "pt_mask": rec.pt_mask,
        "pt_desc": rec.pt_desc,
        "obs_cam": rec.obs_cam,
        "obs_pt": rec.obs_pt,
        "obs_uv": rec.obs_uv,
        "obs_mask": rec.obs_mask,
        "counters": np.array([rec.n_frames, rec.n_points, rec.n_obs], np.int64),
        "config_hash": np.frombuffer(
            rec.cfg.config_hash().encode().ljust(16, b"\0")[:16], dtype=np.uint8
        ).copy(),
    }


def save_map(rec, path: str):
    """Save the reconstruction's map state to ``path`` (a directory)."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    ckptr = ocp.PyTreeCheckpointer()
    ckptr.save(path, _state_dict(rec), force=True)


def _edges_to_arrays(edges):
    if not edges:
        return {
            "i": np.zeros(0, np.int32), "j": np.zeros(0, np.int32),
            "R": np.zeros((0, 3, 3), np.float32),
            "t": np.zeros((0, 3), np.float32),
        }
    return {
        "i": np.array([e[0] for e in edges], np.int32),
        "j": np.array([e[1] for e in edges], np.int32),
        "R": np.stack([e[2] for e in edges]).astype(np.float32),
        "t": np.stack([e[3] for e in edges]).astype(np.float32),
    }


def _edges_from_arrays(d):
    return [(int(i), int(j), R, t) for i, j, R, t
            in zip(np.asarray(d["i"]), np.asarray(d["j"]),
                   np.asarray(d["R"]), np.asarray(d["t"]))]


def save_track_state(state, book: dict, out, path: str):
    """Checkpoint a device-resident SLAM run (pipeline/tracker.TrackState +
    the driver bookkeeping + accumulated pose-graph edges). Together with
    the driver's fold_in(seed, frame) key discipline this makes resume
    bit-deterministic with the uninterrupted run (tested)."""
    import orbax.checkpoint as ocp

    tree = {
        "state": {k: np.asarray(v) for k, v in state._asdict().items()},
        "book": {k: np.asarray(v) for k, v in book.items()},
        "odo": _edges_to_arrays(out.odo_edges),
        "loops": _edges_to_arrays(out.loop_edges),
        "frame_seq": np.array(out.frame_seq, np.int32),
        "pgo_runs": np.int32(out.pgo_runs),
    }
    ckptr = ocp.PyTreeCheckpointer()
    ckptr.save(os.path.abspath(path), tree, force=True)


def restore_track_state(path: str):
    """Restore (state, book, out) for drive_slam(resume=...). ``out.rec``
    is left as None — the driver materializes it at the end of the run."""
    import jax.numpy as jnp
    import orbax.checkpoint as ocp

    from fastmatch_tpu.pipeline.slam import SlamResult
    from fastmatch_tpu.pipeline.tracker import TrackState

    tree = ocp.PyTreeCheckpointer().restore(os.path.abspath(path))
    st = TrackState(**{k: jnp.asarray(v) for k, v in tree["state"].items()})
    book = {k: (np.asarray(v) if np.ndim(v) else np.asarray(v).item())
            for k, v in tree["book"].items()}
    out = SlamResult(rec=None)
    out.odo_edges = _edges_from_arrays(tree["odo"])
    out.loop_edges = _edges_from_arrays(tree["loops"])
    out.frame_seq = [int(x) for x in np.asarray(tree["frame_seq"])]
    out.pgo_runs = int(tree["pgo_runs"])
    return st, book, out


def restore_map(rec, path: str, strict_config: bool = True):
    """Restore map state into ``rec`` (a fresh Reconstruction with matching
    capacities and config). Returns rec."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    ckptr = ocp.PyTreeCheckpointer()
    state = ckptr.restore(path)
    saved_hash = bytes(np.asarray(state["config_hash"], np.uint8)).rstrip(b"\0").decode()
    if strict_config and saved_hash != rec.cfg.config_hash():
        raise ValueError(
            f"checkpoint config hash {saved_hash} != current {rec.cfg.config_hash()}"
        )
    for name in ("R", "t", "pose_mask", "points", "pt_mask", "pt_desc",
                 "obs_cam", "obs_pt", "obs_uv", "obs_mask"):
        arr = np.array(state[name])
        getattr(rec, name)[:] = arr
    rec.n_frames, rec.n_points, rec.n_obs = (int(x) for x in state["counters"])
    return rec
