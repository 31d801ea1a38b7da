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
