"""Multi-host bootstrap (component T20).

SPMD launch: every host runs the same program;
``jax.distributed.initialize`` wires the PJRT coordination service (no
MPI/NCCL anywhere — XLA collectives ride ICI within a slice and DCN across
hosts). Config is broadcast from process 0 so every host optimizes the same
problem.
"""

from __future__ import annotations

import dataclasses
import json
import os

import jax
import numpy as np


def initialize_distributed(
    coordinator: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> dict:
    """Initialize multi-host JAX. Arguments default to the standard env vars
    (COORDINATOR_ADDRESS, NUM_PROCESSES, PROCESS_ID) and fall back to
    single-process if none are set. Returns a status dict."""
    coordinator = coordinator or os.environ.get("COORDINATOR_ADDRESS")
    num_processes = num_processes or int(os.environ.get("NUM_PROCESSES", "0") or 0)
    process_id = (
        process_id
        if process_id is not None
        else int(os.environ.get("PROCESS_ID", "-1"))
    )
    configured = [coordinator is not None and coordinator != "",
                  num_processes > 1, process_id >= 0]
    if any(configured) and not all(configured):
        # Fail fast: a partially-specified launch (e.g. COORDINATOR_ADDRESS
        # typo'd) silently becoming N independent single-host jobs is the
        # worst failure mode a distributed bootstrap can have.
        raise RuntimeError(
            "partial distributed config: coordinator="
            f"{coordinator!r} num_processes={num_processes} "
            f"process_id={process_id} — set all three or none"
        )
    if coordinator and num_processes > 1 and process_id >= 0:
        jax.distributed.initialize(
            coordinator_address=coordinator,
            num_processes=num_processes,
            process_id=process_id,
        )
    return {
        "process_index": jax.process_index(),
        "process_count": jax.process_count(),
        "local_devices": len(jax.local_devices()),
        "global_devices": len(jax.devices()),
    }


def _encode_cfg(o):
    """Config tree -> JSON-able dict. Nodes are frozen dataclasses or
    NamedTuples (SIFTConfig); leaves are plain scalars/strings; plain
    tuples/lists recurse element-wise."""
    if dataclasses.is_dataclass(o):
        return {f.name: _encode_cfg(getattr(o, f.name)) for f in dataclasses.fields(o)}
    if hasattr(o, "_fields"):
        return {k: _encode_cfg(v) for k, v in o._asdict().items()}
    if isinstance(o, (tuple, list)):
        return [_encode_cfg(v) for v in o]
    return o


def _rebuild_cfg(template, data):
    """Rebuild a config of ``template``'s type from decoded JSON ``data`` —
    every host constructs the same types locally, only values travel."""
    if dataclasses.is_dataclass(template):
        kw = {
            f.name: _rebuild_cfg(getattr(template, f.name), data[f.name])
            for f in dataclasses.fields(template)
        }
        return dataclasses.replace(template, **kw)
    if hasattr(template, "_fields"):
        kw = {k: _rebuild_cfg(getattr(template, k), data[k]) for k in template._fields}
        return template._replace(**kw)
    if isinstance(template, (tuple, list)):
        rebuilt = [
            _rebuild_cfg(template[i] if i < len(template) else None, v)
            for i, v in enumerate(data)
        ]
        return tuple(rebuilt) if isinstance(template, tuple) else rebuilt
    return data


def broadcast_config(cfg, is_source: bool | None = None):
    """Broadcast a config tree to all hosts via a device broadcast of its
    JSON bytes — guarantees every host runs the same graded configuration
    (config hash recorded in checkpoints). ``is_source`` marks the owning
    host (default: process 0)."""
    from jax.experimental import multihost_utils

    if jax.process_count() == 1:
        return cfg
    payload = json.dumps(_encode_cfg(cfg)).encode()
    if len(payload) > 65536:
        raise ValueError(f"config too large to broadcast ({len(payload)} bytes)")
    arr = np.frombuffer(payload.ljust(65536, b"\0"), dtype=np.uint8)
    if is_source is None:
        out = multihost_utils.broadcast_one_to_all(arr)
    else:
        out = multihost_utils.broadcast_one_to_all(arr, is_source=is_source)
    data = bytes(np.asarray(out)).rstrip(b"\0")
    return _rebuild_cfg(cfg, json.loads(data.decode()))
