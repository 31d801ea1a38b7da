"""Config system (component T22): frozen dataclasses per layer, composed.

Configs are hashable/static so they can be passed through jit boundaries as
static arguments; ``config_hash`` is recorded in checkpoints (T23).
"""

from __future__ import annotations

import dataclasses
import hashlib
import json

from fastmatch_tpu.features.sift import SIFTConfig


@dataclasses.dataclass(frozen=True)
class MatchingConfig:
    ratio: float = 0.8
    cross_check: bool = True
    backend: str = "auto"  # jnp | pallas | auto
    precision: str = "exact"  # exact | fast (bf16 MXU feed, >=99% agreement)


@dataclasses.dataclass(frozen=True)
class RansacConfig:
    n_hyp: int = 512
    thr_px: float = 2.0          # inlier threshold in pixels (converted by f)
    min_inliers: int = 15
    model_select: bool = True    # bootstrap H-vs-E selection (planar scenes)


@dataclasses.dataclass(frozen=True)
class BAConfig:
    max_iters: int = 15
    pcg_iters: int = 40
    huber_px: float = 2.0
    interval: int = 5            # run BA every N frames
    # Focal length used to convert huber_px to normalized coords when BA is
    # traced INSIDE a compiled program (pipeline/slam_scan.py) and the
    # camera vector is a tracer. Populated from the camera at entry; the
    # host-driven paths read camera.fx directly and ignore this.
    fx_hint: float = 500.0
    # Scan-mode interval BA: static bucket for the LOCAL observation
    # selection (tracker.compact_obs_local — exact; rows beyond the bucket
    # drop oldest-first). 0 = solve over the full obs capacity. Host-driven
    # engines bucket dynamically from the live count instead and ignore
    # this.
    local_obs_cap: int = 8192
    # Interval-BA budgets (round 3): the every-N-frames drift-control solve
    # starts warm (the previous interval's solution) and is re-polished by
    # the final global BA, so it needs far fewer iterations than a cold
    # solve. 0 = inherit max_iters / pcg_iters. Both engines (scan and
    # per-frame driver) read the same knobs. NOTE: capped budgets stop
    # PCG mid-convergence, where the engines' different XLA compile
    # contexts leave ~1e-5 fusion noise — engine parity is bitwise only
    # with budgets 0 (run to stagnation), tolerance-level otherwise
    # (tested both ways in test_slam_scan).
    # Defaults measured on the 100-frame chip bench: 6/16 is +25% engine
    # throughput at unchanged ATE (0.00246 vs 0.00248 with full budgets;
    # 4/12 is +47% at 0.00253 — left to users who want it). The interval
    # CADENCE is not a knob to relax: interval=10 at full budgets was
    # 26x worse ATE.
    interval_max_iters: int = 6
    interval_pcg_iters: int = 16


@dataclasses.dataclass(frozen=True)
class MapConfig:
    max_frames: int = 64
    max_points: int = 8192
    max_obs: int = 65536
    min_parallax_deg: float = 1.0
    # Landmark-descriptor width: 128 for SIFT; 256 for the ORB family fed
    # through the float pipeline as +-1/16 unit-norm vectors (d2 then
    # equals hamming/64, so every SIFT-scaled threshold below applies).
    desc_dim: int = 128
    # New-landmark dedup: a keypoint whose nearest map descriptor is closer
    # than this squared-L2 distance is a re-observation, not a new landmark.
    # The ratio test CANNOT do this job: once two copies of a landmark are
    # in the bank, d1 ~ d2 and the ratio test reports "no match" forever,
    # making duplication self-sustaining.
    dedup_desc_d2: float = 0.35


@dataclasses.dataclass(frozen=True)
class PipelineConfig:
    sift: SIFTConfig = SIFTConfig()
    matching: MatchingConfig = MatchingConfig()
    ransac: RansacConfig = RansacConfig()
    ba: BAConfig = BAConfig()
    map: MapConfig = MapConfig()

    def config_hash(self) -> str:
        def enc(o):
            if dataclasses.is_dataclass(o):
                return {f.name: enc(getattr(o, f.name)) for f in dataclasses.fields(o)}
            if hasattr(o, "_asdict"):
                return dict(o._asdict())
            return o

        return hashlib.sha256(
            json.dumps(enc(self), sort_keys=True, default=str).encode()
        ).hexdigest()[:16]
