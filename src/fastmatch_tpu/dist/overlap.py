"""Matching <-> BA overlap scheduler (component T19).

Pipeline-parallel analog for the SLAM loop (BASELINE.json:5 "matching and BA
overlap per map block"): while block k's BA refines, block k+1's matching is
already in flight. On the single-controller JAX runtime this is expressed
through *async dispatch*: jitted computations are enqueued without blocking
the host, so issuing match(k+1) before consuming ba(k)'s outputs lets XLA's
scheduler (and, multi-chip, different devices via shardings) overlap them.
The scheduler is therefore a small double-buffered driver: it owns the
ordering contract (results identical to the serial schedule — tested) and
the buffer discipline, not the parallelism itself.
"""

from __future__ import annotations

from typing import Any, Callable, Iterable

import jax


class OverlapScheduler:
    """Double-buffered two-stage pipeline: stage_a feeds stage_b per block.

    stage_a: block -> intermediate (e.g. sharded matching of block k)
    stage_b: intermediate -> result (e.g. BA on block k's matches)

    Dispatch order per step k: enqueue a(k+1) BEFORE blocking on b(k), so
    device queues stay busy. Results are yielded in block order; numerical
    results are identical to the serial schedule by construction (no state
    is shared between blocks mid-flight).
    """

    def __init__(self, stage_a: Callable[[Any], Any], stage_b: Callable[[Any], Any]):
        self.stage_a = stage_a
        self.stage_b = stage_b

    def run(self, blocks: Iterable[Any]):
        blocks = list(blocks)
        if not blocks:
            return []
        results = []
        inter = self.stage_a(blocks[0])  # async dispatch
        for k in range(len(blocks)):
            pending_b = self.stage_b(inter)  # async: consumes a(k)
            if k + 1 < len(blocks):
                inter = self.stage_a(blocks[k + 1])  # overlaps with b(k)
            results.append(pending_b)
        # Materialize at the end (single sync point).
        return [jax.block_until_ready(r) for r in results]
