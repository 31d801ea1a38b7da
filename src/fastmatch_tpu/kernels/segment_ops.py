"""Pallas sorted-segment reductions and gathers for BA-scale tables.

`jax.ops.segment_sum` of (131k, 3) rows into 16k segments costs ~2.2-2.4 ms
on v5e regardless of sortedness hints, and the companion row gather
`table[idx]` another ~1.4 ms — the measured TPU random-access floor
(docs/PERFORMANCE.md). The Schur-complement PCG matvec is four such ops per
iteration and nothing else of consequence, so BA is bound by them.

These kernels exploit the one property XLA can't: the observation table is
SORTED by segment id. A block of consecutive observations then touches only
a narrow window of segment rows, and both directions become small one-hot
matmuls against a VMEM-resident window:

- ``sorted_segment_sum``: out[s] = sum of vals rows with seg == s.
  Grid over obs blocks (TPU grids run sequentially, so overlapping window
  accumulations don't race). Each block walks the 1024-row tile range its
  ids span with a fori loop — arbitrary spans are correct, dense blocks
  run one or two iterations.
- ``sorted_gather_rows``: out[o] = table[seg[o]] — the reverse direction,
  windowed one-hot matmul per block.

Mosaic constraints (same family as kernels/patch_gather.py): dynamic dim-0
slices of (N, small) f32 arrays must be provably aligned to 1024 rows, so
blocks and windows are 1024-row tiles and starts are computed as
``tile_index * 1024`` in-kernel; per-block tile ranges are scalar-prefetched
(host-side ``seg[::1024] // 1024``). One-hot matmuls run as a two-pass bf16 hi/lo
split at ``Precision.DEFAULT`` (see ``_dot2``): the one-hot side is exact
in bf16, and the value side is split into bf16 hi + lo parts so each value
carries ~16 mantissa bits across the two passes — relative error ~2^-16
per contraction versus a full f32 HIGHEST dot (which costs 6 MXU passes
and was measured to be the entire kernel cost). Consumers that compare
against XLA's segment_sum must budget tolerance for this split, not just
for summation-order differences (BA parity tests use rtol >= 1e-4).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

def _dot2(oh, hi, lo):
    """Exact-enough one-hot matmul: the one-hot side is exact in bf16 and
    the value side is split into bf16 hi + lo parts (two DEFAULT-precision
    MXU passes, ~2^-18 relative error). A single HIGHEST-precision f32 dot
    costs 6 passes over the (1024, 1024) one-hot — measured to be the whole
    kernel cost."""
    f = functools.partial(jax.lax.dot, precision=jax.lax.Precision.DEFAULT,
                          preferred_element_type=jnp.float32)
    return f(oh, hi) + f(oh, lo)


_BLK = 8192   # obs rows per grid step (8 chunks; fewer grid steps = less
#               per-step launch overhead, measured ~20 us/step)
_CHUNK = 1024  # rows per inner chunk (dim-0 slice alignment unit)
_WIN = 1024    # segment-row window tile


def _block_tiles(seg, O, n_rows):
    """Host-side per-CHUNK (first_tile, last_tile) for scalar prefetch."""
    first = seg[::_CHUNK] // _WIN
    last = seg[_CHUNK - 1::_CHUNK] // _WIN
    max_t = max(n_rows // _WIN - 1, 0)
    first = jnp.clip(first, 0, max_t)
    last = jnp.clip(last, 0, max_t)
    return jnp.stack([first, last], axis=1).astype(jnp.int32)  # (O/_CHUNK, 2)


def _segsum_kernel(meta_ref, seg_ref, vals_ref, out_ref, *, n_seg: int,
                   n_chunks_total: int):
    b = pl.program_id(0)

    @pl.when(b == 0)
    def _zero():
        out_ref[...] = jnp.zeros_like(out_ref)

    n_chunks = _BLK // _CHUNK

    def chunk_body(ci, _):
        c = b * n_chunks + ci  # global chunk id (meta row)
        seg = seg_ref[pl.ds(ci * _CHUNK, _CHUNK)]
        vals = vals_ref[pl.ds(ci * _CHUNK, _CHUNK), :]

        hi = vals.astype(jnp.bfloat16)
        lo = (vals - hi.astype(jnp.float32)).astype(jnp.bfloat16)

        if n_seg <= _WIN:
            rows = jax.lax.broadcasted_iota(jnp.int32, (n_seg, _CHUNK), 0)
            oh = (rows == seg[None, :]).astype(jnp.bfloat16)
            out_ref[...] += _dot2(oh, hi, lo)
            return 0

        def body(t, _):
            base = t * _WIN
            rows = jax.lax.broadcasted_iota(jnp.int32, (_WIN, _CHUNK), 0)
            oh = (rows == (seg - base)[None, :]).astype(jnp.bfloat16)
            out_ref[pl.ds(t * _WIN, _WIN), :] += _dot2(oh, hi, lo)
            return 0

        jax.lax.fori_loop(meta_ref[c, 0], meta_ref[c, 1] + 1, body, 0)
        return 0

    hi = jnp.minimum(n_chunks, n_chunks_total - b * n_chunks)
    jax.lax.fori_loop(0, hi, chunk_body, 0)


@functools.partial(jax.jit, static_argnames=("n_segments", "interpret"))
def sorted_segment_sum(vals: jnp.ndarray, seg: jnp.ndarray, n_segments: int,
                       interpret: bool = False) -> jnp.ndarray:
    """Segment-sum of (O, D) rows into (n_segments, D); ``seg`` SORTED
    ascending. O must divide by 1024 and n_segments by 1024 (or be <= 1024);
    callers pad (BA capacities are powers of two).
    """
    O, D = vals.shape
    if O % _CHUNK:
        raise ValueError(f"O={O} must divide by {_CHUNK}")
    if n_segments > _WIN and n_segments % _WIN:
        raise ValueError(f"n_segments={n_segments} must divide by {_WIN}")
    meta = _block_tiles(seg, O, n_segments)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(-(-O // _BLK),),
        # Block the obs-length inputs: (O, 36) assembly values exceed VMEM
        # whole (measured OOM inside the BA while-loop program).
        in_specs=[pl.BlockSpec((_BLK,), lambda b, m: (b,)),
                  pl.BlockSpec((_BLK, D), lambda b, m: (b, 0))],
        out_specs=pl.BlockSpec(
            (n_segments, D), lambda b, m: (0, 0)),
    )
    return pl.pallas_call(
        functools.partial(_segsum_kernel, n_seg=n_segments,
                          n_chunks_total=O // _CHUNK),
        out_shape=jax.ShapeDtypeStruct((n_segments, D), vals.dtype),
        grid_spec=grid_spec,
        interpret=interpret,
    )(meta, seg, vals)


def _gather_kernel(meta_ref, seg_ref, table_ref, out_ref, *, n_rows: int,
                   cols: int):
    b = pl.program_id(0)
    n_chunks = _BLK // _CHUNK
    nch_total = seg_ref.shape[0] // _CHUNK

    def chunk_body(ci, _):
        c = b * n_chunks + ci
        seg = seg_ref[pl.ds(c * _CHUNK, _CHUNK)]

        if n_rows <= _WIN:
            rows = jax.lax.broadcasted_iota(jnp.int32, (_CHUNK, n_rows), 1)
            oh = (rows == seg[:, None]).astype(jnp.bfloat16)
            tab = table_ref[...]
            thi = tab.astype(jnp.bfloat16)
            tlo = (tab - thi.astype(jnp.float32)).astype(jnp.bfloat16)
            out_ref[pl.ds(c * _CHUNK, _CHUNK), :] = _dot2(oh, thi, tlo)
            return 0

        def body(t, acc):
            base = t * _WIN
            rows = jax.lax.broadcasted_iota(jnp.int32, (_CHUNK, _WIN), 1)
            oh = (rows == (seg - base)[:, None]).astype(jnp.bfloat16)
            win = table_ref[pl.ds(t * _WIN, _WIN), :]
            whi = win.astype(jnp.bfloat16)
            wlo = (win - whi.astype(jnp.float32)).astype(jnp.bfloat16)
            return acc + _dot2(oh, whi, wlo)

        acc = jax.lax.fori_loop(
            meta_ref[c, 0], meta_ref[c, 1] + 1, body,
            jnp.zeros((_CHUNK, cols), jnp.float32))
        out_ref[pl.ds(c * _CHUNK, _CHUNK), :] = acc
        return 0

    hi = jnp.minimum(n_chunks, nch_total - b * n_chunks)
    jax.lax.fori_loop(0, hi, chunk_body, 0)


@functools.partial(jax.jit, static_argnames=("interpret",))
def sorted_gather_rows(table: jnp.ndarray, seg: jnp.ndarray,
                       interpret: bool = False) -> jnp.ndarray:
    """out[o] = table[seg[o]] with ``seg`` SORTED ascending; (O, D) result.

    O must divide by 1024; table rows by 1024 (or be <= 1024).
    """
    O = seg.shape[0]
    N, D = table.shape
    if O % _CHUNK:
        raise ValueError(f"O={O} must divide by {_CHUNK}")
    if N > _WIN and N % _WIN:
        raise ValueError(f"table rows {N} must divide by {_WIN}")
    meta = _block_tiles(seg, O, N)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(-(-O // _BLK),),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        functools.partial(_gather_kernel, n_rows=N, cols=D),
        out_shape=jax.ShapeDtypeStruct((O, D), table.dtype),
        grid_spec=grid_spec,
        interpret=interpret,
    )(meta, seg, table)
