"""Fused distance + top-2 + column-argmin Pallas TPU kernel (T3/T4).

The hot kernel named by the north star (BASELINE.json:5): for query
descriptors A (N, 128) and bank B (M, 128), produce per-row the two smallest
squared L2 distances and their B-indices (for the Lowe ratio test), plus the
per-column nearest A-row (for the mutual cross-check) — in ONE pass, the
(N, M) distance matrix never materialized in HBM.

Design (TPU-first, B-resident):

- Grid is 1-D over A row-tiles; the whole bank B (and its masked squared
  norms) stays resident in VMEM across grid steps (its BlockSpec index map is
  constant, so Pallas loads it once). Each step runs one
  ``(TN, 128) @ (128, M)`` MXU matmul and reduces it on the VPU.
- Monotonic trick: within a row, ordering by ``d2 = |a|^2 + |b|^2 - 2ab``
  equals ordering by ``|b|^2 - 2ab`` (row-constant |a|^2 dropped); |a|^2 is
  added only when materializing output distances. Masking folds into the
  precomputed ``b2m``/``a2m`` (+BIG for dead entries) so masked entries can
  never win a reduction and no NaNs appear (BIG is finite).
- Cross-check argmin over rows accumulates in a full-width (1, M) VMEM
  scratch with a strict-< merge, so earlier row-tiles win ties — globally
  "lowest index wins", bit-identical to jnp argmin/top_k tie-breaking.
- Benchmarked on TPU v5e (2048x2048x128, f32 HIGHEST): ~0.035 ms vs 26 ms
  for the jnp/XLA path — the earlier 2-D-grid variant with dynamic-slice
  scratch updates ran at 42 ms, ~1200x slower than this layout; keep the
  grid 1-D and the reductions full-width.

VMEM budget: B (M x 128 f32) + cross (TN x M f32) x ~4 live temporaries;
``_pick_tile_n`` shrinks TN to fit the ~16 MB budget up to M = 4096. Larger
banks take the chunked jnp merge path in ``match_pair_pallas`` (the
multi-chip ring in dist/ shards banks below this limit anyway).

Parity contract: decision-identical to matching/matcher.match_pair_jnp —
the jnp reference deliberately mirrors this op order. CI runs interpret=True
on CPU (SURVEY.md §5.2 "Kernel parity"); bench.py exercises the chip.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from fastmatch_tpu.core.containers import Descriptors, Matches
from fastmatch_tpu.matching.matcher import BIG

DESC_DIM = 128
MAX_RESIDENT_M = 4096  # beyond this, fall back to chunked merging


def _distance_topk_kernel(
    a_ref,    # (TN, 128) f32 block
    b_ref,    # (M, 128) f32, VMEM-resident
    b2m_ref,  # (1, M) f32: |b|^2 (+BIG where masked)
    a2m_ref,  # (TN, 1) f32 block: |a|^2 (+BIG where masked)
    i1_ref,   # out (TN, 1) i32: best B index per row
    d1_ref,   # out (TN, 1) f32: best squared distance
    d2_ref,   # out (TN, 1) f32: second-best squared distance
    nnb_ref,  # out (1, M) i32: best A row per B column
    colv_s,   # scratch (1, M) f32
    coli_s,   # scratch (1, M) i32
    *,
    tile_n: int,
    m: int,
    fast: bool,
):
    i = pl.program_id(0)
    ni = pl.num_programs(0)

    if fast:
        # One bf16 MXU pass instead of the multi-pass f32-HIGHEST
        # decomposition: 1.8x end-to-end (7.7k -> 13.8k pairs/s at 64x2048),
        # >=99.8% decision agreement with the exact path (tested) — meets
        # the >=99% agreement gate, opt-in via precision="fast".
        # precision=DEFAULT explicitly: the package-level
        # jax_default_matmul_precision="highest" would otherwise apply to
        # this bf16 dot and crash the Mosaic compiler (and defeat the point).
        cross = jnp.dot(
            a_ref[:].astype(jnp.bfloat16),
            b_ref[:].astype(jnp.bfloat16).T,
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.DEFAULT,
        )
    else:
        cross = jnp.dot(
            a_ref[:],
            b_ref[:].T,
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
    neg2 = -2.0 * cross  # (TN, M)

    # --- row-wise top-2 (ratio test) ---
    srow = neg2 + b2m_ref[:]
    col = jax.lax.broadcasted_iota(jnp.int32, srow.shape, 1)
    v1 = jnp.min(srow, axis=1, keepdims=True)
    i1 = jnp.min(jnp.where(srow == v1, col, m), axis=1, keepdims=True)
    srow2 = jnp.where(col == i1, BIG, srow)
    v2 = jnp.min(srow2, axis=1, keepdims=True)
    a2 = a2m_ref[:]
    i1_ref[:] = i1
    d1_ref[:] = jnp.maximum(v1 + a2, 0.0)
    d2_ref[:] = jnp.maximum(v2 + a2, 0.0)

    # --- column-wise argmin over A rows (cross-check) ---
    scol = neg2 + a2
    cm = jnp.min(scol, axis=0, keepdims=True)  # (1, M)
    row = jax.lax.broadcasted_iota(jnp.int32, scol.shape, 0)
    ca = jnp.min(jnp.where(scol == cm, row, tile_n), axis=0, keepdims=True) + i * tile_n

    @pl.when(i == 0)
    def _init():
        colv_s[:] = jnp.full_like(colv_s, BIG)
        coli_s[:] = jnp.zeros_like(coli_s)

    win = cm < colv_s[:]  # strict: earlier tiles win ties
    colv_s[:] = jnp.where(win, cm, colv_s[:])
    coli_s[:] = jnp.where(win, ca, coli_s[:])

    @pl.when(i == ni - 1)
    def _finalize():
        nnb_ref[:] = coli_s[:]


def _pick_tile_n(n: int, m: int, requested: int, d: int = DESC_DIM) -> int:
    """Largest row tile that keeps ~4 live (TN, M) f32 temporaries + B under
    the VMEM budget."""
    budget = 12 * 1024 * 1024 - 4 * m * d
    tn = requested
    while tn > 128 and 4 * tn * m * 4 > budget:
        tn //= 2
    while n % tn:
        tn //= 2
    return max(tn, 8)


@functools.partial(jax.jit, static_argnames=("tile_n", "interpret", "fast"))
def distance_topk(
    a: jnp.ndarray,
    b: jnp.ndarray,
    b2m: jnp.ndarray,
    a2m: jnp.ndarray,
    tile_n: int = 256,
    interpret: bool = False,
    fast: bool = False,
):
    """Fused kernel entry. a: (N, 128), b: (M, 128), b2m: (M,) masked |b|^2,
    a2m: (N,) masked |a|^2. M <= MAX_RESIDENT_M. Returns
    (idx1 (N,), d1 (N,), d2nd (N,), nnb (M,))."""
    n, d = a.shape
    m, d2 = b.shape
    # Dim-generic (SIFT 128-d, unpacked 256-bit binary, ...): lanes want a
    # multiple of 128 so the (TN, D) / (M, D) VMEM tiles stay aligned.
    if d != d2 or d % 128 != 0:
        raise ValueError(f"descriptor dim must match and be a multiple of 128, got {d}/{d2}")
    if m > MAX_RESIDENT_M:
        raise ValueError(f"M={m} exceeds VMEM-resident limit {MAX_RESIDENT_M}")
    tn = _pick_tile_n(n, m, tile_n, d)
    grid = (n // tn,)
    kernel = functools.partial(_distance_topk_kernel, tile_n=tn, m=m, fast=fast)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tn, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((m, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, m), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tn, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((tn, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tn, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tn, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, m), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n, 1), jnp.int32),
            jax.ShapeDtypeStruct((n, 1), jnp.float32),
            jax.ShapeDtypeStruct((n, 1), jnp.float32),
            jax.ShapeDtypeStruct((1, m), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((1, m), jnp.float32),
            pltpu.VMEM((1, m), jnp.int32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * n * m * d,
            bytes_accessed=4 * (n * d + m * d + 3 * n + 2 * m),
            transcendentals=0,
        ),
        interpret=interpret,
    )(a, b, b2m.reshape(1, -1), a2m.reshape(-1, 1))
    idx1, d1, d2nd, nnb = out
    return idx1[:, 0], d1[:, 0], d2nd[:, 0], nnb[0, :]


def match_pair_pallas(
    desc_a: Descriptors,
    desc_b: Descriptors,
    ratio: float = 0.8,
    cross_check: bool = True,
    tile_n: int = 256,
    interpret: bool | None = None,
    precision: str = "exact",
) -> Matches:
    """Fused-kernel matcher; decision-identical to match_pair_jnp.

    precision="exact" (default) matches the jnp anchor bit-for-bit (f32
    HIGHEST matmul). precision="fast" feeds the MXU in bf16 — 1.8x faster,
    >=99.8% decision agreement (the >=99% gate, tested on near-tie-heavy
    workloads).

    Banks larger than MAX_RESIDENT_M are processed in VMEM-sized chunks with
    a jnp merge of per-chunk top-2/argmin results (same tie-break order:
    earlier chunks win ties).

    The whole wrapper is jitted: per-op eager dispatch through the TPU relay
    costs ~5 ms/op, which swamps the ~0.04 ms kernel.
    """
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    if precision not in ("exact", "fast"):
        raise ValueError(f"precision must be 'exact' or 'fast', got {precision!r}")
    return _match_pair_pallas_jit(
        desc_a, desc_b, ratio, cross_check=cross_check, tile_n=tile_n,
        interpret=interpret, fast=precision == "fast",
    )


@functools.partial(jax.jit, static_argnames=("cross_check", "tile_n", "interpret", "fast"))
def _match_pair_pallas_jit(
    desc_a: Descriptors,
    desc_b: Descriptors,
    ratio,
    cross_check: bool,
    tile_n: int,
    interpret: bool,
    fast: bool = False,
) -> Matches:
    a = desc_a.data.astype(jnp.float32)
    b = desc_b.data.astype(jnp.float32)
    n, m = a.shape[0], b.shape[0]
    a2 = jnp.sum(a * a, axis=-1)
    b2 = jnp.sum(b * b, axis=-1)
    a2m = jnp.where(desc_a.mask, a2, BIG)
    b2m = jnp.where(desc_b.mask, b2, BIG)
    tn = min(tile_n, n)

    if m <= MAX_RESIDENT_M:
        idx1, d1, d2nd, nnb = distance_topk(
            a, b, b2m, a2m, tile_n=tn, interpret=interpret, fast=fast
        )
    else:
        idx1, d1, d2nd, nnb = _chunked_topk(a, b, b2m, a2m, tn, interpret, fast)

    r = jnp.float32(ratio)
    ok = desc_a.mask & (d1 < r * r * d2nd) & (d2nd < BIG)
    if cross_check:
        mutual = nnb[idx1] == jnp.arange(n, dtype=jnp.int32)
        ok = ok & mutual
    return Matches(idx=idx1.astype(jnp.int32), dist=jnp.where(ok, d1, BIG), valid=ok)


def _chunked_topk(a, b, b2m, a2m, tile_n, interpret, fast=False):
    """Large banks: run the kernel per MAX_RESIDENT_M-chunk of B and merge.

    The running merge keeps earlier chunks on ties (strict <), preserving the
    global lowest-index-wins contract. nnb needs no merge (columns partition
    across chunks).
    """
    n, m = a.shape[0], b.shape[0]
    chunk = MAX_RESIDENT_M
    if m % chunk:
        # Pad the bank to a chunk multiple with dead entries: zero rows with
        # +BIG masked norms can never win a reduction, and callers index nnb
        # only at live columns.
        pad = chunk - m % chunk
        b = jnp.concatenate([b, jnp.zeros((pad, b.shape[1]), b.dtype)])
        b2m = jnp.concatenate([b2m, jnp.full((pad,), BIG, b2m.dtype)])
        m = m + pad
    n_chunks = m // chunk
    bc = b.reshape(n_chunks, chunk, b.shape[1])
    b2c = b2m.reshape(n_chunks, chunk)

    def step(carry, inp):
        v1, i1, v2, base = carry
        bk, b2k = inp
        ci1, cd1, cd2, cnnb = distance_topk(
            a, bk, b2k, a2m, tile_n=tile_n, interpret=interpret, fast=fast
        )
        gi1 = ci1 + base
        take1 = cd1 < v1
        nv1 = jnp.where(take1, cd1, v1)
        ni1 = jnp.where(take1, gi1, i1)
        sec_new = jnp.where(v1 <= cd2, v1, cd2)
        sec_old = jnp.where(cd1 < v2, cd1, v2)
        nv2 = jnp.where(take1, sec_new, sec_old)
        return (nv1, ni1, nv2, base + chunk), cnnb

    init = (
        jnp.full((n,), BIG, jnp.float32),
        jnp.zeros((n,), jnp.int32),
        jnp.full((n,), BIG, jnp.float32),
        jnp.int32(0),
    )
    (d1, idx1, d2nd, _), nnbs = jax.lax.scan(step, init, (bc, b2c))
    return idx1, d1, d2nd, nnbs.reshape(-1)
