"""Pallas patch-gather: per-keypoint square patches from a VMEM-resident
octave stack.

The SIFT orientation/descriptor stages each extract one (P, P) patch per
keypoint. As a vmapped ``jax.lax.dynamic_slice`` this lowers to an XLA
gather from HBM and runs at the measured ~300-500 MB/s random-access floor
(docs/PERFORMANCE.md): 2048 19x19 patches = 3 MB took 5.6 ms — the entire
cost of the orientation stage. This kernel instead pins the whole octave
stack in VMEM (a 480x640 6-level stack is ~7.4 MB of the 16 MB budget) and
slices patches on-chip: HBM traffic collapses to one read of the stack
plus one write of the patches.

Mosaic constraints shape the addressing: a dynamic sublane offset must be
PROVABLY 8-aligned, and dynamic lane offsets are not sliceable at all. So
each keypoint loads an aligned row slab ``stack[l, 8*(y//8) : +ROWS, :]``
(the multiply-by-8 makes alignment provable), then uses ``pltpu.roll``
with dynamic shifts to rotate the wanted window to the origin in both
axes, and takes a static (P, P) corner. Rolls are register shuffles — no
HBM traffic, no alignment demands.

Grid: one program per block of keypoints; the (K, 4) (level, y//8, x, y%8)
index array is scalar-prefetched into SMEM.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(idx_ref, stack_ref, out_ref, *, block_k: int, patch: int,
            rows: int, width: int):
    blk = pl.program_id(0)

    def body(i, _):
        k = blk * block_k + i
        # Bit-packed (SMEM budget): l<<27 | dy<<22 | y8<<12 | x.
        packed = idx_ref[k]
        x = packed & 0xFFF
        y8 = (packed >> 12) & 0x3FF
        dy = (packed >> 22) & 0x1F
        l = (packed >> 27) & 0x7
        # Two-level lane addressing: a 128-aligned 256-wide window first
        # (the >>7 / *128 pair makes alignment PROVABLE for Mosaic), then a
        # cheap roll of the narrow window. Rolling the full-width slab
        # instead costs 3x more VREG shuffling (measured 2.8 -> 1.x ms).
        x128 = jnp.minimum(x >> 7, (width - 256) >> 7)
        xr = x - x128 * 128
        slab = stack_ref[l, pl.ds(y8 * 8, rows), pl.ds(x128 * 128, 256)]
        slab = pltpu.roll(slab, shift=256 - xr, axis=1)
        slab = pltpu.roll(slab, shift=rows - dy, axis=0)
        out_ref[i] = slab[:patch, :patch]
        return 0

    jax.lax.fori_loop(0, block_k, body, 0)


@functools.partial(jax.jit, static_argnames=("patch", "block_k", "interpret"))
def gather_patches(
    stack: jnp.ndarray,
    lyx: jnp.ndarray,
    patch: int,
    block_k: int = 128,
    interpret: bool = False,
) -> jnp.ndarray:
    """(L, Hp, Wp) stack + (K, 3) int32 (level, y, x) -> (K, patch, patch).

    Equivalent to ``stack[l, y:y+patch, x:x+patch]`` per row of ``lyx``;
    starts are clamped so the patch lies inside the stack. K must be a
    multiple of ``block_k`` (keypoint capacities are powers of two >= 128).
    On CPU (tests) ``interpret=True`` runs the same kernel through the
    Pallas interpreter.
    """
    L, Hp, Wp = lyx_shape = stack.shape
    K = lyx.shape[0]
    if K % block_k:
        raise ValueError(f"K={K} must divide by block_k={block_k}")
    rows = patch + 8 + (-(patch + 8)) % 8  # aligned slab height
    # Pad the stack so (a) height is a multiple of 8 — the bottom-edge slab
    # clamp then lands exactly at Hp - rows and dy + patch <= rows always
    # holds — and (b) width is a multiple of 128 (lane-friendly rolls).
    ph = (-Hp) % 8
    pw = (-Wp) % 128
    if Wp + pw < 256:
        pw = 256 - Wp  # the kernel's aligned lane window is 256 wide
    if ph or pw:
        stack = jnp.pad(stack, ((0, 0), (0, ph), (0, pw)), mode="edge")
    Hp += ph
    Wp += pw
    if rows > Hp:
        raise ValueError(f"patch {patch} too large for stack height {Hp}")
    if patch > 128:
        raise ValueError(f"patch {patch} exceeds the 256-wide lane window")
    if L > 8 or Hp > 8 * 1024 or Wp > 4096:
        raise ValueError(f"stack shape {stack.shape} exceeds packed-index "
                         "range (L<=8, Hp<=8192, Wp<=4096)")
    l = jnp.clip(lyx[:, 0], 0, L - 1)
    y = jnp.clip(lyx[:, 1], 0, lyx_shape[1] - patch)
    x = jnp.clip(lyx[:, 2], 0, lyx_shape[2] - patch)
    y8 = jnp.minimum(y // 8, (Hp - rows) // 8)
    dy = y - y8 * 8  # [0, 8) normally; <= rows - patch at the bottom edge
    idx = ((l.astype(jnp.int32) << 27) | (dy.astype(jnp.int32) << 22)
           | (y8.astype(jnp.int32) << 12) | x.astype(jnp.int32))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(K // block_k,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(
            (block_k, patch, patch), lambda b, idx_ref: (b, 0, 0)
        ),
    )
    return pl.pallas_call(
        functools.partial(_kernel, block_k=block_k, patch=patch,
                          rows=rows, width=Wp),
        out_shape=jax.ShapeDtypeStruct((K, patch, patch), stack.dtype),
        grid_spec=grid_spec,
        interpret=interpret,
    )(idx, stack)
