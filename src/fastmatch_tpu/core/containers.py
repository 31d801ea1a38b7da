"""Fixed-capacity padded containers and the masking discipline.

XLA compiles static shapes; real images yield variable keypoint counts. The
framework-wide convention (SURVEY.md §8.2 "hard parts") is:

- every ragged collection is stored at a fixed capacity ``C`` (a power of two,
  MXU/VPU friendly) together with a boolean ``mask`` of shape ``(C,)`` marking
  live entries;
- padded *descriptor rows are zero* and padded *distances are +inf* — a padded
  row must never win an argmin / top-2 (a zero-distance padded row would
  silently corrupt the Lowe ratio test);
- all reductions over the capacity axis must be written mask-aware.

Containers are NamedTuples, hence JAX pytrees: they pass transparently through
``jit`` / ``vmap`` / ``shard_map`` and shard per-leaf. A leading batch axis is
added by ``vmap``, not stored here.

Capability spec: BASELINE.json configs 1-2 (2x ~2k 128-d descriptors per
image, batched over 64+ pairs).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

# Canonical SIFT descriptor dimensionality (4x4 spatial bins x 8 orientations).
DESC_DIM = 128
# Default per-image keypoint capacity: fits ~2k keypoints (BASELINE.json:6).
DEFAULT_CAPACITY = 2048


class Keypoints(NamedTuple):
    """Detected keypoints at fixed capacity.

    xy:    (C, 2) float32 — subpixel (x, y) in image coordinates.
    scale: (C,)   float32 — blob scale (sigma).
    angle: (C,)   float32 — dominant orientation, radians in [0, 2pi).
    score: (C,)   float32 — detector response (|DoG| at the extremum).
    mask:  (C,)   bool    — True for live entries.
    """

    xy: jnp.ndarray
    scale: jnp.ndarray
    angle: jnp.ndarray
    score: jnp.ndarray
    mask: jnp.ndarray

    @property
    def capacity(self) -> int:
        return self.xy.shape[-2]

    def count(self) -> jnp.ndarray:
        return jnp.sum(self.mask, axis=-1)


class Descriptors(NamedTuple):
    """128-d descriptors at fixed capacity.

    data: (C, 128) float32 — L2-normalized SIFT descriptors; padded rows zero.
    mask: (C,)     bool    — True for live entries.
    """

    data: jnp.ndarray
    mask: jnp.ndarray

    @property
    def capacity(self) -> int:
        return self.data.shape[-2]

    def count(self) -> jnp.ndarray:
        return jnp.sum(self.mask, axis=-1)


class BinaryDescriptors(NamedTuple):
    """Packed binary descriptors (rBRIEF-style) at fixed capacity.

    packed: (C, n_bits // 32) uint32 — bit i of word w is test 32*w + i;
            padded rows are all-zero.
    mask:   (C,) bool — True for live entries.

    Hamming distance between two rows is popcount(xor). On TPU the product
    matcher never popcounts: rows unpack to {-1, +1}^n_bits vectors (padded
    rows to zeros) whose squared L2 distance is exactly ``4 * hamming`` —
    the existing MXU distance/top-2 kernels apply verbatim, and because bit
    values and their <=n_bits integer dot products are exactly representable
    in bf16-in/f32-accumulate, even the "fast" kernel path is EXACT for
    binary descriptors. See matching/hamming.py.
    """

    packed: jnp.ndarray
    mask: jnp.ndarray

    @property
    def capacity(self) -> int:
        return self.packed.shape[-2]

    @property
    def n_bits(self) -> int:
        return self.packed.shape[-1] * 32

    def count(self) -> jnp.ndarray:
        return jnp.sum(self.mask, axis=-1)


def unpack_bits_signed(packed: jnp.ndarray, mask: jnp.ndarray,
                       dtype=jnp.float32) -> jnp.ndarray:
    """(..., W) uint32 packed bits -> (..., 32*W) ``dtype`` in {-1, +1}.

    Rows where ``mask`` is False unpack to zeros (the padded-row convention of
    ``Descriptors``: a zero row can never win a masked reduction). +-1 and 0
    are exact in bf16, so ``dtype=jnp.bfloat16`` unpacks losslessly while
    halving the materialized operand (the MXU fast path's native feed).
    """
    shifts = jnp.arange(32, dtype=jnp.uint32)
    bits = (packed[..., None] >> shifts) & jnp.uint32(1)  # (..., W, 32)
    signed = (2 * bits.astype(jnp.int32) - 1).astype(dtype)
    flat = signed.reshape(*packed.shape[:-1], packed.shape[-1] * 32)
    return jnp.where(mask[..., None], flat, jnp.zeros((), dtype))


def pack_bits(bits: jnp.ndarray) -> jnp.ndarray:
    """(..., 32*W) bool/0-1 bits -> (..., W) uint32 packed words."""
    if bits.shape[-1] % 32:
        raise ValueError(f"bit count must be a multiple of 32, got {bits.shape[-1]}")
    w = bits.shape[-1] // 32
    grouped = bits.astype(jnp.uint32).reshape(*bits.shape[:-1], w, 32)
    shifts = jnp.arange(32, dtype=jnp.uint32)
    return jnp.sum(grouped << shifts, axis=-1, dtype=jnp.uint32)


def binary_descriptors_from_numpy(
    packed: np.ndarray, capacity: int = DEFAULT_CAPACITY
) -> BinaryDescriptors:
    """Build a padded BinaryDescriptors container from a host (N, W) uint32 array."""
    if packed.ndim != 2 or packed.dtype != np.uint32:
        raise ValueError(f"expected (N, W) uint32 packed bits, got {packed.shape} {packed.dtype}")
    data, mask = pad_to_capacity(packed, capacity)
    return BinaryDescriptors(packed=jnp.asarray(data), mask=jnp.asarray(mask))


class Matches(NamedTuple):
    """Result of matching query descriptors A against bank B.

    One row per A-slot (capacity of A):

    idx:   (C,) int32   — matched index into B (undefined where ~valid).
    dist:  (C,) float32 — squared L2 distance of the best match (+inf invalid).
    valid: (C,) bool    — survived masking + ratio test (+ cross-check).
    """

    idx: jnp.ndarray
    dist: jnp.ndarray
    valid: jnp.ndarray

    def count(self) -> jnp.ndarray:
        return jnp.sum(self.valid, axis=-1)


def pad_to_capacity(arr: np.ndarray, capacity: int, fill: float = 0.0):
    """Pad host array's leading axis to ``capacity``; return (padded, mask).

    Truncates (keeping the first ``capacity`` rows) if over capacity — callers
    that care about which rows survive should pre-sort by detector response.
    """
    n = min(arr.shape[0], capacity)
    padded = np.full((capacity,) + arr.shape[1:], fill, dtype=arr.dtype)
    padded[:n] = arr[:n]
    mask = np.zeros((capacity,), dtype=bool)
    mask[:n] = True
    return padded, mask


def descriptors_from_numpy(desc: np.ndarray, capacity: int = DEFAULT_CAPACITY) -> Descriptors:
    """Build a padded Descriptors container from a host (N, 128) array."""
    if desc.ndim != 2 or desc.shape[1] != DESC_DIM:
        raise ValueError(f"expected (N, {DESC_DIM}) descriptors, got {desc.shape}")
    data, mask = pad_to_capacity(desc.astype(np.float32), capacity)
    return Descriptors(data=jnp.asarray(data), mask=jnp.asarray(mask))
