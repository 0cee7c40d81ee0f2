"""Device rank (occurrence) primitives: the heart of backward search.

This is the TPU-native form of the reference's SIMD kernel + windowed-BWT
rank (src/simd_instructions.rs:98-121, src/bwt.rs:110-135, :226-271): for a
batch of (position, symbol) pairs, gather each position's 256-bit occurrence
window (8 uint32 lanes per bit-plane), combine the planes with the symbol's
exact-match XOR masks, apply the inclusive positional mask, popcount, and add
the block milestone.  Everything is uint32 VPU work that XLA fuses behind the
two HBM gathers (planes + milestones), which are the true cost; a Pallas
variant with explicit DMA pipelining lives in rank_pallas.py.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .device_index import FmDeviceIndex

_FULL = jnp.uint32(0xFFFFFFFF)


def occurrence_windows(index: FmDeviceIndex, pos: jax.Array) -> jax.Array:
    """Gather the bit-plane windows for a batch of global positions.

    pos: uint32 [...]; returns uint32 [..., V, 8].
    """
    block = (pos >> 8).astype(jnp.int32)
    return index.planes[block]


def window_popcount(
    index: FmDeviceIndex, windows: jax.Array, pos: jax.Array, sym: jax.Array
) -> jax.Array:
    """Masked popcount of `sym` occurrences within pre-gathered windows
    (milestone NOT added); the sharded engine adds its local milestones.

    windows: uint32 [..., V, 8]; pos: uint32 [...]; sym: int32 [...].
    """
    local = (pos & jnp.uint32(255)).astype(jnp.uint32)
    codes = index.index_to_code[sym]  # uint32 [...]

    occv = jnp.full(windows.shape[:-2] + (8,), _FULL, dtype=jnp.uint32)
    for v in range(index.num_planes):
        bit = (codes >> jnp.uint32(v)) & jnp.uint32(1)
        xor_mask = jnp.where(bit == 1, jnp.uint32(0), _FULL)
        occv = occv & (windows[..., v, :] ^ xor_mask[..., None])

    # Inclusive mask selecting bits [0..=local] across the 8 u32 lanes
    # (mask inclusivity: src/simd_instructions.rs:106-107).
    word = (local >> 5)[..., None]
    lane = jnp.arange(8, dtype=jnp.uint32)
    in_word = (_FULL >> (jnp.uint32(31) - (local & jnp.uint32(31))))[..., None]
    mask = jnp.where(lane < word, _FULL, jnp.where(lane == word, in_word, jnp.uint32(0)))

    return jax.lax.population_count(occv & mask).sum(axis=-1, dtype=jnp.uint32)


def occurrence_from_windows(
    index: FmDeviceIndex, windows: jax.Array, pos: jax.Array, sym: jax.Array
) -> jax.Array:
    """Rank given pre-gathered windows: milestone + masked popcount.
    Returns uint32 [...]: Occ(pos, sym), occurrences in BWT[0..=pos]."""
    block = (pos >> 8).astype(jnp.int32)
    return index.milestones[block, sym] + window_popcount(index, windows, pos, sym)


def occurrence(index: FmDeviceIndex, pos: jax.Array, sym: jax.Array) -> jax.Array:
    """Occ(pos, sym) for batches of positions/symbols (uint32 in/out)."""
    return occurrence_from_windows(index, occurrence_windows(index, pos), pos, sym)


def update_range(index: FmDeviceIndex, starts: jax.Array, ends: jax.Array, sym: jax.Array):
    """Batched LF-mapping range update (src/fm_index.rs:559-582).

    starts/ends: uint32 [...]; start >= 1 invariant holds for all reachable
    ranges (src/search.rs:43-48), so starts-1 never wraps.
    """
    c = index.prefix_sums[sym]
    new_starts = c + occurrence(index, starts - jnp.uint32(1), sym)
    new_ends = c + occurrence(index, ends, sym) - jnp.uint32(1)
    return new_starts, new_ends


def seed_range(index: FmDeviceIndex, sym: jax.Array):
    """Initial range for a single symbol (src/search.rs:43-48)."""
    return index.prefix_sums[sym], index.prefix_sums[sym + 1] - jnp.uint32(1)


def symbol_at(index: FmDeviceIndex, pos: jax.Array) -> jax.Array:
    """Reconstruct BWT symbol indices at a batch of rows
    (src/bwt.rs:52-62): read one bit per plane, decode via the code LUT."""
    block = (pos >> 8).astype(jnp.int32)
    local = pos & jnp.uint32(255)
    word = (local >> 5).astype(jnp.int32)
    bit = (local & jnp.uint32(31)).astype(jnp.uint32)
    windows = index.planes[block]  # [..., V, 8]
    code = jnp.zeros(pos.shape, dtype=jnp.int32)
    for v in range(index.num_planes):
        lanes = jnp.take_along_axis(windows[..., v, :], word[..., None], axis=-1)[..., 0]
        code = code | (((lanes >> bit) & jnp.uint32(1)).astype(jnp.int32) << v)
    return index.code_to_index[code]


def backstep(index: FmDeviceIndex, pos: jax.Array) -> jax.Array:
    """One LF step per row (src/fm_index.rs:585-593); sentinel rows -> 0."""
    sym = symbol_at(index, pos)
    is_sentinel = sym == 0
    safe = jnp.where(is_sentinel, index.alphabet.ambiguity_idx, sym)
    stepped = index.prefix_sums[safe] + occurrence(index, pos, safe) - jnp.uint32(1)
    return jnp.where(is_sentinel, jnp.uint32(0), stepped)
