"""Pallas TPU kernel for the fused rank (occurrence) computation.

TPU-native successor of the reference's AVX2/NEON kernel
(src/simd_instructions.rs:78-177 + the boolean formulas in
src/bwt.rs:117-129, :233-265).  The per-(query,position) work - combine the
occurrence bit-planes with the symbol's XOR polarity masks, apply the
inclusive positional mask, popcount 8 uint32 lanes, add the milestone - runs
as one VPU-resident Pallas kernel over a whole query tile at once, replacing
the reference's one-position-at-a-time intrinsics.

The two HBM gathers feeding the kernel (plane windows + milestones, the
random-access part) are left to XLA's native gather: their cost is pure HBM
latency/bandwidth either way, and keeping them outside lets XLA overlap them
across loop steps.  The kernel fuses everything after the gather.

`pallas_count_batch_kernel` is a drop-in replacement for
search.count_batch_kernel that routes every rank through this kernel
(both range endpoints of every live query in a single launch).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .device_index import FmDeviceIndex
from .search import counts_from_ranges

_FULL = jnp.uint32(0xFFFFFFFF)


def _fused_rank_kernel(windows_ref, xor_ref, local_ref, milestone_ref, out_ref):
    """One query tile: out = milestone + popcount(AND_v(plane_v ^ xor_v) & mask).

    Shapes (TB = tile size):
      windows_ref   uint32 [TB, V * 8]   gathered plane windows, planes contiguous
      xor_ref       uint32 [TB, V]       per-plane XOR polarity masks
      local_ref     uint32 [TB, 1]       position within 256-symbol block
      milestone_ref uint32 [TB, 1]       gathered milestone counts
      out_ref       uint32 [TB, 1]
    """
    tb = windows_ref.shape[0]
    nv = xor_ref.shape[1]
    full = jnp.uint32(0xFFFFFFFF)  # constructed inside the kernel trace

    occv = jnp.full((tb, 8), full, dtype=jnp.uint32)
    for v in range(nv):
        occv = occv & (windows_ref[:, v * 8 : (v + 1) * 8] ^ xor_ref[:, v : v + 1])

    local = local_ref[:, :]  # [TB, 1]
    word = local >> 5
    lane = jax.lax.broadcasted_iota(jnp.uint32, (tb, 8), dimension=1)
    in_word = full >> (jnp.uint32(31) - (local & jnp.uint32(31)))
    mask = jnp.where(lane < word, full, jnp.where(lane == word, in_word, jnp.uint32(0)))

    # Mosaic has no unsigned reductions; popcounts fit comfortably in int32.
    pop = (
        jax.lax.population_count(occv & mask)
        .astype(jnp.int32)
        .sum(axis=1, keepdims=True)
        .astype(jnp.uint32)
    )
    out_ref[:, :] = milestone_ref[:, :] + pop


def _auto_interpret(interpret: bool | None) -> bool:
    """Pallas TPU kernels run compiled on TPU, interpreted elsewhere (the
    CPU test harness uses interpreter mode, pallas_guide 'Debugging')."""
    if interpret is None:
        return jax.default_backend() != "tpu"
    return interpret


@functools.partial(jax.jit, static_argnames=("interpret",))
def pallas_rank(index: FmDeviceIndex, pos: jax.Array, sym: jax.Array, *, interpret: bool | None = None):
    """Occ(pos, sym) via the Pallas kernel.  pos uint32[B], sym int32[B]."""
    interpret = _auto_interpret(interpret)
    b = pos.shape[0]
    tb = min(256, b) if b % 256 else 256
    if b % tb:
        raise ValueError(f"batch size {b} must be a multiple of the tile {tb}")

    block = (pos >> 8).astype(jnp.int32)
    nv = index.num_planes
    windows = index.planes[block].reshape(b, nv * 8)  # XLA gather (HBM)
    milestones = index.milestones[block, sym][:, None]
    codes = index.index_to_code[sym]
    bits = (codes[:, None] >> jnp.arange(nv, dtype=jnp.uint32)[None, :]) & jnp.uint32(1)
    xor_masks = jnp.where(bits == 1, jnp.uint32(0), _FULL)
    local = (pos & jnp.uint32(255))[:, None]

    grid = (b // tb,)
    out = pl.pallas_call(
        _fused_rank_kernel,
        out_shape=jax.ShapeDtypeStruct((b, 1), jnp.uint32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tb, nv * 8), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, nv), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tb, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        interpret=interpret,
    )(windows, xor_masks, local, milestones)
    return out[:, 0]


def pallas_update_range(index: FmDeviceIndex, starts, ends, sym, *, interpret: bool | None = None):
    """LF-mapping range update with both endpoints ranked in ONE kernel
    launch (positions stacked), halving launch overhead vs two calls."""
    pos = jnp.concatenate([starts - jnp.uint32(1), ends])
    sym2 = jnp.concatenate([sym, sym])
    occ = pallas_rank(index, pos, sym2, interpret=interpret)
    b = starts.shape[0]
    c = index.prefix_sums[sym]
    return c + occ[:b], c + occ[b:] - jnp.uint32(1)


def pallas_search_ranges(index: FmDeviceIndex, qsyms: jax.Array, qlens: jax.Array, *, interpret: bool | None = None):
    """search.search_ranges with the Pallas fused-rank update step."""
    from .search import search_ranges

    def update_fn(starts, ends, sym):
        return pallas_update_range(index, starts, ends, sym, interpret=interpret)

    return search_ranges(index, qsyms, qlens, update_fn=update_fn)


def pallas_count_batch_kernel(index: FmDeviceIndex, qsyms: jax.Array, qlens: jax.Array):
    starts, ends = pallas_search_ranges(index, qsyms, qlens)
    return counts_from_ranges(starts, ends)
