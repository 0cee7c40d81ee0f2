"""Pallas TPU kernel for the fused rank (occurrence) computation.

TPU-native successor of the reference's AVX2/NEON kernel
(src/simd_instructions.rs:78-177 + the boolean formulas in
src/bwt.rs:117-129, :233-265).  The per-(query,position) work - combine the
occurrence bit-planes with the symbol's XOR polarity masks, apply the
inclusive positional mask, popcount, add the milestone - runs as one
VPU-resident Pallas kernel over a whole query tile at once, in the same
lane-major layout as the XLA path (batch in the 128-wide lane dimension,
the 8 window words in sublanes).

The fused-row HBM gather feeding the kernel is left to XLA's native gather:
for in-VMEM-range indexes it runs at memory speed, and keeping it outside
lets XLA overlap it across loop steps.  The kernel fuses everything after
the gather.

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
from .rank import prefix_sum_select, select_u32
from ..alphabet import index_to_code_table
from .search import counts_from_ranges


def _fused_rank_kernel(nv: int):
    def kernel(windows_ref, xor_ref, local_ref, milestone_ref, out_ref):
        """One query tile, lane-major.

        Shapes (TB = lane tile):
          windows_ref   uint32 [V * 8, TB]  gathered plane windows (transposed)
          xor_ref       uint32 [V, TB]      per-plane XOR polarity masks
          local_ref     uint32 [1, TB]      position within 256-symbol block
          milestone_ref uint32 [1, TB]      milestone counts (selected outside)
          out_ref       uint32 [1, TB]
        """
        full = jnp.uint32(0xFFFFFFFF)
        tb = windows_ref.shape[1]

        occv = None
        for v in range(nv):
            plane = windows_ref[v * 8 : (v + 1) * 8, :] ^ xor_ref[v : v + 1, :]
            occv = plane if occv is None else occv & plane

        local = local_ref[:, :]  # [1, TB]
        word = local >> 5
        lane = jax.lax.broadcasted_iota(jnp.uint32, (8, 1), dimension=0)
        in_word = full >> (jnp.uint32(31) - (local & jnp.uint32(31)))
        mask = jnp.where(lane < word, full, jnp.where(lane == word, in_word, jnp.uint32(0)))

        # Mosaic has no unsigned reductions; popcounts fit easily in int32.
        pop = (
            jax.lax.population_count(occv & mask)
            .astype(jnp.int32)
            .sum(axis=0, keepdims=True)
            .astype(jnp.uint32)
        )
        out_ref[:, :] = milestone_ref[:, :] + pop

    return kernel


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
    tb = min(512, b) if b % 512 else 512
    if b % tb:
        raise ValueError(f"batch size {b} must be a multiple of the tile {tb}")

    nv = index.num_planes
    rows_t = index.blocks[(pos >> 8).astype(jnp.int32)].T  # ONE fused gather
    windows_t = rows_t[: nv * 8]
    milestones = rows_t[index.plane_words]
    for c in range(1, index.alphabet.cardinality):
        milestones = jnp.where(sym == c, rows_t[index.plane_words + c], milestones)

    code_table = index_to_code_table(index.alphabet)
    xor_rows = []
    for v in range(nv):
        bits = [(int(c) >> v) & 1 for c in code_table]
        xor_rows.append(select_u32([0xFFFFFFFF if bb == 0 else 0 for bb in bits], sym))
    xor_masks = jnp.stack(xor_rows, axis=0)  # [V, B]
    local = (pos & jnp.uint32(255))[None, :]

    grid = (b // tb,)
    out = pl.pallas_call(
        _fused_rank_kernel(nv),
        out_shape=jax.ShapeDtypeStruct((1, b), jnp.uint32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((nv * 8, tb), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((nv, tb), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tb), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tb), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tb), lambda i: (0, i), memory_space=pltpu.VMEM),
        interpret=interpret,
    )(windows_t, xor_masks, local, milestones[None, :])
    return out[0]


def pallas_update_range(index: FmDeviceIndex, starts, ends, sym, *, interpret: bool | None = None):
    """LF-mapping range update with both endpoints ranked in ONE kernel
    launch (positions stacked), halving launch overhead vs two calls."""
    pos = jnp.concatenate([starts - jnp.uint32(1), ends])
    sym2 = jnp.concatenate([sym, sym])
    occ = pallas_rank(index, pos, sym2, interpret=interpret)
    b = starts.shape[0]
    c = prefix_sum_select(index, sym)
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
