"""Batched backward search on device.

The reference's per-query scalar loop (get_search_range_for_string,
src/fm_index.rs:402-438) becomes one `lax.fori_loop` over the padded query
length with an active-mask per lane, vectorized over the whole batch: each
step performs two rank gathers (start-1, end) for every live query.  The
k-mer lookup table supplies the seed range - skipping the first k steps -
whenever a query's last k symbols are all encoding symbols, which is exactly
when a table entry exists (and equals the recomputed range, so results are
identical to the reference's always-recompute path; SURVEY.md 2.3 quirk #1).

Masking invariants that make the fixed-shape loop exact:
* updating an empty range keeps it empty, and `start >= 1` persists, so
  lanes frozen by the early-exit mask can still compute safely;
* pad symbols are never consumed because the mask requires step < len.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .device_index import FmDeviceIndex
from .rank import seed_range, update_range


def search_ranges(index: FmDeviceIndex, qsyms: jax.Array, qlens: jax.Array, *, update_fn=None):
    """Backward-search a batch of queries to their final BWT ranges.

    Args:
      qsyms: int32[B, L] symbol indices, right-padded (pad value ignored).
      qlens: int32[B] true query lengths (0 allowed -> empty range).
      update_fn: optional (starts, ends, sym) -> (starts, ends) override for
        the LF-mapping step; used by the Pallas kernel path and the
        range-sharded collective path.  Defaults to rank.update_range.

    Returns:
      (starts, ends): uint32[B] inclusive ranges; empty iff start > end.
    """
    if update_fn is None:
        update_fn = lambda s, e, sym: update_range(index, s, e, sym)  # noqa: E731
    B, L = qsyms.shape
    rows = jnp.arange(B)

    last_pos = jnp.maximum(qlens - 1, 0)
    last_sym = qsyms[rows, last_pos]
    s0, e0 = seed_range(index, last_sym)
    steps_done = jnp.ones((B,), dtype=jnp.int32)

    k = index.kmer_len
    if k > 0 and L >= k:
        # Dense radix address over the last k symbols (host layout:
        # awry_tpu/host_engine._kmer_address).
        offs = qlens[:, None] - k + jnp.arange(k, dtype=jnp.int32)[None, :]
        lastk = jnp.take_along_axis(qsyms, jnp.clip(offs, 0, L - 1), axis=1)
        dense = index.index_to_dense[lastk]  # [B, k]
        seedable = (qlens >= k) & (dense >= 0).all(axis=1)
        base = index.alphabet.num_encoding_symbols
        # int32 addressing caps the table at 2^31 entries - far beyond any
        # practical k (4^13 = 67M is already 0.5 GiB of table).
        weights = base ** jnp.arange(k - 1, -1, -1, dtype=jnp.int32)
        addr = (jnp.maximum(dense, 0) * weights).sum(axis=1)
        addr = jnp.clip(addr, 0, index.kmer_table.shape[0] - 1)
        ts = index.kmer_table[addr, 0]
        te = index.kmer_table[addr, 1]
        s0 = jnp.where(seedable, ts, s0)
        e0 = jnp.where(seedable, te, e0)
        steps_done = jnp.where(seedable, jnp.int32(k), steps_done)

    def body(i, carry):
        starts, ends = carry
        pos = qlens - 1 - i
        active = (i >= steps_done) & (pos >= 0) & (starts <= ends)
        sym = qsyms[rows, jnp.maximum(pos, 0)]
        new_starts, new_ends = update_fn(starts, ends, sym)
        starts = jnp.where(active, new_starts, starts)
        ends = jnp.where(active, new_ends, ends)
        return starts, ends

    if L > 1:
        s0, e0 = jax.lax.fori_loop(1, L, body, (s0, e0))

    # Zero-length queries yield the canonical empty range (start=1, end=0,
    # src/search.rs:51-56).
    is_empty_query = qlens <= 0
    starts = jnp.where(is_empty_query, jnp.uint32(1), s0)
    ends = jnp.where(is_empty_query, jnp.uint32(0), e0)
    return starts, ends


def counts_from_ranges(starts: jax.Array, ends: jax.Array) -> jax.Array:
    """Range length (src/search.rs:66-71); 0 for empty ranges."""
    return jnp.where(starts <= ends, ends - starts + jnp.uint32(1), jnp.uint32(0))


def count_batch_kernel(index: FmDeviceIndex, qsyms: jax.Array, qlens: jax.Array) -> jax.Array:
    starts, ends = search_ranges(index, qsyms, qlens)
    return counts_from_ranges(starts, ends)
