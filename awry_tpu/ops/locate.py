"""Batched locate: LF-walk to sampled suffix-array rows, on device.

The reference walks each BWT row with a data-dependent scalar loop
(src/fm_index.rs:516-544).  On TPU the whole flat batch of rows walks in
lock-step under one `lax.while_loop`: every iteration backsteps all
still-unsampled rows at once (masked), so the trip count is the batch
maximum (~expected sa_ratio steps) instead of the per-row sum.

Ragged per-query outputs are handled two-phase (count -> offsets -> flat
fill), the count-then-fill plan from SURVEY.md section 7.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .device_index import FmDeviceIndex
from .rank import backstep


def lf_walk(index: FmDeviceIndex, rows: jax.Array, *, backstep_fn=None):
    """Walk each BWT row to its nearest sampled row.

    rows: uint32[N].  Returns (text_pos uint32[N], seq_idx int32[N],
    local_pos uint32[N]).

    Sampling is by BWT row (row % sa_ratio == 0,
    src/compressed_suffix_array.rs:109-111); the recovered position is
    (sampled_value + steps) % bwt_len (src/fm_index.rs:533-534).

    backstep_fn: optional override of the LF step (range-sharded engines
    substitute a psum-merged backstep).
    """
    if backstep_fn is None:
        backstep_fn = lambda rw: backstep(index, rw)  # noqa: E731
    r = jnp.uint32(index.sa_ratio)

    def unsampled(rw):
        return rw % r != 0

    def cond(carry):
        rw, _ = carry
        return jnp.any(unsampled(rw))

    def body(carry):
        rw, steps = carry
        live = unsampled(rw)
        stepped = backstep_fn(rw)
        rw = jnp.where(live, stepped, rw)
        steps = steps + live.astype(jnp.uint32)
        return rw, steps

    steps0 = jnp.zeros_like(rows)
    walked, steps = jax.lax.while_loop(cond, body, (rows, steps0))

    sa_vals = index.sampled_sa[(walked // r).astype(jnp.int32)]
    text_pos = (sa_vals + steps) % jnp.uint32(index.bwt_len)
    return text_pos


def count_locate_capped(index: FmDeviceIndex, qsyms: jax.Array, qlens: jax.Array, cap: int):
    """Fused count + locate in ONE device dispatch, up to `cap` hits/query.

    Returns (counts uint32[B], text_pos uint32[B, cap]); entries beyond
    counts[b] are meaningless.  Queries with more than `cap` hits report
    their true count; the engine re-runs just those through the unbounded
    flat path.  This collapses the reference's search-then-per-row-walk
    (src/fm_index.rs:516-544) into a single fused kernel - no host round
    trip between the range search and the LF-walk.  Global->(record, local)
    mapping happens on the host (a trivial searchsorted), keeping the
    device->host payload at one uint32 per hit.
    """
    from .search import counts_from_ranges, search_ranges

    starts, ends = search_ranges(index, qsyms, qlens)
    counts = counts_from_ranges(starts, ends)
    b = starts.shape[0]
    offs = jnp.arange(cap, dtype=jnp.uint32)
    rows = starts[:, None] + offs[None, :]  # [B, cap]
    valid = offs[None, :] < jnp.minimum(counts, jnp.uint32(cap))[:, None]
    flat_rows = jnp.where(valid, rows, jnp.uint32(0)).reshape(-1)  # row 0 is sampled
    text_pos = lf_walk(index, flat_rows)
    return counts, text_pos.reshape(b, cap)
