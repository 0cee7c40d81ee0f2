"""K-mer seed-table construction on device.

The reference builds its table by a depth-first recursion of scalar range
updates (kmer_lookup_table.rs:121-167).  The TPU-native shape is k
breadth-wise rounds (SURVEY.md section 7 step 6): round `level` extends all
base**level prefixes by every encoding symbol in ONE vectorized
update_range over the whole next level - for the default nucleotide k=10
that is 10 launches totalling ~1.4M range updates, and k=13 (the chr20
benchmark config) stays practical: ~89M updates at VMEM-resident rank
throughput.

Addressing matches the host builder exactly (host_engine._kmer_address):
address = sum dense(symbol at distance j from the k-mer end) * base**j.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..alphabet import dense_to_index_table
from .device_index import FmDeviceIndex
from .rank import seed_range, update_range


@jax.jit
def _seed_level(index: FmDeviceIndex, syms: jax.Array):
    return seed_range(index, syms)


# Largest number of range updates materialized at once: each update gathers a
# fused row per endpoint, and XLA's (8,128)-tiled gather intermediate pads
# ~3x, so 2M updates ~= 2.7 GB of HBM temp - deep tables (k=13 is 67M
# entries) must be built in chunks.
_LEVEL_CHUNK = 1 << 21


_extend_small = jax.jit(update_range)  # module-level: trace cache survives across builds


def _extend_chunk_fn(size: int, base: int):
    @jax.jit
    def fn(index: FmDeviceIndex, prev_starts, prev_ends, syms, off):
        n = min(_LEVEL_CHUNK, size * base)
        idx = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0)[:, 0] + off
        d = idx // np.int32(size)
        old = idx % np.int32(size)
        return update_range(index, prev_starts[old], prev_ends[old], syms[d])

    return fn


def populate_kmer_table_device(index: FmDeviceIndex, kmer_len: int | None = None) -> np.ndarray:
    """Build the dense k-mer seed table on the device.

    Returns uint64[base**k, 2] in the same layout as
    host_engine.populate_kmer_table (bit-identical ranges).
    """
    alphabet = index.alphabet
    base = alphabet.num_encoding_symbols
    k = kmer_len if kmer_len is not None else index.kmer_len
    if k == 0:  # table disabled: single canonical-empty entry, never read
        return np.array([[1, 0]], dtype=np.uint64)
    raw_syms = dense_to_index_table(alphabet).astype(np.int32)  # dense rank -> raw index
    syms = jnp.asarray(raw_syms)

    starts, ends = _seed_level(index, syms)
    level = 1
    while level < k:
        size = base**level
        new_size = size * base
        # Prepend symbol d (dense rank): new_addr = d * base**level + old_addr.
        if new_size <= _LEVEL_CHUNK:
            rep_syms = jnp.repeat(syms, size)
            tile_starts = jnp.tile(starts, base)
            tile_ends = jnp.tile(ends, base)
            starts, ends = _extend_small(index, tile_starts, tile_ends, rep_syms)
        else:
            fn = _extend_chunk_fn(size, base)
            out_s, out_e = [], []
            for off in range(0, new_size, _LEVEL_CHUNK):
                cs, ce = fn(index, starts, ends, syms, np.int32(off))
                out_s.append(cs)
                out_e.append(ce)
            # The final chunk may run past new_size (lanes compute with
            # clamped symbol indices and are discarded here).
            starts = jnp.concatenate(out_s)[:new_size]
            ends = jnp.concatenate(out_e)[:new_size]
        level += 1

    starts = np.asarray(starts).astype(np.int64)
    ends = np.asarray(ends).astype(np.int64)
    table = np.stack(
        [np.maximum(starts, 0).astype(np.uint64), np.maximum(ends, 0).astype(np.uint64)],
        axis=1,
    )
    empty = starts > ends
    table[empty, 0] = 1  # canonical empty range (src/search.rs:51-56)
    table[empty, 1] = 0
    return table
