"""FmQueryEngine: the user-facing device query API.

Replaces the reference's count_string / locate_string / parallel_count /
parallel_locate (src/fm_index.rs:455-544).  The reference's parallelism is a
rayon thread pool over independent queries; here every call is a batch: the
engine encodes and pads queries on the host, runs jit-compiled batch kernels
on the device, and unpads the results.  Padded shapes are bucketed so the
number of distinct compiled programs stays small.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..alphabet import encode_ascii, index_to_ascii_table
from ..index import FmIndexData
from .device_index import FmDeviceIndex, to_device
from .locate import lf_walk
from .search import count_batch_kernel, search_ranges


def _bucket(n: int, minimum: int = 16) -> int:
    """Round up to the next power of two (bounded recompiles)."""
    b = minimum
    while b < n:
        b *= 2
    return b


def encode_query_batch(alphabet, queries, *, min_batch: int = 16, min_len: int = 8):
    """Shared host-side query encoding: list of str/bytes -> (np int32[B, L]
    RIGHT-ALIGNED, np int32[B]) with power-of-two-bucketed padded shapes.
    Right alignment makes each backward-search step a static column read
    (awry_tpu/ops/search.py).  Uniform-length batches take a fully
    vectorized path."""
    qbytes = [q.encode() if isinstance(q, str) else bytes(q) for q in queries]
    lens = [len(q) for q in qbytes]
    B = _bucket(max(1, len(qbytes)), minimum=min_batch)
    L = _bucket(max(lens, default=1), minimum=min_len)
    qlens = np.zeros((B,), dtype=np.int32)
    qlens[: len(lens)] = lens
    # int8 on the wire: symbol indices are < 22, and query upload bandwidth
    # is part of the serving hot path.
    qsyms = np.zeros((B, L), dtype=np.int8)
    if qbytes and len(set(lens)) == 1 and lens[0] > 0:
        flat = np.frombuffer(b"".join(qbytes), dtype=np.uint8)
        qsyms[: len(qbytes), L - lens[0] :] = (
            encode_ascii(alphabet, flat).reshape(len(qbytes), lens[0])
        )
    else:
        for i, q in enumerate(qbytes):
            if len(q):
                qsyms[i, L - len(q) :] = encode_ascii(alphabet, q)
    return qsyms, qlens


class FmQueryEngine:
    """Batch count/locate engine over a device-resident FM-index."""

    def __init__(self, index: FmIndexData | FmDeviceIndex, *, use_pallas: bool = False):
        if isinstance(index, FmIndexData):
            self.device_index = to_device(index)
        else:
            self.device_index = index
        from .locate import count_locate_capped
        from .search import unpack_nibbles

        # Wire format: alphabets with cardinality <= 16 (nucleotide) ship
        # queries nibble-packed; the kernels unpack on device.
        self._wire_packed = self.device_index.alphabet.cardinality <= 16

        def wrap(kernel):
            if not self._wire_packed:
                return kernel

            def wrapped(idx, qwire, qlens, **kw):
                return kernel(idx, unpack_nibbles(qwire), qlens, **kw)

            return wrapped

        if use_pallas:
            from .rank_pallas import pallas_count_batch_kernel

            self._count_fn = jax.jit(wrap(pallas_count_batch_kernel))
        else:
            self._count_fn = jax.jit(wrap(count_batch_kernel))
        self._ranges_fn = jax.jit(wrap(search_ranges))
        self._walk_fn = jax.jit(lf_walk)
        self._count_locate_fn = jax.jit(wrap(count_locate_capped), static_argnames=("cap",))
        self._seq_starts_host = np.asarray(self.device_index.seq_starts).astype(np.int64)

    # -- host-side encoding ------------------------------------------------
    def encode_queries(self, queries) -> tuple[jax.Array, jax.Array]:
        """Encode + pad a list of str/bytes queries to [B, L] symbols and
        [B] lengths (padded shapes are bucketed).

        Uniform-length batches (the common production shape: fixed-length
        reads) take a fully vectorized path: one concatenated frombuffer +
        one LUT pass instead of a per-query Python loop.
        """
        qsyms, qlens = encode_query_batch(self.device_index.alphabet, queries)
        if self._wire_packed:
            packed = (qsyms[:, 0::2] | (qsyms[:, 1::2] << 4)).astype(np.uint8)
            return jnp.asarray(packed), jnp.asarray(qlens)
        return jnp.asarray(qsyms), jnp.asarray(qlens)

    # -- public API --------------------------------------------------------
    def count_batch(self, queries) -> np.ndarray:
        """parallel_count analog: occurrence count per query (uint64)."""
        qsyms, qlens = self.encode_queries(queries)
        counts = self._count_fn(self.device_index, qsyms, qlens)
        return np.asarray(counts)[: len(queries)].astype(np.uint64)

    def search_ranges_batch(self, queries) -> tuple[np.ndarray, np.ndarray]:
        """Final BWT ranges per query (inclusive; empty iff start > end)."""
        qsyms, qlens = self.encode_queries(queries)
        starts, ends = self._ranges_fn(self.device_index, qsyms, qlens)
        n = len(queries)
        return np.asarray(starts)[:n], np.asarray(ends)[:n]

    def locate_batch(self, queries, *, cap: int = 8) -> list[list[tuple[int, int]]]:
        """parallel_locate analog: (sequence_idx, local_position) pairs per
        query, in BWT-row order (reference order, src/fm_index.rs:521)."""
        _, results = self.count_locate_batch(queries, cap=cap)
        return results

    def count_locate_batch(self, queries, *, cap: int = 8):
        """Counts AND locations in ONE device dispatch (up to `cap` hits per
        query on the fast path; only queries exceeding the cap re-run
        through the unbounded flat-row path).  Returns (uint64[B] counts,
        list of per-query (sequence_idx, local_position) lists)."""
        qsyms, qlens = self.encode_queries(queries)
        counts, text_pos = self._count_locate_fn(self.device_index, qsyms, qlens, cap=cap)
        counts = np.asarray(counts)[: len(queries)].astype(np.int64)
        seq_idx, local = self._localize(np.asarray(text_pos))
        results: list[list[tuple[int, int]]] = []
        overflow = [i for i in range(len(queries)) if counts[i] > cap]
        overflow_results = (
            dict(zip(overflow, self._locate_flat([queries[i] for i in overflow])))
            if overflow
            else {}
        )
        for i in range(len(queries)):
            if counts[i] > cap:
                results.append(overflow_results[i])
            else:
                c = int(counts[i])
                results.append(list(zip(seq_idx[i, :c].tolist(), local[i, :c].tolist())))
        return counts.astype(np.uint64), results

    def _localize(self, text_pos: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        """Global text positions -> (record index, local position), host-side
        searchsorted over the record starts (src/sequence_index.rs:108-141,
        with the reference's broken binary search replaced)."""
        starts = self._seq_starts_host
        seq_idx = np.searchsorted(starts, text_pos, side="right") - 1
        local = text_pos.astype(np.int64) - starts[seq_idx]
        return seq_idx, local

    def _locate_flat(self, queries) -> list[list[tuple[int, int]]]:
        """Unbounded locate: ranges dispatch -> host row expansion -> walk."""
        starts, ends = self.search_ranges_batch(queries)
        starts64 = starts.astype(np.int64)
        ends64 = ends.astype(np.int64)
        counts = np.maximum(ends64 - starts64 + 1, 0)
        offsets = np.zeros(len(queries) + 1, dtype=np.int64)
        np.cumsum(counts, out=offsets[1:])
        total = int(offsets[-1])
        if total == 0:
            return [[] for _ in queries]

        flat_rows = np.zeros(_bucket(total), dtype=np.uint32)
        within = np.arange(total, dtype=np.int64) - np.repeat(offsets[:-1], counts)
        flat_rows[:total] = (np.repeat(starts64, counts) + within).astype(np.uint32)
        text_pos = self._walk_fn(self.device_index, jnp.asarray(flat_rows))
        seq_idx, local = self._localize(np.asarray(text_pos)[:total])
        return [
            list(zip(seq_idx[offsets[i] : offsets[i + 1]].tolist(),
                     local[offsets[i] : offsets[i + 1]].tolist()))
            for i in range(len(queries))
        ]

    def warmup(self, *, batch_sizes=(16,), query_lens=(8,), cap: int = 8) -> None:
        """Pre-compile the count and fused count+locate programs for the
        padded-shape buckets that real batches of the given sizes/lengths
        will land in.  Serving systems call this at startup: each new (B, L)
        bucket otherwise pays a jit compile on first use (tens of seconds on
        TPU).  Dummy batches go through encode_queries itself, so the warmed
        shapes and wire format are exactly the serving ones."""
        alphabet = self.device_index.alphabet
        letter = chr(index_to_ascii_table(alphabet)[alphabet.ambiguity_idx])
        for b in batch_sizes:
            for l in query_lens:
                queries = [letter * max(1, l)] * max(1, b)
                qsyms, qlens = self.encode_queries(queries)
                outs = [
                    self._count_locate_fn(self.device_index, qsyms, qlens, cap=cap),
                    self._count_fn(self.device_index, qsyms, qlens),
                ]
                jax.block_until_ready(outs)

    def count(self, query) -> int:
        """count_string analog."""
        return int(self.count_batch([query])[0])

    def locate(self, query) -> list[tuple[int, int]]:
        """locate_string analog."""
        return self.locate_batch([query])[0]
