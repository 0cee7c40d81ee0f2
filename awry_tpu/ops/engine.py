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

from ..alphabet import encode_ascii
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


class FmQueryEngine:
    """Batch count/locate engine over a device-resident FM-index."""

    def __init__(self, index: FmIndexData | FmDeviceIndex, *, use_pallas: bool = False):
        if isinstance(index, FmIndexData):
            self.device_index = to_device(index)
        else:
            self.device_index = index
        if use_pallas:
            from .rank_pallas import pallas_count_batch_kernel

            self._count_fn = jax.jit(pallas_count_batch_kernel)
        else:
            self._count_fn = jax.jit(count_batch_kernel)
        self._ranges_fn = jax.jit(search_ranges)
        self._walk_fn = jax.jit(lf_walk)

    # -- host-side encoding ------------------------------------------------
    def encode_queries(self, queries) -> tuple[jax.Array, jax.Array]:
        """Encode + pad a list of str/bytes queries to [B, L] symbols and
        [B] lengths (padded shapes are bucketed)."""
        alphabet = self.device_index.alphabet
        encoded = []
        for q in queries:
            if isinstance(q, str):
                q = q.encode()
            encoded.append(encode_ascii(alphabet, q).astype(np.int32))
        B = _bucket(max(1, len(encoded)))
        L = _bucket(max((len(e) for e in encoded), default=1), minimum=8)
        qsyms = np.zeros((B, L), dtype=np.int32)
        qlens = np.zeros((B,), dtype=np.int32)
        for i, e in enumerate(encoded):
            qsyms[i, : len(e)] = e
            qlens[i] = len(e)
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

    def locate_batch(self, queries) -> list[list[tuple[int, int]]]:
        """parallel_locate analog: (sequence_idx, local_position) pairs per
        query, in BWT-row order (reference order, src/fm_index.rs:521)."""
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
        for i in range(len(queries)):
            if counts[i]:
                flat_rows[offsets[i] : offsets[i + 1]] = np.arange(
                    starts64[i], ends64[i] + 1, dtype=np.uint32
                )
        _, seq_idx, local = self._walk_fn(self.device_index, jnp.asarray(flat_rows))
        seq_idx = np.asarray(seq_idx)[:total]
        local = np.asarray(local)[:total]
        return [
            list(zip(seq_idx[offsets[i] : offsets[i + 1]].tolist(),
                     local[offsets[i] : offsets[i + 1]].tolist()))
            for i in range(len(queries))
        ]

    def count(self, query) -> int:
        """count_string analog."""
        return int(self.count_batch([query])[0])

    def locate(self, query) -> list[tuple[int, int]]:
        """locate_string analog."""
        return self.locate_batch([query])[0]
