"""Multi-device query engines: replicated and range-sharded indexes.

New capability relative to the reference (which is single-process,
shared-memory only; SURVEY.md section 2 parallelism inventory):

* Mode A (`ShardedFmEngine`, shard_size=1): the index is REPLICATED on every
  device; query batches shard over the 'data' mesh axis under shard_map.
  Zero collectives on the hot path - the TPU analog of rayon's
  embarrassingly-parallel query loop, at chip granularity.

* Mode B (shard_size>1): the BWT block arrays (planes + milestones) are
  RANGE-SHARDED over the 'shard' axis - each device owns a contiguous block
  range of a too-big-for-one-HBM index.  A rank query is answered by the
  owning shard and broadcast with a psum (milestones are globally cumulative,
  so the owner's local value IS the global rank); non-owners contribute 0.
  Queries still shard over 'data', so the two axes compose.

Both modes express collectives through jax.lax.psum over the mesh so XLA
lays them onto ICI (SURVEY.md section 5, distributed-backend row).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import NamedSharding, PartitionSpec as P

from ..index import FmIndexData
from ..ops.device_index import FmDeviceIndex, to_device
from ..ops.locate import lf_walk
from ..ops.rank import occurrence_from_rows, symbol_code_from_rows
from ..ops.search import counts_from_ranges, search_ranges
from .mesh import DATA_AXIS, SHARD_AXIS, make_mesh


def _pad_blocks(arr: np.ndarray, num_shards: int) -> np.ndarray:
    """Pad the block axis so it divides evenly across shards.  Padded blocks
    are all-zero and are never owned by any reachable position."""
    nb = arr.shape[0]
    pad = (-nb) % num_shards
    if pad == 0:
        return arr
    return np.concatenate([arr, np.zeros((pad,) + arr.shape[1:], dtype=arr.dtype)], axis=0)


def _local_rows(local: FmDeviceIndex, pos: jax.Array):
    """Fetch fused rows from this device's block shard; returns (rows, owned)."""
    nb_local = local.blocks.shape[0]
    block_local = (pos >> 8).astype(jnp.int32) - jax.lax.axis_index(SHARD_AXIS) * nb_local
    owned = (block_local >= 0) & (block_local < nb_local)
    rows = local.blocks[jnp.clip(block_local, 0, nb_local - 1)]
    return rows, owned


def sharded_occurrence(local: FmDeviceIndex, pos: jax.Array, sym: jax.Array) -> jax.Array:
    """Occ(pos, sym) when this device holds a contiguous block range: the
    owner computes milestone + popcount, everyone psums over the shard axis
    (milestones are globally cumulative, so the owner's value IS the global
    rank)."""
    rows, owned = _local_rows(local, pos)
    rank = occurrence_from_rows(local, rows, pos, sym)
    contrib = jnp.where(owned, rank, jnp.uint32(0))
    return jax.lax.psum(contrib, SHARD_AXIS)


def sharded_symbol_at(local: FmDeviceIndex, pos: jax.Array) -> jax.Array:
    """symbol_at with the bit-plane reads psum-merged from the owning shard."""
    rows, owned = _local_rows(local, pos)
    code = symbol_code_from_rows(local, rows, pos)
    code = jax.lax.psum(jnp.where(owned, code, 0), SHARD_AXIS)
    return local.code_to_index[code]


def _sharded_update_fn(local: FmDeviceIndex):
    def update(starts, ends, sym):
        c = local.prefix_sums[sym]
        new_starts = c + sharded_occurrence(local, starts - jnp.uint32(1), sym)
        new_ends = c + sharded_occurrence(local, ends, sym) - jnp.uint32(1)
        return new_starts, new_ends

    return update


def _sharded_backstep_fn(local: FmDeviceIndex):
    def bs(pos):
        # One fused-row fetch serves both the symbol read and its rank,
        # merged across shards with a single packed psum.
        rows, owned = _local_rows(local, pos)
        code = symbol_code_from_rows(local, rows, pos)
        code = jax.lax.psum(jnp.where(owned, code, 0), SHARD_AXIS)
        sym = local.code_to_index[code]
        is_sentinel = sym == 0
        safe = jnp.where(is_sentinel, local.alphabet.ambiguity_idx, sym)
        rank = occurrence_from_rows(local, rows, pos, safe)
        rank = jax.lax.psum(jnp.where(owned, rank, jnp.uint32(0)), SHARD_AXIS)
        stepped = local.prefix_sums[safe] + rank - jnp.uint32(1)
        return jnp.where(is_sentinel, jnp.uint32(0), stepped)

    return bs


class ShardedFmEngine:
    """Multi-device count/locate engine over a ('data','shard') mesh.

    locate_cap: hits per query returned by the fused single-dispatch
    count+locate path; queries with more hits re-run through the unbounded
    flat path (same contract as ops.engine.FmQueryEngine).
    """

    def __init__(self, index: FmIndexData, mesh=None, *, shard_size: int = 1, locate_cap: int = 8):
        self.mesh = mesh if mesh is not None else make_mesh(shard_size=shard_size)
        self.num_shards = self.mesh.shape[SHARD_AXIS]
        self.data_size = self.mesh.shape[DATA_AXIS]
        self.alphabet = index.alphabet

        replicated = NamedSharding(self.mesh, P())
        block_sharded = NamedSharding(self.mesh, P(SHARD_AXIS))

        host = index
        if self.num_shards > 1:
            replaced = dict(
                planes=_pad_blocks(index.planes, self.num_shards),
                milestones=_pad_blocks(index.milestones, self.num_shards),
            )
            if index.has_marks:
                # Padded blocks carry no marks; their milestone must still be
                # monotone (total marked count) for safe unreachable gathers.
                pad = _pad_blocks(index.mark_milestones[:, None], self.num_shards)[:, 0]
                total = np.uint32(index.text_sampled_sa.shape[0])
                pad[index.mark_milestones.shape[0] :] = total
                replaced.update(
                    mark_bits=_pad_blocks(index.mark_bits, self.num_shards),
                    mark_milestones=pad,
                )
            host = dataclasses.replace(index, **replaced)
        placement = {name: replicated for name in (
            "prefix_sums", "sampled_sa", "text_sampled_sa", "kmer_table", "seq_starts",
            "index_to_code", "code_to_index", "index_to_dense",
        )}
        placement["blocks"] = block_sharded if self.num_shards > 1 else replicated
        self.device_index = to_device(host, sharding=placement)
        self.blocks_per_shard = self.device_index.blocks.shape[0] // self.num_shards

        index_specs = jax.tree.map(lambda _: P(), self.device_index)
        index_specs = dataclasses.replace(
            index_specs,
            blocks=P(SHARD_AXIS) if self.num_shards > 1 else P(),
        )
        self._index_specs = index_specs

        num_shards = self.num_shards

        # Same nibble wire format as the single-device engine.
        self._wire_packed = self.alphabet.cardinality <= 16

        def _unwire(qsyms):
            if self._wire_packed:
                from ..ops.search import unpack_nibbles

                return unpack_nibbles(qsyms)
            return qsyms

        def count_fn(local_index, qsyms, qlens):
            qsyms = _unwire(qsyms)
            update_fn = _sharded_update_fn(local_index) if num_shards > 1 else None
            starts, ends = search_ranges(local_index, qsyms, qlens, update_fn=update_fn)
            return counts_from_ranges(starts, ends), starts, ends

        def walk_fn(local_index, rows):
            backstep_fn = _sharded_backstep_fn(local_index) if num_shards > 1 else None
            return lf_walk(local_index, rows, backstep_fn=backstep_fn)

        cap = locate_cap
        self.locate_cap = cap

        def count_locate_fn(local_index, qsyms, qlens):
            """Fused ranges + counts + capped LF-walk in one sharded dispatch
            (mirrors ops.locate.count_locate_capped with collective ranks)."""
            qsyms = _unwire(qsyms)
            update_fn = _sharded_update_fn(local_index) if num_shards > 1 else None
            backstep_fn = _sharded_backstep_fn(local_index) if num_shards > 1 else None
            starts, ends = search_ranges(local_index, qsyms, qlens, update_fn=update_fn)
            counts = counts_from_ranges(starts, ends)
            b = starts.shape[0]
            offs = jnp.arange(cap, dtype=jnp.uint32)
            rows = starts[:, None] + offs[None, :]
            valid = offs[None, :] < jnp.minimum(counts, jnp.uint32(cap))[:, None]
            flat = jnp.where(valid, rows, jnp.uint32(0)).reshape(-1)
            text_pos = lf_walk(local_index, flat, backstep_fn=backstep_fn)
            return counts, text_pos.reshape(b, cap)

        qspec = P(DATA_AXIS)
        self._count = jax.jit(
            shard_map(
                count_fn,
                mesh=self.mesh,
                in_specs=(index_specs, P(DATA_AXIS, None), qspec),
                out_specs=(qspec, qspec, qspec),
                check_vma=False,
            )
        )
        self._walk = jax.jit(
            shard_map(
                walk_fn,
                mesh=self.mesh,
                in_specs=(index_specs, qspec),
                out_specs=qspec,
                check_vma=False,
            )
        )
        self._count_locate = jax.jit(
            shard_map(
                count_locate_fn,
                mesh=self.mesh,
                in_specs=(index_specs, P(DATA_AXIS, None), qspec),
                out_specs=(qspec, P(DATA_AXIS, None)),
                check_vma=False,
            )
        )
        self._seq_starts_host = index.seq_starts.astype(np.int64)

    # -- host-side encoding (bucketed padding, divisible by data axis) -----
    def _encode(self, queries):
        """Encode a query batch to device arrays.

        Multi-process runs (jax.process_count() > 1, see
        parallel/distributed.py): every process passes the SAME global query
        list; each encodes only its host-major slice with collectively-agreed
        padded shapes and assembles the global data-sharded array.  Results
        returned by count_batch/locate_batch then cover only this process's
        slice (use process_local_queries to know which)."""
        from ..ops.engine import _bucket, encode_query_batch

        pc = jax.process_count()
        if pc == 1:
            qsyms, qlens = encode_query_batch(self.alphabet, queries, min_batch=self.data_size)
            if self._wire_packed:
                qsyms = (qsyms[:, 0::2] | (qsyms[:, 1::2] << 4)).astype(np.uint8)
            return jnp.asarray(qsyms), jnp.asarray(qlens)

        from .distributed import global_query_batch, process_local_queries

        local = process_local_queries(queries, self.mesh)
        per = -(-len(queries) // pc)
        local = local + [b""] * (per - len(local))
        # Padded shapes must agree across processes: derive them from the
        # (identical) global list, not the local slice.
        qbytes_len = [len(q.encode() if isinstance(q, str) else q) for q in queries]
        global_l = _bucket(max(qbytes_len, default=1), minimum=8)
        local_b = _bucket(per, minimum=max(1, self.data_size // pc))
        qsyms, qlens = encode_query_batch(
            self.alphabet, local, min_batch=local_b, min_len=global_l
        )
        qsyms = qsyms[:local_b]
        qlens = qlens[:local_b]
        if self._wire_packed:
            qsyms = (qsyms[:, 0::2] | (qsyms[:, 1::2] << 4)).astype(np.uint8)
        return global_query_batch(qsyms, qlens, self.mesh)

    @staticmethod
    def _host_values(arr) -> np.ndarray:
        """Rows of a (possibly multi-process) data-sharded array that live on
        THIS process, in global row order.  Replicas along the shard axis
        produce duplicate addressable shards - keep one per row range."""
        if jax.process_count() == 1:
            return np.asarray(arr)
        seen: dict[int, np.ndarray] = {}
        for s in arr.addressable_shards:
            start = s.index[0].start or 0
            if start not in seen:
                seen[start] = np.asarray(s.data)
        return np.concatenate([seen[k] for k in sorted(seen)], axis=0)

    def count_batch(self, queries) -> np.ndarray:
        """Counts per query.  Single-process: for the whole list.  Multi-
        process: every process passes the same global list and receives the
        counts for ITS slice (process_local_queries order)."""
        qsyms, qlens = self._encode(queries)
        counts, _, _ = self._count(self.device_index, qsyms, qlens)
        if jax.process_count() > 1:
            from .distributed import process_local_queries

            n_local = len(process_local_queries(queries, self.mesh))
            return self._host_values(counts)[:n_local].astype(np.uint64)
        return np.asarray(counts)[: len(queries)].astype(np.uint64)

    def locate_batch(self, queries) -> list[list[tuple[int, int]]]:
        """Fused single-dispatch count+locate up to locate_cap hits/query;
        overflow queries re-run through the unbounded flat path."""
        qsyms, qlens = self._encode(queries)
        counts, text_pos = self._count_locate(self.device_index, qsyms, qlens)
        counts = np.asarray(counts)[: len(queries)].astype(np.int64)
        text_pos = np.asarray(text_pos)
        seq_idx = np.searchsorted(self._seq_starts_host, text_pos, side="right") - 1
        local = text_pos.astype(np.int64) - self._seq_starts_host[seq_idx]
        cap = self.locate_cap
        overflow = [i for i in range(len(queries)) if counts[i] > cap]
        overflow_results = (
            dict(zip(overflow, self._locate_flat([queries[i] for i in overflow])))
            if overflow
            else {}
        )
        results: list[list[tuple[int, int]]] = []
        for i in range(len(queries)):
            if counts[i] > cap:
                results.append(overflow_results[i])
            else:
                c = int(counts[i])
                results.append(list(zip(seq_idx[i, :c].tolist(), local[i, :c].tolist())))
        return results

    def _locate_flat(self, queries) -> list[list[tuple[int, int]]]:
        qsyms, qlens = self._encode(queries)
        _, starts, ends = self._count(self.device_index, qsyms, qlens)
        starts = np.asarray(starts)[: len(queries)].astype(np.int64)
        ends = np.asarray(ends)[: len(queries)].astype(np.int64)
        counts = np.maximum(ends - starts + 1, 0)
        offsets = np.zeros(len(queries) + 1, dtype=np.int64)
        np.cumsum(counts, out=offsets[1:])
        total = int(offsets[-1])
        if total == 0:
            return [[] for _ in queries]
        bucket = self.data_size
        while bucket < total:
            bucket *= 2
        flat_rows = np.zeros(bucket, dtype=np.uint32)
        within = np.arange(total, dtype=np.int64) - np.repeat(offsets[:-1], counts)
        flat_rows[:total] = (np.repeat(starts, counts) + within).astype(np.uint32)
        text_pos = np.asarray(self._walk(self.device_index, jnp.asarray(flat_rows)))[:total]
        seq_idx = np.searchsorted(self._seq_starts_host, text_pos, side="right") - 1
        local = text_pos.astype(np.int64) - self._seq_starts_host[seq_idx]
        return [
            list(zip(seq_idx[offsets[i] : offsets[i + 1]].tolist(),
                     local[offsets[i] : offsets[i + 1]].tolist()))
            for i in range(len(queries))
        ]
