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
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import NamedSharding, PartitionSpec as P

from ..alphabet import encode_ascii
from ..index import FmIndexData
from ..ops.device_index import FmDeviceIndex, to_device
from ..ops.locate import lf_walk
from ..ops.rank import window_popcount
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


def sharded_occurrence(local: FmDeviceIndex, pos: jax.Array, sym: jax.Array, block_offset) -> jax.Array:
    """Occ(pos, sym) when this device holds blocks [offset, offset+nb_local):
    owner computes milestone + popcount, everyone psums over the shard axis."""
    nb_local = local.planes.shape[0]
    block_global = (pos >> 8).astype(jnp.int32)
    block_local = block_global - block_offset
    owned = (block_local >= 0) & (block_local < nb_local)
    safe = jnp.clip(block_local, 0, nb_local - 1)
    windows = local.planes[safe]
    rank = local.milestones[safe, sym] + window_popcount(local, windows, pos, sym)
    contrib = jnp.where(owned, rank, jnp.uint32(0))
    return jax.lax.psum(contrib, SHARD_AXIS)


def sharded_symbol_at(local: FmDeviceIndex, pos: jax.Array, block_offset) -> jax.Array:
    """symbol_at with the bit-plane reads psum-merged from the owning shard."""
    nb_local = local.planes.shape[0]
    block_global = (pos >> 8).astype(jnp.int32)
    block_local = block_global - block_offset
    owned = (block_local >= 0) & (block_local < nb_local)
    safe = jnp.clip(block_local, 0, nb_local - 1)
    loc = pos & jnp.uint32(255)
    word = (loc >> 5).astype(jnp.int32)
    bit = (loc & jnp.uint32(31)).astype(jnp.uint32)
    windows = local.planes[safe]
    code = jnp.zeros(pos.shape, dtype=jnp.int32)
    for v in range(local.num_planes):
        lanes = jnp.take_along_axis(windows[..., v, :], word[..., None], axis=-1)[..., 0]
        code = code | (((lanes >> bit) & jnp.uint32(1)).astype(jnp.int32) << v)
    code = jnp.where(owned, code, 0)
    code = jax.lax.psum(code, SHARD_AXIS)
    return local.code_to_index[code]


def _sharded_update_fn(local: FmDeviceIndex, block_offset):
    def update(starts, ends, sym):
        c = local.prefix_sums[sym]
        new_starts = c + sharded_occurrence(local, starts - jnp.uint32(1), sym, block_offset)
        new_ends = c + sharded_occurrence(local, ends, sym, block_offset) - jnp.uint32(1)
        return new_starts, new_ends

    return update


def _sharded_backstep_fn(local: FmDeviceIndex, block_offset):
    def bs(pos):
        sym = sharded_symbol_at(local, pos, block_offset)
        is_sentinel = sym == 0
        safe = jnp.where(is_sentinel, local.alphabet.ambiguity_idx, sym)
        stepped = local.prefix_sums[safe] + sharded_occurrence(local, pos, safe, block_offset) - jnp.uint32(1)
        return jnp.where(is_sentinel, jnp.uint32(0), stepped)

    return bs


class ShardedFmEngine:
    """Multi-device count/locate engine over a ('data','shard') mesh."""

    def __init__(self, index: FmIndexData, mesh=None, *, shard_size: int = 1):
        self.mesh = mesh if mesh is not None else make_mesh(shard_size=shard_size)
        self.num_shards = self.mesh.shape[SHARD_AXIS]
        self.data_size = self.mesh.shape[DATA_AXIS]
        self.alphabet = index.alphabet

        replicated = NamedSharding(self.mesh, P())
        block_sharded = NamedSharding(self.mesh, P(SHARD_AXIS))

        host = index
        if self.num_shards > 1:
            host = dataclasses.replace(
                index,
                planes=_pad_blocks(index.planes, self.num_shards),
                milestones=_pad_blocks(index.milestones.astype(np.uint32), self.num_shards),
            )
        placement = {name: replicated for name in (
            "prefix_sums", "sampled_sa", "kmer_table", "seq_starts",
            "index_to_code", "code_to_index", "index_to_dense",
        )}
        placement["planes"] = block_sharded if self.num_shards > 1 else replicated
        placement["milestones"] = block_sharded if self.num_shards > 1 else replicated
        self.device_index = to_device(host, sharding=placement)
        self.blocks_per_shard = self.device_index.planes.shape[0] // self.num_shards

        index_specs = jax.tree.map(lambda _: P(), self.device_index)
        index_specs = dataclasses.replace(
            index_specs,
            planes=P(SHARD_AXIS) if self.num_shards > 1 else P(),
            milestones=P(SHARD_AXIS) if self.num_shards > 1 else P(),
        )
        self._index_specs = index_specs

        blocks_per_shard = self.blocks_per_shard
        num_shards = self.num_shards

        def count_fn(local_index, qsyms, qlens):
            if num_shards > 1:
                offset = jax.lax.axis_index(SHARD_AXIS) * blocks_per_shard
                update_fn = _sharded_update_fn(local_index, offset)
            else:
                update_fn = None
            starts, ends = search_ranges(local_index, qsyms, qlens, update_fn=update_fn)
            return counts_from_ranges(starts, ends), starts, ends

        def walk_fn(local_index, rows):
            if num_shards > 1:
                offset = jax.lax.axis_index(SHARD_AXIS) * blocks_per_shard
                backstep_fn = _sharded_backstep_fn(local_index, offset)
            else:
                backstep_fn = None
            return lf_walk(local_index, rows, backstep_fn=backstep_fn)

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
                out_specs=(qspec, qspec, qspec),
                check_vma=False,
            )
        )

    # -- host-side encoding (bucketed padding, divisible by data axis) -----
    def _encode(self, queries):
        encoded = []
        for q in queries:
            if isinstance(q, str):
                q = q.encode()
            encoded.append(encode_ascii(self.alphabet, q).astype(np.int32))
        b = max(len(encoded), 1)
        bucket = self.data_size
        while bucket < b:
            bucket *= 2
        L = 8
        maxlen = max((len(e) for e in encoded), default=1)
        while L < maxlen:
            L *= 2
        qsyms = np.zeros((bucket, L), dtype=np.int32)
        qlens = np.zeros((bucket,), dtype=np.int32)
        for i, e in enumerate(encoded):
            qsyms[i, : len(e)] = e
            qlens[i] = len(e)
        return jnp.asarray(qsyms), jnp.asarray(qlens)

    def count_batch(self, queries) -> np.ndarray:
        qsyms, qlens = self._encode(queries)
        counts, _, _ = self._count(self.device_index, qsyms, qlens)
        return np.asarray(counts)[: len(queries)].astype(np.uint64)

    def locate_batch(self, queries) -> list[list[tuple[int, int]]]:
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
        for i in range(len(queries)):
            if counts[i]:
                flat_rows[offsets[i] : offsets[i + 1]] = np.arange(starts[i], ends[i] + 1, dtype=np.uint32)
        _, seq_idx, local = self._walk(self.device_index, jnp.asarray(flat_rows))
        seq_idx = np.asarray(seq_idx)[:total]
        local = np.asarray(local)[:total]
        return [
            list(zip(seq_idx[offsets[i] : offsets[i + 1]].tolist(),
                     local[offsets[i] : offsets[i + 1]].tolist()))
            for i in range(len(queries))
        ]
