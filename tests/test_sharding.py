"""Multi-device engines on the 8-virtual-CPU-device mesh: replicated (Mode A)
and range-sharded (Mode B) must match the host engine exactly."""

import jax
import numpy as np
import pytest

import awry_tpu.host_engine as he
from awry_tpu import Alphabet, FmBuildArgs, build_from_records
from awry_tpu.parallel import ShardedFmEngine, make_mesh

from .conftest import random_seq
from .oracle import kmer_position_map, localize


def _build(alphabet, rng, n=900, kmer_len=3, num_records=1, sa_ratio=None):
    records = []
    for i in range(num_records):
        ln = n if num_records == 1 else int(rng.integers(20, n))
        records.append((f"seq_{i}", random_seq(alphabet, rng, ln)))
    args = FmBuildArgs(
        alphabet=alphabet,
        lookup_table_kmer_len=kmer_len,
        suffix_array_compression_ratio=sa_ratio,
    )
    return build_from_records(records, args), records


def test_eight_devices_available():
    assert len(jax.devices()) == 8, "conftest must provide 8 virtual devices"


@pytest.mark.parametrize("shard_size", [1, 2, 4, 8])
def test_sharded_count_matches_host(shard_size, rng):
    index, records = _build(Alphabet.NUCLEOTIDE, rng, n=1100)
    engine = ShardedFmEngine(index, shard_size=shard_size)
    text = records[0][1]
    kmap = kmer_position_map(text, 10)
    queries = list(kmap.keys())[:64]
    queries += [b"GGGGGGGGGGGG", b"A", b""]
    got = engine.count_batch(queries)
    expected = np.array([he.count(index, q) for q in queries])
    np.testing.assert_array_equal(got.astype(np.int64), expected)


@pytest.mark.parametrize("shard_size", [1, 4])
def test_sharded_locate_matches_host(shard_size, rng):
    index, records = _build(Alphabet.NUCLEOTIDE, rng, n=700, sa_ratio=8)
    engine = ShardedFmEngine(index, shard_size=shard_size)
    text = records[0][1]
    kmap = kmer_position_map(text, 7)
    queries = list(kmap.keys())[:48]
    locs = engine.locate_batch(queries)
    for q, got in zip(queries, locs):
        assert sorted(got) == sorted(localize(kmap[q], index.seq_starts)), q


def test_sharded_amino(rng):
    index, records = _build(Alphabet.AMINO, rng, n=300, kmer_len=2)
    engine = ShardedFmEngine(index, shard_size=2)
    text = records[0][1]
    kmap = kmer_position_map(text, 4)
    queries = list(kmap.keys())[:32]
    got = engine.count_batch(queries)
    expected = np.array([len(kmap[q]) for q in queries])
    np.testing.assert_array_equal(got.astype(np.int64), expected)


def test_explicit_mesh_shapes(rng):
    index, _ = _build(Alphabet.NUCLEOTIDE, rng, n=600)
    mesh = make_mesh(num_devices=4, shard_size=2)
    assert mesh.shape == {"data": 2, "shard": 2}
    engine = ShardedFmEngine(index, mesh=mesh)
    assert engine.num_shards == 2 and engine.data_size == 2
    assert int(engine.count_batch([b"ACG"])[0]) == he.count(index, b"ACG")


def test_range_sharding_actually_shards(rng):
    """The planes arrays must be placed block-sharded, not replicated."""
    index, _ = _build(Alphabet.NUCLEOTIDE, rng, n=3000)
    engine = ShardedFmEngine(index, shard_size=8)
    sharding = engine.device_index.blocks.sharding
    assert sharding.spec[0] == "shard"
    # Each device holds only its slice of the padded block axis.
    nb = engine.device_index.blocks.shape[0]
    shard_shapes = {s.data.shape for s in engine.device_index.blocks.addressable_shards}
    assert shard_shapes == {(nb // 8,) + engine.device_index.blocks.shape[1:]}


def test_sharded_locate_cap_overflow(rng):
    """Queries whose hit counts exceed locate_cap must fall back to the
    unbounded path and still match the host engine."""
    index, records = _build(Alphabet.NUCLEOTIDE, rng, n=800, kmer_len=2)
    engine = ShardedFmEngine(index, shard_size=2, locate_cap=2)
    queries = [b"A", b"AC", records[0][1][3:9], b""]
    got = engine.locate_batch(queries)
    for q, hits in zip(queries, got):
        assert sorted(hits) == sorted(he.locate(index, q)), q
