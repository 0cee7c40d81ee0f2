"""PartitionedFmIndex must be indistinguishable from a monolithic index,
including matches that span record delimiters and partition boundaries."""

import numpy as np
import pytest

import awry_tpu.host_engine as he
from awry_tpu import Alphabet, FmBuildArgs, build_from_records
from awry_tpu.parallel.partitioned import PartitionedFmIndex

from .conftest import random_seq


def _records(rng, n=10, lo=20, hi=120):
    return [
        (f"r{i}", random_seq(Alphabet.NUCLEOTIDE, rng, int(rng.integers(lo, hi))))
        for i in range(n)
    ]


@pytest.mark.parametrize("max_partition_symbols", [150, 300, 10_000])
def test_partitioned_matches_monolithic(max_partition_symbols, rng):
    records = _records(rng)
    args = FmBuildArgs(lookup_table_kmer_len=2)
    mono = build_from_records(records, args)
    part = PartitionedFmIndex.build_from_records(
        records, args, max_partition_symbols=max_partition_symbols, max_query_len=24
    )
    if max_partition_symbols < 10_000:
        assert len(part.partitions) > 1

    text = b"N".join(seq for _, seq in records)
    queries = []
    # substrings, including ones straddling record delimiters (and therefore
    # potentially partition boundaries)
    for _ in range(60):
        ln = int(rng.integers(1, 24))
        s = int(rng.integers(0, len(text) - ln))
        queries.append(text[s : s + ln])
    # every delimiter crossing explicitly
    for i in range(len(records) - 1):
        d = int(part.seq_starts[i + 1]) - 1  # delimiter position
        queries.append(text[max(0, d - 8) : d + 9])
    queries += [b"N", b"ACGT", b""]

    np.testing.assert_array_equal(
        part.count_batch(queries).astype(np.int64),
        np.array([he.count(mono, q) for q in queries]),
    )
    part_locs = part.locate_batch(queries)
    for q, got in zip(queries, part_locs):
        assert sorted(got) == sorted(he.locate(mono, q)), q


def test_partitioned_rejects_overlong_queries(rng):
    records = _records(rng, n=3)
    part = PartitionedFmIndex.build_from_records(
        records, FmBuildArgs(lookup_table_kmer_len=2),
        max_partition_symbols=100, max_query_len=10,
    )
    with pytest.raises(ValueError, match="max_query_len"):
        part.count_batch([b"A" * 11])


def test_partitioned_single_partition_degenerate(rng):
    records = _records(rng, n=2, lo=10, hi=20)
    part = PartitionedFmIndex.build_from_records(
        records, FmBuildArgs(lookup_table_kmer_len=2),
        max_partition_symbols=10_000, max_query_len=8,
    )
    assert len(part.partitions) == 1 and part.partitions[0].tail_syms is None
    mono = build_from_records(records, FmBuildArgs(lookup_table_kmer_len=2))
    for q in [records[0][1][:5], b"NN", b"ACG"]:
        assert part.count(q) == he.count(mono, q)


def test_partitioned_device_engines(rng):
    """use_device=True routes per-partition queries through FmQueryEngine."""
    records = _records(rng, n=6, lo=30, hi=80)
    args = FmBuildArgs(lookup_table_kmer_len=2)
    mono = build_from_records(records, args)
    part = PartitionedFmIndex.build_from_records(
        records, args, max_partition_symbols=150, max_query_len=16
    )
    text = b"N".join(s for _, s in records)
    queries = [text[s : s + 12] for s in rng.integers(0, len(text) - 12, size=20)]
    np.testing.assert_array_equal(
        part.count_batch(queries, use_device=True).astype(np.int64),
        np.array([he.count(mono, q) for q in queries]),
    )
    for q, got in zip(queries, part.locate_batch(queries, use_device=True)):
        assert sorted(got) == sorted(he.locate(mono, q)), q
    assert all(p.engine for p in part.partitions)  # engines actually built


def test_partitioned_build_hygiene(rng, tmp_path):
    """Empty input raises; a shared SA-cache path is NOT reused across
    equal-length partitions; tails skip the k-mer machinery."""
    with pytest.raises(ValueError, match="no sequence records"):
        PartitionedFmIndex.build_from_records(
            [], FmBuildArgs(), max_partition_symbols=100, max_query_len=4
        )
    records = [("a", b"ACGT" * 25), ("b", b"TTGA" * 25)]  # equal lengths
    sa_path = str(tmp_path / "sa.npy")
    args = FmBuildArgs(lookup_table_kmer_len=2, suffix_array_output_src=sa_path)
    part = PartitionedFmIndex.build_from_records(
        records, args, max_partition_symbols=100, max_query_len=12
    )
    assert len(part.partitions) == 2
    for p in part.partitions:
        if p.tail_syms is not None:
            assert p.tail_syms.shape[0] <= 11  # tail = max_query_len - 1 symbols
    mono = build_from_records(records, FmBuildArgs(lookup_table_kmer_len=2))
    text = b"N".join(s for _, s in records)
    for q in [text[95:105], b"ACGT", b"TTGA"]:
        assert part.count(q) == he.count(mono, q), q


def test_partitions_spread_across_devices(rng):
    """Partition engines round-robin over local devices so dispatches run
    concurrently (round-1 verdict item 5)."""
    import jax

    records = _records(rng, n=8, lo=40, hi=60)
    part = PartitionedFmIndex.build_from_records(
        records, FmBuildArgs(lookup_table_kmer_len=2),
        max_partition_symbols=80, max_query_len=8,
    )
    assert len(part.partitions) >= 4
    part.count_batch([b"ACGT"], use_device=True)
    devs = {p.engine.device_index.blocks.device for p in part.partitions if p.engine}
    assert len(devs) == min(len(part.partitions), len(jax.devices()))


def test_partitioned_parallel_build_matches_serial(rng):
    """num_workers>1 (forked partition builds) produces the same federation
    as the serial path."""
    records = _records(rng, n=6, lo=40, hi=90)
    args = FmBuildArgs(lookup_table_kmer_len=2)
    serial = PartitionedFmIndex.build_from_records(
        records, args, max_partition_symbols=150, max_query_len=10
    )
    parallel = PartitionedFmIndex.build_from_records(
        records, args, max_partition_symbols=150, max_query_len=10, num_workers=3
    )
    assert len(parallel.partitions) == len(serial.partitions)
    for ps, pp in zip(serial.partitions, parallel.partitions):
        np.testing.assert_array_equal(ps.index.sampled_sa, pp.index.sampled_sa)
        np.testing.assert_array_equal(ps.index.planes, pp.index.planes)
        assert ps.global_start == pp.global_start and ps.owned_len == pp.owned_len
    text = b"N".join(s for _, s in records)
    queries = [text[s : s + 8] for s in rng.integers(0, len(text) - 8, size=12)]
    np.testing.assert_array_equal(
        serial.count_batch(queries, use_device=False),
        parallel.count_batch(queries, use_device=False),
    )


def test_partitioned_save_load_round_trip(rng, tmp_path):
    """Federation checkpoint: save -> load must serve identical results."""
    from awry_tpu.parallel.partitioned import PartitionedFmIndex

    records = [(f"r{i}", random_seq(Alphabet.NUCLEOTIDE, rng, int(rng.integers(150, 400))))
               for i in range(6)]
    args = FmBuildArgs(alphabet=Alphabet.NUCLEOTIDE, lookup_table_kmer_len=3)
    pfm = PartitionedFmIndex.build_from_records(
        records, args, max_partition_symbols=500, max_query_len=24
    )
    d = str(tmp_path / "pangenome_idx")
    pfm.save(d)
    loaded = PartitionedFmIndex.load(d)
    assert len(loaded.partitions) == len(pfm.partitions)
    queries = [records[i % 6][1][j : j + 12] for i, j in enumerate(range(0, 60, 5))]
    np.testing.assert_array_equal(loaded.count_batch(queries), pfm.count_batch(queries))
    a = loaded.locate_batch(queries)
    b = pfm.locate_batch(queries)
    assert [sorted(x) for x in a] == [sorted(y) for y in b]


def test_partitioned_count_locate_arrays(rng):
    """Vectorized federation bulk serving equals the per-query API and the
    monolithic host engine."""
    from awry_tpu import build_from_records
    from awry_tpu import host_engine as he
    from awry_tpu.parallel.partitioned import PartitionedFmIndex

    records = [(f"r{i}", random_seq(Alphabet.NUCLEOTIDE, rng, int(rng.integers(100, 500))))
               for i in range(8)]
    args = FmBuildArgs(alphabet=Alphabet.NUCLEOTIDE, lookup_table_kmer_len=3)
    pfm = PartitionedFmIndex.build_from_records(
        records, args, max_partition_symbols=600, max_query_len=20
    )
    mono = build_from_records(records, args)
    queries = [records[i % 8][1][j : j + 9] for i, j in enumerate(range(0, 80, 4))]
    queries += [b"ACG", b"", b"GGGGGGGGGGGGGGGGGGG"]
    counts, rec, loc, offsets = pfm.count_locate_arrays(queries, cap=2)
    for i, q in enumerate(queries):
        assert int(counts[i]) == he.count(mono, q), q
        got = sorted(zip(rec[offsets[i]:offsets[i+1]].tolist(), loc[offsets[i]:offsets[i+1]].tolist()))
        assert got == sorted(he.locate(mono, q)), q


def test_consume_input_builds_identically(rng):
    """consume_input=True clears the caller's record list but must not
    change the built federation (round-4 OOM fix regression)."""
    recs = [(f"r{i}", bytes(rng.choice(np.frombuffer(b"ACGT", dtype=np.uint8), size=400)))
            for i in range(3)]
    import copy
    args = FmBuildArgs(alphabet=Alphabet.NUCLEOTIDE, lookup_table_kmer_len=2,
                       locate_mark_ratio=2)
    a = PartitionedFmIndex.build_from_records(
        copy.deepcopy(recs), args, max_partition_symbols=600, max_query_len=8)
    consumed = copy.deepcopy(recs)
    b = PartitionedFmIndex.build_from_records(
        consumed, args, max_partition_symbols=600, max_query_len=8,
        consume_input=True)
    assert consumed == []
    assert len(a.partitions) == len(b.partitions)
    np.testing.assert_array_equal(a.seq_starts, b.seq_starts)
    queries = [recs[i][1][o:o+6] for i in range(3) for o in (0, 100, 394)]
    ca = a.count_batch(queries)
    cb = b.count_batch(queries)
    np.testing.assert_array_equal(ca, cb)
    assert (np.asarray(ca) >= 1).all()
