"""Device-built k-mer table must equal the host-built table bit-for-bit."""

import numpy as np
import pytest

from awry_tpu import Alphabet, FmBuildArgs, build_from_records
from awry_tpu.host_engine import populate_kmer_table
from awry_tpu.ops import to_device
from awry_tpu.ops.kmer import populate_kmer_table_device

from .conftest import random_seq


@pytest.mark.parametrize("alphabet,k", [
    (Alphabet.NUCLEOTIDE, 1),
    (Alphabet.NUCLEOTIDE, 3),
    (Alphabet.NUCLEOTIDE, 5),
    (Alphabet.AMINO, 2),
])
def test_device_table_matches_host(alphabet, k, rng):
    records = [("s", random_seq(alphabet, rng, 800))]
    index = build_from_records(records, FmBuildArgs(alphabet=alphabet, lookup_table_kmer_len=k))
    host_table = populate_kmer_table(index)
    device_table = populate_kmer_table_device(to_device(index))
    np.testing.assert_array_equal(device_table, host_table)
    # The minimal device index (what the builder ships: rank machinery only,
    # no locate/verify tables) must build the identical table.  It carries
    # kmer_len=0, so the build k is passed explicitly — and omitting it must
    # raise rather than silently return the disabled-table placeholder.
    minimal = to_device(index, minimal=True)
    minimal_table = populate_kmer_table_device(minimal, k)
    np.testing.assert_array_equal(minimal_table, host_table)
    with pytest.raises(ValueError, match="kmer_len"):
        populate_kmer_table_device(minimal)


def test_builder_device_flag(rng):
    records = [("s", random_seq(Alphabet.NUCLEOTIDE, rng, 500))]
    a = build_from_records(records, FmBuildArgs(lookup_table_kmer_len=4))
    b = build_from_records(
        records, FmBuildArgs(lookup_table_kmer_len=4, build_kmer_table_on_device=True)
    )
    np.testing.assert_array_equal(a.kmer_table, b.kmer_table)


def test_level_chunk_divides_every_level():
    """The fixed-shape chunk must divide every chunked level size base**l
    (dynamic_update_slice clamps, so a non-dividing chunk writes at a wrong
    offset).  The halving-from-total scheme broke for base 20 at k >= 6."""
    from awry_tpu.ops.kmer import _LEVEL_CHUNK, _level_chunk

    for base in (4, 20):
        for k in range(1, 14):
            total = base**k
            chunk = _level_chunk(base, total)
            assert 0 < chunk <= min(total, _LEVEL_CHUNK)
            size = base
            for _level in range(1, k):
                size *= base
                assert size <= chunk or size % chunk == 0, (base, k, size, chunk)


def test_device_table_chunked_level_path(rng, monkeypatch):
    """Exercise the multi-chunk level path at test scale by shrinking the
    chunk cap (covers the regime where amino k >= 6 crashed the build)."""
    import awry_tpu.ops.kmer as kmer_mod

    monkeypatch.setattr(kmer_mod, "_LEVEL_CHUNK", 50)
    for alphabet, k in [(Alphabet.NUCLEOTIDE, 4), (Alphabet.AMINO, 2)]:
        records = [("s", random_seq(alphabet, rng, 600))]
        index = build_from_records(
            records, FmBuildArgs(alphabet=alphabet, lookup_table_kmer_len=k)
        )
        host_table = populate_kmer_table(index)
        device_table = populate_kmer_table_device(to_device(index))
        np.testing.assert_array_equal(device_table, host_table)
