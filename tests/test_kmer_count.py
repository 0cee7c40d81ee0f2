"""Counting-based k-mer table construction vs the BFS range-update oracle.

The counting builder (build/kmer_count.py) must be bit-identical to
host_engine.populate_kmer_table — which is itself pinned against the
reference's recursive construction semantics (kmer_lookup_table.rs:121-167)
by tests/test_kmer_table.py — across alphabets, multi-record texts (delimiter
= ambiguity symbol), explicit ambiguity runs, and texts shorter than k.
"""

import numpy as np
import pytest

from awry_tpu import Alphabet, FmBuildArgs
from awry_tpu.build.builder import build_from_records
from awry_tpu.build.kmer_count import populate_kmer_table_counting
from awry_tpu.host_engine import populate_kmer_table

pytestmark = pytest.mark.smoke


def _random_records(rng, alphabet, n_records, lo, hi, with_ambiguity):
    letters = b"ACGT" if alphabet is Alphabet.NUCLEOTIDE else b"ACDEFGHIKLMNPQRSTVWY"
    if with_ambiguity:
        letters += alphabet.delimiter  # N / X inside records too
    pool = np.frombuffer(letters, dtype=np.uint8)
    return [
        (f"r{i}", bytes(rng.choice(pool, size=rng.integers(lo, hi + 1))))
        for i in range(n_records)
    ]


@pytest.mark.parametrize("alphabet,k", [
    (Alphabet.NUCLEOTIDE, 1),
    (Alphabet.NUCLEOTIDE, 2),
    (Alphabet.NUCLEOTIDE, 5),
    (Alphabet.AMINO, 1),
    (Alphabet.AMINO, 3),
])
@pytest.mark.parametrize("n_records,with_ambiguity", [(1, False), (3, False), (4, True)])
def test_counting_matches_bfs_oracle(alphabet, k, n_records, with_ambiguity):
    rng = np.random.default_rng([alphabet.value, k, n_records, int(with_ambiguity)])
    records = _random_records(rng, alphabet, n_records, 40, 300, with_ambiguity)
    index = build_from_records(
        records,
        FmBuildArgs(
            alphabet=alphabet,
            lookup_table_kmer_len=k,
            suffix_array_compression_ratio=4,
        ),
    )
    oracle = populate_kmer_table(index)
    from awry_tpu.alphabet import encode_ascii
    from awry_tpu.io.sequence_io import concat_records

    text_syms = encode_ascii(alphabet, concat_records(records, alphabet).text)
    got = populate_kmer_table_counting(text_syms, alphabet, k)
    np.testing.assert_array_equal(got, oracle)


def test_text_shorter_than_k():
    """Every suffix is shorter than k: all buckets empty, all rows invalid."""
    records = [("r", b"ACG")]
    index = build_from_records(
        records,
        FmBuildArgs(alphabet=Alphabet.NUCLEOTIDE, lookup_table_kmer_len=5),
    )
    oracle = populate_kmer_table(index)
    from awry_tpu.alphabet import encode_ascii
    from awry_tpu.io.sequence_io import concat_records

    text_syms = encode_ascii(Alphabet.NUCLEOTIDE, concat_records(records, Alphabet.NUCLEOTIDE).text)
    got = populate_kmer_table_counting(text_syms, Alphabet.NUCLEOTIDE, 5)
    np.testing.assert_array_equal(got, oracle)


def test_ambiguity_run_spanning_windows():
    """A long N run: many invalid windows whose first-bad digit varies."""
    seq = b"ACGTACGTAC" + b"N" * 17 + b"GTACGTACGT" + b"N" + b"TTTTACGT"
    records = [("r", seq)]
    index = build_from_records(
        records,
        FmBuildArgs(alphabet=Alphabet.NUCLEOTIDE, lookup_table_kmer_len=4),
    )
    oracle = populate_kmer_table(index)
    from awry_tpu.alphabet import encode_ascii
    from awry_tpu.io.sequence_io import concat_records

    text_syms = encode_ascii(Alphabet.NUCLEOTIDE, concat_records(records, Alphabet.NUCLEOTIDE).text)
    got = populate_kmer_table_counting(text_syms, Alphabet.NUCLEOTIDE, 4)
    np.testing.assert_array_equal(got, oracle)


def test_k_zero_placeholder():
    got = populate_kmer_table_counting(np.zeros(0, dtype=np.uint8), Alphabet.NUCLEOTIDE, 0)
    np.testing.assert_array_equal(got, np.array([[1, 0]], dtype=np.uint64))
