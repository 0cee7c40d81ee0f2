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


def test_builder_device_flag(rng):
    records = [("s", random_seq(Alphabet.NUCLEOTIDE, rng, 500))]
    a = build_from_records(records, FmBuildArgs(lookup_table_kmer_len=4))
    b = build_from_records(
        records, FmBuildArgs(lookup_table_kmer_len=4, build_kmer_table_on_device=True)
    )
    np.testing.assert_array_equal(a.kmer_table, b.kmer_table)
