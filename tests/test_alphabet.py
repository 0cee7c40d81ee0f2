"""Codec round-trips (mirrors src/alphabet.rs:432-482 tests) plus the
order-consistency property the index build depends on."""

import numpy as np
import pytest

from awry_tpu.alphabet import (
    Alphabet,
    ascii_to_index_table,
    code_to_index_table,
    dense_to_index_table,
    encode_ascii,
    index_to_ascii_table,
    index_to_code_table,
    index_to_dense_table,
    normalize_text,
)

ALPHABETS = [Alphabet.NUCLEOTIDE, Alphabet.AMINO]


@pytest.mark.parametrize("alphabet", ALPHABETS)
def test_round_trip_index_code(alphabet):
    i2c = index_to_code_table(alphabet)
    c2i = code_to_index_table(alphabet)
    for idx in range(alphabet.cardinality):
        assert c2i[i2c[idx]] == idx


@pytest.mark.parametrize("alphabet", ALPHABETS)
def test_round_trip_ascii(alphabet):
    a2i = ascii_to_index_table(alphabet)
    i2a = index_to_ascii_table(alphabet)
    for idx in range(alphabet.cardinality):
        assert a2i[i2a[idx]] == idx
        # lowercase aliases
        assert a2i[i2a[idx] | 0x20] == idx or chr(i2a[idx]) == "$"


def test_nucleotide_pinned_indices():
    # Reference pins (src/alphabet.rs:228-234): T is 5, not 4; N is 4.
    a2i = ascii_to_index_table(Alphabet.NUCLEOTIDE)
    assert a2i[ord("$")] == 0 and a2i[ord("#")] == 0
    assert a2i[ord("A")] == 1 and a2i[ord("a")] == 1
    assert a2i[ord("C")] == 2
    assert a2i[ord("G")] == 3
    assert a2i[ord("N")] == 4 and a2i[ord("Z")] == 4 and a2i[ord("R")] == 4
    assert a2i[ord("T")] == 5 and a2i[ord("U")] == 5 and a2i[ord("u")] == 5


def test_amino_pinned_indices():
    a2i = ascii_to_index_table(Alphabet.AMINO)
    assert a2i[ord("A")] == 1
    assert a2i[ord("W")] == 19
    assert a2i[ord("X")] == 20 and a2i[ord("B")] == 20 and a2i[ord("Z")] == 20
    assert a2i[ord("Y")] == 21


def test_nucleotide_pinned_codes():
    # src/alphabet.rs:310-317
    i2c = index_to_code_table(Alphabet.NUCLEOTIDE)
    assert list(i2c) == [0b100, 0b110, 0b101, 0b011, 0b010, 0b001]


@pytest.mark.parametrize("alphabet", ALPHABETS)
def test_ascii_order_matches_index_order(alphabet):
    """Canonical byte order must equal symbol-index order, otherwise the
    byte-level suffix sort would disagree with prefix-sum order."""
    i2a = index_to_ascii_table(alphabet)
    assert (np.diff(i2a.astype(np.int32)) > 0).all()


@pytest.mark.parametrize("alphabet", ALPHABETS)
def test_normalize_is_canonical_and_sentinel_free(alphabet):
    data = bytes(range(256))
    norm = normalize_text(alphabet, data)
    assert ord("$") not in norm and ord("#") not in norm
    # normalization is idempotent
    assert np.array_equal(normalize_text(alphabet, norm), norm)
    # normalized bytes encode to the same indices as the raw bytes, except
    # sentinel-mapped bytes which become ambiguity
    raw_idx = encode_ascii(alphabet, data)
    norm_idx = encode_ascii(alphabet, norm)
    sentinelish = raw_idx == 0
    assert np.array_equal(norm_idx[~sentinelish], raw_idx[~sentinelish])
    assert (norm_idx[sentinelish] == alphabet.ambiguity_idx).all()


@pytest.mark.parametrize("alphabet", ALPHABETS)
def test_dense_tables(alphabet):
    i2d = index_to_dense_table(alphabet)
    d2i = dense_to_index_table(alphabet)
    assert (i2d >= 0).sum() == alphabet.num_encoding_symbols
    for dense, idx in enumerate(d2i):
        assert i2d[idx] == dense
    assert i2d[0] == -1 and i2d[alphabet.ambiguity_idx] == -1
