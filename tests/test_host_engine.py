"""Host (NumPy) engine vs brute-force oracle: the randomized end-to-end
parity harness (mirrors src/fm_index.rs:596-1088)."""

import numpy as np
import pytest

import awry_tpu.host_engine as he
from awry_tpu import Alphabet, FmBuildArgs, build_from_records
from awry_tpu.alphabet import encode_ascii, index_to_code_table

from .conftest import random_seq
from .oracle import kmer_position_map, localize

ALPHABETS = [Alphabet.NUCLEOTIDE, Alphabet.AMINO]


def _build(alphabet, rng, *, n=1847, num_records=1, sa_ratio=None, kmer_len=3):
    records = []
    for i in range(num_records):
        ln = n if num_records == 1 else int(rng.integers(10, n))
        records.append((f"seq_{i}", random_seq(alphabet, rng, ln)))
    args = FmBuildArgs(
        alphabet=alphabet,
        suffix_array_compression_ratio=sa_ratio,
        lookup_table_kmer_len=kmer_len,
    )
    return build_from_records(records, args), records


@pytest.mark.parametrize("alphabet", ALPHABETS)
def test_occurrence_against_scalar_model(alphabet, rng):
    """Rank-kernel unit test: all 256 positions x all non-sentinel symbols of
    random blocks vs a cumulative counting model (mirrors the mock-block
    tests at src/bwt.rs:368-505)."""
    index, _ = _build(alphabet, rng, n=1000)
    # Scalar model over the actual BWT symbols.
    bwt = he.symbol_at(index, np.arange(index.bwt_len))
    for sym in range(1, alphabet.cardinality):
        expected = np.cumsum(bwt == sym)
        got = he.occurrence(index, np.arange(index.bwt_len), np.full(index.bwt_len, sym))
        np.testing.assert_array_equal(got.astype(np.int64), expected)


@pytest.mark.parametrize("alphabet", ALPHABETS)
def test_bwt_reconstructs_text(alphabet, rng):
    """LF-walking the whole BWT from row 0 must spell the reversed text:
    validates SA, BWT packing, prefix sums, and backstep together."""
    index, records = _build(alphabet, rng, n=500)
    text = records[0][1]
    row = 0  # row 0 is the sentinel-suffix row
    out = []
    for _ in range(index.bwt_len - 1):
        sym = int(he.symbol_at(index, np.array([row]))[0])
        out.append(sym)
        row = int(he.backstep(index, np.array([row]))[0])
    expected = encode_ascii(index.alphabet, text)[::-1]
    np.testing.assert_array_equal(np.array(out[:-1]), expected[:-1])


@pytest.mark.parametrize("alphabet,n,k", [
    (Alphabet.NUCLEOTIDE, 1847, 24),
    (Alphabet.NUCLEOTIDE, 1847, 2),
    (Alphabet.AMINO, 300, 8),
])
def test_count_locate_vs_oracle(alphabet, n, k, rng):
    """The ground-truth parity harness (src/fm_index.rs:612-664): every k-mer
    of the text must count and locate exactly."""
    index, records = _build(alphabet, rng, n=n)
    text = records[0][1]
    kmap = kmer_position_map(text, k)
    starts = index.seq_starts
    for kmer, positions in kmap.items():
        assert he.count(index, kmer) == len(positions), kmer
        got = sorted(he.locate(index, kmer))
        assert got == sorted(localize(positions, starts)), kmer


@pytest.mark.parametrize("sa_ratio", [1, 2, 3, 8, 16])
def test_locate_across_sa_ratios(sa_ratio, rng):
    index, records = _build(Alphabet.NUCLEOTIDE, rng, n=600, sa_ratio=sa_ratio)
    text = records[0][1]
    kmap = kmer_position_map(text, 6)
    for kmer, positions in list(kmap.items())[:100]:
        got = sorted(p for _, p in he.locate(index, kmer))
        assert got == sorted(positions)


def test_multi_record_count_and_locate(rng):
    """Multi-record FASTA: every suffix of every record must be found
    (mirrors multi_sequence_fasta_test, src/fm_index.rs:994-1032), and we
    additionally check locate correctness (the reference could not: its
    sequence-index binary search diverges, SURVEY.md 2.3 quirk #4)."""
    index, records = _build(Alphabet.NUCLEOTIDE, rng, n=50, num_records=8)
    # Rebuild the concatenated text for oracle checks.
    text = b"N".join(seq for _, seq in records)
    for si, (_, seq) in enumerate(records):
        for start in range(len(seq)):
            q = seq[start:]
            assert he.count(index, q) >= 1
    kmap = kmer_position_map(text, 5)
    for kmer, positions in kmap.items():
        assert he.count(index, kmer) == len(positions)
        got = sorted(he.locate(index, kmer))
        assert got == sorted(localize(positions, index.seq_starts))


def test_queries_absent_and_edge_cases(rng):
    index, records = _build(Alphabet.NUCLEOTIDE, rng, n=300)
    text = records[0][1]
    # Absent pattern
    q = b"A" * 40
    expected = 0 if q in text else 0
    if q not in text:
        assert he.count(index, q) == 0
        assert he.locate(index, q) == []
    # Query longer than text
    assert he.count(index, text + b"ACGT") == 0
    # Whole text
    assert he.count(index, text) == 1
    (_, pos), = [(0, p) for _, p in he.locate(index, text)]
    assert pos == 0
    # Empty query: graceful zero (reference panics; documented divergence)
    assert he.count(index, b"") == 0
    # Ambiguity characters are searchable (N occurs as record delimiters)
    index2, recs2 = _build(Alphabet.NUCLEOTIDE, rng, n=40, num_records=3)
    cat = b"N".join(s for _, s in recs2)
    qn = cat[len(recs2[0][1]) : len(recs2[0][1]) + 3]  # includes the 'N' delim
    assert b"N" in qn
    from .oracle import brute_count

    assert he.count(index2, qn) == brute_count(cat, qn, Alphabet.NUCLEOTIDE)


def test_rna_and_case_insensitive_queries(rng):
    index, records = _build(Alphabet.NUCLEOTIDE, rng, n=400)
    text = records[0][1]
    q = text[10:40]
    q_rna = q.replace(b"T", b"U")
    q_lower = q.lower()
    assert he.count(index, q_rna) == he.count(index, q)
    assert he.count(index, q_lower) == he.count(index, q)


@pytest.mark.parametrize("alphabet", ALPHABETS)
def test_kmer_table_is_load_bearing_and_correct(alphabet, rng):
    """Every table entry equals the range computed by plain backward search
    (the property that makes table seeding result-identical)."""
    index, _ = _build(alphabet, rng, n=500, kmer_len=2)
    from awry_tpu.alphabet import dense_to_index_table

    base = alphabet.num_encoding_symbols
    d2i = dense_to_index_table(alphabet)
    for addr in range(base**index.kmer_len):
        # decode address -> symbol sequence (most significant digit = first char)
        digits = []
        a = addr
        for _ in range(index.kmer_len):
            digits.append(a % base)
            a //= base
        syms = np.array([d2i[d] for d in reversed(digits)], dtype=np.int64)
        start, end = he.seed_range(index, syms[-1])
        s, e = int(start), int(end)
        for i in range(len(syms) - 2, -1, -1):
            s2, e2 = he.update_range(index, s, e, syms[i])
            s, e = int(s2), int(e2)
        ts, te = int(index.kmer_table[addr, 0]), int(index.kmer_table[addr, 1])
        if s > e:
            assert ts > te, addr
        else:
            assert (ts, te) == (s, e), addr


def test_text_with_ambiguity_runs(rng):
    """Real genomes contain N runs inside records; N is a searchable symbol
    (src/bwt.rs:124,128) and must count/locate exactly."""
    from .oracle import brute_positions, localize

    core = bytearray(random_seq(Alphabet.NUCLEOTIDE, rng, 400))
    core[50:60] = b"N" * 10
    core[200:203] = b"NNN"
    seq = bytes(core)
    index = build_from_records([("s", seq)], FmBuildArgs(lookup_table_kmer_len=3))
    for q in [seq[48:62], b"N" * 5, seq[198:205], b"NNNNNNNNNNNN"]:
        expected = brute_positions(seq, q, Alphabet.NUCLEOTIDE)
        assert he.count(index, q) == len(expected), q
        assert sorted(he.locate(index, q)) == sorted(localize(expected, index.seq_starts)), q


def test_kmer_table_disabled(rng):
    """lookup_table_kmer_len=0 disables seeding entirely; results unchanged."""
    records = [("s", random_seq(Alphabet.NUCLEOTIDE, rng, 400))]
    no_table = build_from_records(records, FmBuildArgs(lookup_table_kmer_len=0))
    with_table = build_from_records(records, FmBuildArgs(lookup_table_kmer_len=3))
    assert no_table.kmer_len == 0 and no_table.kmer_table.shape == (1, 2)
    text = records[0][1]
    for q in [text[5:25], text[100:103], b"ZZZZ"]:
        assert he.count(no_table, q) == he.count(with_table, q)
        assert he.locate(no_table, q) == he.locate(with_table, q)


def test_sentinel_in_query_returns_empty(rng):
    """Queries containing '$'/'#' return the canonical empty range instead of
    the reference's UB (sentinel-excluding rank, src/bwt.rs:128-129,261-265;
    PARITY.md divergence #7)."""
    index, records = _build(Alphabet.NUCLEOTIDE, rng, n=400)
    text = records[0][1]
    for q in (b"$", b"#", b"$" + text[:5], text[:5] + b"$", text[:3] + b"#" + text[3:6]):
        assert he.count(index, q) == 0, q
        assert he.locate(index, q) == [], q
    # Sanity: the same query without the sentinel still matches.
    assert he.count(index, text[:5]) >= 1
