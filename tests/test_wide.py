"""64-bit wide-index device path (awry_tpu/ops/wide.py): parity with the
host engine, forced onto small indexes (a real >4 Gbp build is exercised by
scripts/build_wide_proof.py on hardware; the kernels are scale-agnostic)."""

import numpy as np
import pytest

import awry_tpu.host_engine as he
from awry_tpu import Alphabet, FmBuildArgs, build_from_records
from awry_tpu.ops import FmQueryEngine


def _index(alphabet=Alphabet.NUCLEOTIDE, n=3000, mark=4, k=3, records=1, seed=11):
    rng = np.random.default_rng(seed)
    letters = b"ACGTN" if alphabet is Alphabet.NUCLEOTIDE else b"ACDEFGHIKLMNPQRSTVWYX"
    recs = []
    per = n // records
    for i in range(records):
        seq = bytes(rng.choice(np.frombuffer(letters, dtype=np.uint8), size=per))
        recs.append((f"rec{i}", seq))
    args = FmBuildArgs(
        alphabet=alphabet, lookup_table_kmer_len=k, locate_mark_ratio=mark
    )
    return build_from_records(recs, args), recs


@pytest.mark.parametrize("mark", [1, 4])
@pytest.mark.parametrize("records", [1, 3])
def test_wide_count_locate_parity_nucleotide(mark, records):
    index, recs = _index(mark=mark, records=records)
    eng = FmQueryEngine(index, wide=True)
    assert eng._wide
    rng = np.random.default_rng(5)
    text = b"".join(seq for _, seq in recs)
    queries = []
    for _ in range(64):
        ln = int(rng.integers(3, 18))
        s = int(rng.integers(0, len(text) - ln))
        queries.append(text[s : s + ln])
    queries += [b"ACGT", b"NNN", b"acgu", b"TTTTTTTTTTTTTTTTTTTTTT"]

    counts = eng.count_batch(queries)
    expected = np.array([he.count(index, q) for q in queries], dtype=np.uint64)
    np.testing.assert_array_equal(counts, expected)

    got = eng.locate_batch(queries[:24], cap=8)
    for q, hits in zip(queries[:24], got):
        assert sorted(hits) == sorted(he.locate(index, q)), q


def test_wide_amino_and_overcap():
    index, recs = _index(alphabet=Alphabet.AMINO, n=1200, mark=4, k=2)
    eng = FmQueryEngine(index, wide=True)
    text = b"".join(seq for _, seq in recs)
    rng = np.random.default_rng(7)
    queries = [bytes(text[s : s + 4]) for s in rng.integers(0, len(text) - 4, size=32)]
    queries.append(text[:1])  # single-symbol query: hundreds of hits (over-cap)
    counts, seq_idx, local, offsets = eng.count_locate_arrays(queries, cap=2)
    for i, q in enumerate(queries):
        ref = sorted(he.locate(index, q))
        got = sorted(zip(seq_idx[offsets[i] : offsets[i + 1]].tolist(),
                         local[offsets[i] : offsets[i + 1]].tolist()))
        assert int(counts[i]) == he.count(index, q), q
        assert got == ref, q


def test_wide_matches_narrow_engine():
    index, recs = _index(n=5000, mark=2, k=4)
    wide = FmQueryEngine(index, wide=True)
    narrow = FmQueryEngine(index, wide=False)
    text = b"".join(seq for _, seq in recs)
    rng = np.random.default_rng(3)
    queries = [bytes(text[s : s + 12]) for s in rng.integers(0, len(text) - 12, size=48)]
    np.testing.assert_array_equal(wide.count_batch(queries), narrow.count_batch(queries))
    cw, sw, lw, ow = wide.count_locate_arrays(queries, cap=4)
    cn, sn, ln_, on = narrow.count_locate_arrays(queries, cap=4)
    np.testing.assert_array_equal(cw, cn)
    np.testing.assert_array_equal(ow, on)
    for i in range(len(queries)):
        assert sorted(zip(sw[ow[i] : ow[i + 1]].tolist(), lw[ow[i] : ow[i + 1]].tolist())) == \
            sorted(zip(sn[on[i] : on[i + 1]].tolist(), ln_[on[i] : on[i + 1]].tolist()))
