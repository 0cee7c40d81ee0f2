"""Slot-verify serving path (ops/verify.py count_locate_slots_t): the search
stops AT the k-mer seed and every candidate row verifies directly against
fat rows — zero post-seed rank sweeps.  Must be bit-exact vs the host
engine across single/multi-hit/over-cap/short/ambiguous queries in both the
plain-gather and sorted-sweep fat regimes."""

import numpy as np
import pytest

import awry_tpu.host_engine as he
from awry_tpu import Alphabet, FmBuildArgs, build_from_records
from awry_tpu.ops import FmQueryEngine
from awry_tpu.ops.device_index import slot_regime_capable

from .conftest import random_seq


def _slot_index(rng, n=50_000, k=8, repeats=0):
    seq = bytearray(random_seq(Alphabet.NUCLEOTIDE, rng, n))
    # Paste a 60 bp segment several times so text-drawn queries overlapping
    # it have 2..repeats hits (exercises the multi-hit meta tier).
    if repeats:
        seg = bytes(seq[1000:1060])
        for r in range(repeats):
            p = 5000 + 4000 * r
            seq[p : p + 60] = seg
    seq = bytes(seq)
    index = build_from_records(
        [("s", seq)], FmBuildArgs(lookup_table_kmer_len=k, locate_mark_ratio=1)
    )
    assert slot_regime_capable(index)
    return index, seq


def test_slots_vmem_regime_stays_classic(rng):
    """Slot mode is an HBM-regime trade: with cheap VMEM rank steps the
    extra per-candidate fat fetches LOSE (measured on E. coli), so the
    plain-gather regime keeps the switch-step path."""
    index, _ = _slot_index(rng)
    eng = FmQueryEngine(index, use_sweep=False)
    assert not eng._verify_slots
    assert eng._verify_s >= index.kmer_len


@pytest.mark.parametrize("use_sweep", [True])
def test_slots_parity_vs_host(use_sweep, rng):
    index, seq = _slot_index(rng, repeats=3)
    eng = FmQueryEngine(index, use_sweep=use_sweep)
    assert eng._verify_slots and eng._verify_s == index.kmer_len

    starts = rng.integers(0, len(seq) - 25, size=2500)
    queries = [seq[s : s + 25] for s in starts]
    # multi-hit (pasted segment), over-cap (4-mer repeats), ambiguity,
    # short, empty, missing, exactly-k
    queries += [
        seq[1010 : 1010 + 25],          # inside the pasted segment: 4 hits
        seq[1005 : 1005 + 30],
        seq[10:14] * 3,
        b"ACGTNACGTNAC",
        b"AC",
        b"",
        b"G" * 25,
        seq[100 : 100 + index.kmer_len],  # qlen == k: exact count, walked via redis
    ]
    counts, seq_idx, local, offsets = eng.count_locate_arrays(queries, cap=2)
    for i, q in enumerate(queries):
        assert int(counts[i]) == he.count(index, q), (i, q)
        got = sorted(zip(seq_idx[offsets[i]:offsets[i+1]].tolist(),
                         local[offsets[i]:offsets[i+1]].tolist()))
        assert got == sorted(he.locate(index, q)), (i, q)
    # The pasted-segment queries must actually have been multi-hit.
    assert int(counts[len(queries) - 8]) >= 3


def test_slots_long_queries_fall_back(rng):
    """Queries longer than the fat window take the classic path per
    dispatch (exactness preserved)."""
    index, seq = _slot_index(rng)
    eng = FmQueryEngine(index, use_sweep=True)
    assert eng._verify_slots
    long_q = [seq[i : i + 120] for i in range(0, 400, 40)]
    qsyms, _ = eng.encode_queries(long_q)
    assert not eng._use_verify_for(qsyms)
    counts, _, local, offsets = eng.count_locate_arrays(long_q, cap=2)
    for i, q in enumerate(long_q):
        assert int(counts[i]) == he.count(index, q)
        assert sorted(local[offsets[i]:offsets[i+1]].tolist()) == sorted(
            p for _, p in he.locate(index, q)
        )


def test_slots_stream_stats(rng):
    index, seq = _slot_index(rng, repeats=2)
    eng = FmQueryEngine(index, use_sweep=True)
    assert eng._verify_slots
    queries = [seq[i : i + 20] for i in range(0, 3000, 7)]
    batches = [eng.encode_queries(queries) + (len(queries),)]
    outs = list(eng.count_locate_stream(batches, cap=2))
    assert len(outs) == 1
    counts = outs[0][0]
    expect = np.array([he.count(index, q) for q in queries], dtype=np.uint64)
    np.testing.assert_array_equal(counts[: len(queries)], expect)
    assert eng.stats["queries"] >= len(queries)
