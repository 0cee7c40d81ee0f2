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


def test_slots_extended_width_band(rng):
    """Seed widths WIDE_CAP+1..SLOT_EXT settle IN-dispatch through the
    extended slot pass (round-5: chr20's 1.6% redis rate was exactly this
    band, and each such lane forced a synchronous classic re-dispatch that
    kept the fast path dark).  Single-true-hit extended lanes settle (and
    the whole batch takes the fast path); width > SLOT_EXT and extended
    multi-hit lanes still re-dispatch and stay exact."""
    from awry_tpu.ops.verify import SLOT_EXT, WIDE_CAP

    n = 16_384  # small text: ~0.25 expected random occurrences per 8-mer seed
    seq = bytearray(random_seq(Alphabet.NUCLEOTIDE, rng, n))
    s_ext = bytes(random_seq(Alphabet.NUCLEOTIDE, rng, 8))
    s_over = bytes(random_seq(Alphabet.NUCLEOTIDE, rng, 8))
    s_multi = bytes(random_seq(Alphabet.NUCLEOTIDE, rng, 8))
    pfx = [bytes(random_seq(Alphabet.NUCLEOTIDE, rng, 12)) for _ in range(SLOT_EXT + 2)]
    spot = 500
    for i in range(WIDE_CAP + 2):  # seed width ~6: the extended band
        seq[spot : spot + 20] = pfx[i] + s_ext
        spot += 600
    for i in range(SLOT_EXT + 2):  # seed width ~10 > SLOT_EXT: redis
        seq[spot : spot + 20] = pfx[i] + s_over
        spot += 600
    for i in range(WIDE_CAP + 2):  # extended band; pfx[1] planted twice
        seq[spot : spot + 20] = pfx[1 if i == 2 else i] + s_multi
        spot += 600
    seq = bytes(seq)
    index = build_from_records(
        [("x", seq)], FmBuildArgs(lookup_table_kmer_len=8, locate_mark_ratio=1)
    )
    eng = FmQueryEngine(index, use_sweep=True)
    assert eng._verify_slots

    # Batch 1: every lane has exactly one true hit; the extended lanes must
    # settle in-dispatch, so zero redis and the fast path fires.
    batch1 = [pfx[0] + s_ext, pfx[1] + s_ext, pfx[WIDE_CAP + 1] + s_ext]
    batch1 += [seq[s : s + 20] for s in rng.integers(0, n - 20, size=48)]
    batch1 = [q for q in batch1 if he.count(index, q) == 1]
    assert (pfx[0] + s_ext) in batch1
    for k in eng.stats:
        eng.stats[k] = 0
    counts, seq_idx, local, offsets = eng.count_locate_arrays(batch1, cap=2)
    for i, q in enumerate(batch1):
        assert int(counts[i]) == 1, (i, q)
        assert sorted(zip(seq_idx[offsets[i]:offsets[i+1]].tolist(),
                          local[offsets[i]:offsets[i+1]].tolist())) == \
            sorted(he.locate(index, q)), (i, q)
    assert eng.stats["redis_lanes"] == 0
    assert eng.stats["fast_path_batches"] == 1

    # Batch 2: over-SLOT_EXT widths and extended multi-hit lanes re-dispatch
    # and remain exact.
    batch2 = [pfx[0] + s_over, pfx[1] + s_multi, pfx[0] + s_ext, seq[100:120]]
    counts, seq_idx, local, offsets = eng.count_locate_arrays(batch2, cap=8)
    for i, q in enumerate(batch2):
        assert int(counts[i]) == he.count(index, q), (i, q)
        assert sorted(zip(seq_idx[offsets[i]:offsets[i+1]].tolist(),
                          local[offsets[i]:offsets[i+1]].tolist())) == \
            sorted(he.locate(index, q)), (i, q)
    assert int(counts[1]) == 2  # the repeated-prefix plant really is multi-hit


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
