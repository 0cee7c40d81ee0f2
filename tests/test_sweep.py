"""Sorted-sweep engine (ops/sweep.py) vs the plain-gather rank primitives.

Runs the Pallas kernels in interpreter mode on the CPU backend; the Mosaic
compile path is exercised on real hardware by scripts/micro_gather4.py and
the bench."""

import numpy as np
import pytest

import awry_tpu.host_engine as he
from awry_tpu import Alphabet, FmBuildArgs, build_from_records
from awry_tpu.ops import to_device
from awry_tpu.ops.sweep import CHUNK, backstep_mark_sweep, build_sweep_blocks, occurrence_sweep

from .conftest import random_seq

ALPHABETS = [Alphabet.NUCLEOTIDE, Alphabet.AMINO]


def _dev(alphabet, rng, n=60_000):
    seq = random_seq(alphabet, rng, n)
    index = build_from_records(
        [("sweep", seq)], FmBuildArgs(alphabet=alphabet, lookup_table_kmer_len=2)
    )
    return index, to_device(index, build_sweep=True)


def test_sweep_layout_round_trip(rng):
    """blocks_sweep[t, w, j] == blocks[t*128 + j, w], zero-padded tiles."""
    blocks = rng.integers(0, 2**32, size=(1000, 40), dtype=np.uint64).astype(np.uint32)
    sw = build_sweep_blocks(blocks)
    assert sw.shape[0] % 16 == 0 and sw.shape[1:] == (40, 128)
    for t, w, j in [(0, 0, 0), (3, 17, 127), (7, 39, 103)]:
        assert sw[t, w, j] == blocks[t * 128 + j, w]
    assert (sw[8:] == 0).all()  # blocks 1000.. are padding


@pytest.mark.parametrize("alphabet", ALPHABETS)
def test_occurrence_sweep_matches_host(alphabet, rng):
    import jax.numpy as jnp

    index, dev = _dev(alphabet, rng)
    r = 1000  # non-multiple of CHUNK exercises padding
    pos = rng.integers(0, index.bwt_len, size=r).astype(np.uint32)
    sym = rng.integers(1, alphabet.cardinality, size=r).astype(np.int32)
    occ, cov = occurrence_sweep(dev, jnp.asarray(pos), jnp.asarray(sym), interpret=True)
    occ, cov = np.asarray(occ), np.asarray(cov)
    host = he.occurrence(index, pos.astype(np.int64), sym.astype(np.int64))
    assert cov.all()  # dense batch on a small index: everything covered
    np.testing.assert_array_equal(occ.astype(np.int64), host.astype(np.int64))


def test_occurrence_sweep_fixes_uncovered(rng):
    """A sparse batch spanning far more blocks than two windows is still
    served EXACTLY: lanes outside their chunk's windows are recomputed by
    the in-call plain-gather fixup (ops/sweep.py _fixup_budget), so the
    result is correct everywhere and cov reports all-covered."""
    import jax.numpy as jnp

    index, dev = _dev(Alphabet.NUCLEOTIDE, rng, n=6_000_000)
    # CHUNK requests spread over the whole index: one chunk spans ~23k
    # blocks, beyond even two maximum (64-tile = 8192-block) windows, so
    # most lanes take the fixup path.
    pos = np.linspace(0, index.bwt_len - 1, CHUNK).astype(np.uint32)
    sym = np.ones(CHUNK, dtype=np.int32)
    occ, cov = occurrence_sweep(dev, jnp.asarray(pos), jnp.asarray(sym), interpret=True)
    cov = np.asarray(cov)
    assert cov.all()
    host = he.occurrence(index, pos.astype(np.int64), sym.astype(np.int64))
    np.testing.assert_array_equal(np.asarray(occ).astype(np.int64), host.astype(np.int64))


def test_text_window_sweep_matches_gather(rng):
    """text_window_sweep returns exactly text_packed[wbase - j] for every
    request, including uncovered-chunk fixups (widely spread requests)."""
    import jax.numpy as jnp

    from awry_tpu.ops.sweep import text_window_sweep

    index, dev = _dev(Alphabet.NUCLEOTIDE, rng, n=2_000_000)
    assert dev.text_sweep is not None
    nw = dev.text_packed.shape[0]
    k = 4
    r = 700  # non-multiple of CHUNK exercises padding
    wbase = np.concatenate([
        rng.integers(k, nw, size=r - 4).astype(np.uint32),
        # extremes: clamped high value, minimum, and a tight cluster
        np.array([nw + 100, k, k + 1, nw - 1], dtype=np.uint32),
    ])
    got = np.asarray(text_window_sweep(dev, jnp.asarray(wbase), k, interpret=True))
    text = np.asarray(dev.text_packed)
    wb = np.minimum(wbase, nw - 1).astype(np.int64)
    want = text[wb[:, None] - np.arange(k)[None, :]]
    np.testing.assert_array_equal(got, want)


def test_backstep_sweep_band_gap_exact(rng):
    """Rows clustered into two distant bands (the LF-walk's post-step shape):
    the chunk straddling the empty gap between bands exceeds any window, and
    the per-lane fixup must keep every stepped row exact."""
    import jax.numpy as jnp

    index, dev = _dev(Alphabet.NUCLEOTIDE, rng, n=3_000_000)
    lo = rng.integers(0, 40_000, size=300).astype(np.uint32)
    hi = rng.integers(index.bwt_len - 40_000, index.bwt_len, size=300).astype(np.uint32)
    rows = np.concatenate([lo, hi])
    stepped, _mark, cov = backstep_mark_sweep(dev, jnp.asarray(rows), interpret=True)
    assert np.asarray(cov).all()
    host_stepped = he.backstep(index, rows.astype(np.int64))
    np.testing.assert_array_equal(np.asarray(stepped).astype(np.int64), host_stepped)


@pytest.mark.parametrize("alphabet", ALPHABETS)
def test_backstep_mark_sweep_matches_host(alphabet, rng):
    import jax.numpy as jnp

    from awry_tpu.ops.locate import _mark_bit_t, _mark_rank_t
    from awry_tpu.ops.rank import fetch_rows_t

    index, dev = _dev(alphabet, rng)
    r = 800
    rows = rng.integers(0, index.bwt_len, size=r).astype(np.uint32)
    stepped, mark, cov = backstep_mark_sweep(dev, jnp.asarray(rows), interpret=True)
    stepped, mark, cov = (np.asarray(x) for x in (stepped, mark, cov))
    assert cov.all()
    host_stepped = he.backstep(index, rows.astype(np.int64))
    np.testing.assert_array_equal(stepped.astype(np.int64), host_stepped)
    rows_t = fetch_rows_t(dev, jnp.asarray(rows))
    np.testing.assert_array_equal(
        mark & 1, np.asarray(_mark_bit_t(dev, rows_t, jnp.asarray(rows)))
    )
    np.testing.assert_array_equal(
        mark >> 1, np.asarray(_mark_rank_t(dev, rows_t, jnp.asarray(rows)))
    )


def test_engine_with_sweep_end_to_end(rng):
    """Full FmQueryEngine with the sweep hot path enabled (interpret mode on
    CPU) agrees with the plain engine and the host oracle on count+locate."""
    from awry_tpu.ops import FmQueryEngine

    index2_seq = random_seq(Alphabet.NUCLEOTIDE, rng, 50_000)
    index2 = build_from_records(
        [("sweep2", index2_seq)], FmBuildArgs(lookup_table_kmer_len=4)
    )
    sweep_eng = FmQueryEngine(index2, use_sweep=True)
    plain_eng = FmQueryEngine(index2, use_sweep=False, use_verify=False)
    assert sweep_eng.device_index.blocks_sweep is not None
    assert plain_eng.device_index.blocks_sweep is None
    queries = [index2_seq[s : s + 20] for s in rng.integers(0, 49_000, size=200)]
    queries += [b"ACGTACGTACGTACGTACGT", b"TTT", b""]
    np.testing.assert_array_equal(
        sweep_eng.count_batch(queries), plain_eng.count_batch(queries)
    )
    c1, s1, l1, o1 = sweep_eng.count_locate_arrays(queries, cap=4)
    c2, s2, l2, o2 = plain_eng.count_locate_arrays(queries, cap=4)
    np.testing.assert_array_equal(c1, c2)
    np.testing.assert_array_equal(o1, o2)
    np.testing.assert_array_equal(s1, s2)
    np.testing.assert_array_equal(l1, l2)
    assert he.count(index2, queries[0]) == int(c1[0])


@pytest.mark.parametrize("mark_ratio", [1, 2, 8])
def test_mark_ratio_knob_locate_identical(rng, mark_ratio):
    """locate_mark_ratio only changes the walk bound / mark density, never
    results: counts and locations are identical across ratios (including
    ratio 1 = every row marked, zero-step walk), and the ratio survives the
    artifact round trip."""
    import tempfile, os
    from awry_tpu.io.artifact import load_artifact, save_artifact
    from awry_tpu.ops import FmQueryEngine

    seq = random_seq(Alphabet.NUCLEOTIDE, rng, 40_000)
    base = build_from_records([("m", seq)], FmBuildArgs(lookup_table_kmer_len=4))
    assert base.resolved_mark_ratio == 4  # default: min(4, sa_ratio=8)
    idx = build_from_records(
        [("m", seq)],
        FmBuildArgs(lookup_table_kmer_len=4, locate_mark_ratio=mark_ratio),
    )
    assert idx.resolved_mark_ratio == mark_ratio
    assert idx.text_sampled_sa.shape[0] == -(-idx.bwt_len // mark_ratio)
    queries = [seq[s : s + 18] for s in rng.integers(0, 39_000, size=64)]
    for use_sweep in (False, True):
        e1 = FmQueryEngine(base, use_sweep=use_sweep)
        e2 = FmQueryEngine(idx, use_sweep=use_sweep)
        c1, s1, l1, o1 = e1.count_locate_arrays(queries, cap=4)
        c2, s2, l2, o2 = e2.count_locate_arrays(queries, cap=4)
        np.testing.assert_array_equal(c1, c2)
        np.testing.assert_array_equal(s1, s2)
        np.testing.assert_array_equal(l1, l2)
    with tempfile.TemporaryDirectory() as d:
        p = os.path.join(d, "i.npz")
        save_artifact(idx, p)
        assert load_artifact(p).resolved_mark_ratio == mark_ratio


def test_adaptive_window_tiles_and_suits(rng):
    """Window size scales with request sparsity (static per call); batches
    too sparse for guaranteed coverage are reported by sweep_suits so the
    engine routes them to the plain-gather path."""
    import jax.numpy as jnp

    from awry_tpu.ops.sweep import pick_window_tiles, sweep_suits

    index, dev = _dev(Alphabet.NUCLEOTIDE, rng, n=6_000_000)
    nt, w = dev.blocks_sweep.shape[0], dev.blocks_sweep.shape[1]
    assert nt % 128 == 0  # MAX_PAD_TILES padding: every pow2 wt <= 64 divides
    # Dense batch: minimum windows; sparse batch: grown windows.
    assert pick_window_tiles(nt, 131_072, w) == 8
    assert pick_window_tiles(nt, 2_048, w) > 8
    assert sweep_suits(dev, 131_072) and sweep_suits(dev, 4_096)
    assert not sweep_suits(dev, CHUNK)
    # A sparse-but-coverable batch is served exactly through grown windows.
    r = 4_096
    pos = np.sort(rng.integers(0, index.bwt_len, size=r)).astype(np.uint32)
    sym = rng.integers(1, 6, size=r).astype(np.int32)
    occ, cov = occurrence_sweep(dev, jnp.asarray(pos), jnp.asarray(sym), interpret=True)
    assert np.asarray(cov).all()
    host = he.occurrence(index, pos.astype(np.int64), sym.astype(np.int64))
    np.testing.assert_array_equal(np.asarray(occ).astype(np.int64), host.astype(np.int64))


def test_window_sweep_generalized_reads(rng):
    """window_sweep serves arbitrary flat-table reads exactly: element
    reads (k=2, j=0), k-mer [start, end] pairs (wbase=2a+1), and 8-word
    fat rows (wbase=8r+7) - the three generalized random-read shapes the
    engine routes through the sorted sweep (ops/search.py seed,
    ops/locate.py mark=1 walk, ops/verify.py fat path)."""
    import jax.numpy as jnp

    from awry_tpu.ops.sweep import build_sweep_blocks, window_sweep, window_sweep_suits

    flat = rng.integers(0, 2**32, size=4096, dtype=np.uint64).astype(np.uint32)
    rows8 = np.zeros((-(-flat.shape[0] // 8), 8), dtype=np.uint32)
    rows8.reshape(-1)[: flat.shape[0]] = flat
    sweep = jnp.asarray(build_sweep_blocks(rows8))
    flat_d = jnp.asarray(flat)
    r = 1024
    assert window_sweep_suits(sweep, r)

    # Element reads.
    idx = rng.integers(1, flat.shape[0], size=r).astype(np.uint32)
    out = np.asarray(window_sweep(sweep, flat_d, jnp.asarray(idx), 2, interpret=True))
    np.testing.assert_array_equal(out[:, 0], flat[idx])
    np.testing.assert_array_equal(out[:, 1], flat[idx - 1])

    # Pair reads (k-mer seed shape): flat[2a], flat[2a+1].
    a = rng.integers(0, flat.shape[0] // 2, size=r).astype(np.uint32)
    pair = np.asarray(
        window_sweep(sweep, flat_d, jnp.asarray((a << 1) | 1), 2, interpret=True)
    )
    np.testing.assert_array_equal(pair[:, 1], flat[2 * a])
    np.testing.assert_array_equal(pair[:, 0], flat[2 * a + 1])

    # Fat-row reads (verify_windows shape): row words in reversed order.
    rr = rng.integers(0, flat.shape[0] // 8, size=r).astype(np.uint32)
    words = np.asarray(
        window_sweep(sweep, flat_d, jnp.asarray((rr << 3) | 7), 8, interpret=True)
    )
    np.testing.assert_array_equal(words[:, ::-1], flat.reshape(-1, 8)[rr])


def test_window_sweep_anchored_sparse(rng):
    """Sparse batches route through the ANCHORED window path (per-chunk
    manual-DMA windows; select chain ~1.35x the mean chunk span instead of
    2*wt pow2-rounded tiles) and stay exact — element reads, seed pairs,
    fat rows, table edges, and a chunk whose span exceeds the anchored
    window (coverage fixup)."""
    import jax.numpy as jnp

    from awry_tpu.ops.sweep import (
        TRACE_COUNTS,
        build_sweep_blocks,
        pick_window_tiles,
        window_sweep,
        window_sweep_cov,
        window_sweep_suits,
    )

    n = 512 * 128 * 8  # 512 tiles of 8-word rows (the minimum pad quantum)
    flat = rng.integers(0, 2**32, size=n, dtype=np.uint64).astype(np.uint32)
    sweep = jnp.asarray(build_sweep_blocks(flat.reshape(-1, 8)))
    flat_d = jnp.asarray(flat)
    r = 1024
    assert window_sweep_suits(sweep, r)
    assert pick_window_tiles(sweep.shape[0], r, 8) > 8  # sparse: anchored regime

    before = TRACE_COUNTS["window_sweep_anchored"]
    # Element reads incl. both table edges (anchor clamping).
    idx = rng.integers(1, n, size=r).astype(np.uint32)
    idx[0], idx[-1] = 1, n - 1
    out = np.asarray(window_sweep(sweep, flat_d, jnp.asarray(idx), 2, interpret=True))
    np.testing.assert_array_equal(out[:, 0], flat[idx])
    np.testing.assert_array_equal(out[:, 1], flat[idx - 1])
    assert TRACE_COUNTS["window_sweep_anchored"] > before

    # Seed-pair reads.
    a = rng.integers(0, n // 2, size=r).astype(np.uint32)
    pair = np.asarray(
        window_sweep(sweep, flat_d, jnp.asarray((a << 1) | 1), 2, interpret=True)
    )
    np.testing.assert_array_equal(pair[:, 1], flat[2 * a])
    np.testing.assert_array_equal(pair[:, 0], flat[2 * a + 1])

    # Fat rows through window_sweep_cov (the slim slot-verify path).
    rr = rng.integers(0, n // 8, size=r).astype(np.uint32)
    words, cov = window_sweep_cov(
        sweep, n, jnp.asarray((rr << 3) | 7), 8, interpret=True
    )
    words = np.asarray(words)[np.asarray(cov)]
    np.testing.assert_array_equal(
        words[:, ::-1], flat.reshape(-1, 8)[rr[np.asarray(cov)]]
    )
    assert np.asarray(cov).mean() > 0.9

    # One chunk spread across the whole table: span > anchored window, so
    # its lanes take the coverage fixup yet stay exact.
    wide = np.linspace(8, n - 1, num=CHUNK, dtype=np.uint32)
    idx2 = np.concatenate([wide, rng.integers(1, n, size=r - CHUNK).astype(np.uint32)])
    out2 = np.asarray(window_sweep(sweep, flat_d, jnp.asarray(idx2), 2, interpret=True))
    np.testing.assert_array_equal(out2[:, 0], flat[idx2])
    np.testing.assert_array_equal(out2[:, 1], flat[idx2 - 1])
