"""Sorted-sweep rank engine: the HBM-regime hot path.

Problem (BASELINE.md round-1): backward search over an index too big for
VMEM is bound by random 128 B row fetches, and EVERY per-row primitive on
a v5e is issue-bound far below HBM bandwidth - measured XLA gather ~25M
rows/s (locality-insensitive: all-equal indices are no faster), per-row
Pallas DMA ~15M rows/s (~65 ns issue cost).

Escape (this module): requests are SORTED by position, then served by a
Pallas kernel that walks the request stream in chunks of 128 while the
covering block WINDOWS stream through VMEM as large aligned tiles (two
scalar-prefetch-indexed BlockSpecs, auto-double-buffered).  Row selection
inside a window is a per-lane dynamic gather (Mosaic's tpu.dynamic_gather
supports exactly this shape: gather along the 128-lane dimension; along
sublanes it is limited to one vreg), and the full rank compute
(XOR-polarity plane combine + masked popcount + milestone select -
awry_tpu/ops/rank.py semantics) runs on the selected [W, 128] transposed
rows without leaving VMEM.  Measured on v5e: 184M rows/s row selection -
7.5x the XLA gather (scripts/micro_gather4.py).

Layout: ``blocks_sweep[t, w, j] = blocks[t*128 + j, w]`` - fused block rows
transposed per 128-block tile, so a window arrives lane-major exactly as
the VPU rank kernel wants it.  Tile count is padded to a multiple of
2*WINDOW_TILES so the +1 window index never leaves the array.

Coverage: a chunk of 128 sorted requests spans ~128 * NB/R blocks; two
aligned windows (2 * WINDOW_TILES * 128 blocks) cover it whenever that span
fits - always, for serving-sized batches on genome-sized indexes.  Lanes of
an uncovered chunk are flagged and recomputed by the caller through the
plain-gather path, so results are exact for EVERY request distribution.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..alphabet import code_to_index_table, index_to_code_table
from .device_index import FmDeviceIndex

WINDOW_TILES = 8  # minimum tiles per window; window = 1024 blocks (160 KB nucleotide)
# Sweep arrays pad to this multiple so every pow2 wt <= MAX_WINDOW_TILES
# divides.  256-tile windows cover the SPARSE sweeps: the slot-verify fat
# table at chr1 scale is 250M 16 B rows = 125M 8-word sweep rows, where even
# a 2M-request batch leaves ~8k-row chunk spans (round-3 verdict weak #2:
# with the old 64-tile cap the slot path's coverage failed for EVERY lane
# and the whole batch re-dispatched).  VMEM stays comfortable: a 256-tile
# 8-word window is 1 MB; pick_window_tiles' vmem_cap still bounds wider-row
# sweeps (fused 40-word rank rows cap at 64 tiles as before).
MAX_WINDOW_TILES = 256
MAX_PAD_TILES = 2 * MAX_WINDOW_TILES
CHUNK = 128  # requests per grid step (= lane width)
# Request-count ceiling per sweep call: the per-chunk window ids are a
# scalar-prefetch operand living in SMEM (1 MB/core), so nchunks int32s must
# stay well under it - 16M requests = 131072 chunks = 512 KB.  Bigger batches
# (repetitive-text locate expansions reach 100M+ rows) must be slabbed by the
# caller or fall back to plain gathers; without this gate Mosaic fails the
# whole program with 'Allocation would exceed memory (space=smem)'.
MAX_SWEEP_REQUESTS = 16 * 1024 * 1024
_FULL = 0xFFFFFFFF


def pick_window_tiles(num_tiles: int, num_requests: int, row_words: int) -> int:
    """Static per-call window size: a chunk of CHUNK sorted requests spans
    ~CHUNK * num_blocks / num_requests blocks on average, and two windows
    must cover it (with ~1.9x headroom for span variance; request gaps are
    ~exponential so the span's std is mean/sqrt(CHUNK) ~ 9%).  Sparse
    batches on huge indexes (GRCh38: 262k requests over 12M blocks) need
    windows ~10x larger than the dense-batch minimum; VMEM caps the growth
    (2 window inputs x double buffering <= ~8 MB of the ~16 MB/core)."""
    want = _want_window_tiles(num_tiles, num_requests)
    vmem_cap = max(WINDOW_TILES, (8 << 20) // (4 * CHUNK * row_words * 4))
    wt = WINDOW_TILES
    while wt < want and 2 * wt <= min(vmem_cap, MAX_WINDOW_TILES):
        wt *= 2
    return wt


def _want_window_tiles(num_tiles: int, num_requests: int) -> int:
    # Chunk spans are anchored at an ALIGNED window: worst-case alignment
    # burns one full window, so one window must cover 1.2x the mean span.
    span_blocks = CHUNK * (num_tiles * CHUNK) / max(1, num_requests)
    return max(WINDOW_TILES, int(-(-1.2 * span_blocks // CHUNK)))


def sweep_suits(index: FmDeviceIndex, num_requests: int) -> bool:
    """True when the sweep can serve `num_requests` with guaranteed window
    coverage.  Very sparse batches on huge indexes (requests fewer than
    ~num_blocks / 8k) exceed the VMEM-capped window size; callers should
    take the plain-gather path there instead of paying the per-call
    uncovered-fallback cliff."""
    if index.blocks_sweep is None or num_requests > MAX_SWEEP_REQUESTS:
        return False
    nt, w = index.blocks_sweep.shape[0], index.blocks_sweep.shape[1]
    if USE_ANCHORED:
        return _anchored_want(nt, num_requests, 0) <= _anchored_cap(nt, w)
    return pick_window_tiles(nt, num_requests, w) >= _want_window_tiles(nt, num_requests)


# ---------------------------------------------------------------------------
# In-kernel rank compute on selected rows_t [W, 128] (Mosaic-safe mirrors of
# awry_tpu/ops/rank.py: int32 reductions, python-constant select chains).
# ---------------------------------------------------------------------------

def _select_u32(table, idx):
    out = jnp.full(idx.shape, np.uint32(table[0]), dtype=jnp.uint32)
    for k in range(1, len(table)):
        out = jnp.where(idx == k, jnp.uint32(table[k]), out)
    return out


def _select_rows(rows_t, base, count, idx):
    out = rows_t[base]
    for k in range(1, count):
        out = jnp.where(idx == k, rows_t[base + k], out)
    return out


def _occ_from_rows_t(alphabet, rows_t, local, sym):
    """Rank from transposed rows: milestone + inclusive masked popcount
    (src/bwt.rs:110-135; mask inclusivity src/simd_instructions.rs:106-107).
    rows_t [W, 128] u32; local [1, 128] u32 (pos & 255); sym [1, 128] i32.
    """
    code_table = index_to_code_table(alphabet)
    occv = None
    for v in range(alphabet.num_planes):
        bits = [(int(c) >> v) & 1 for c in code_table]
        xor_mask = _select_u32([_FULL if b == 0 else 0 for b in bits], sym)
        plane = rows_t[v * 8 : (v + 1) * 8] ^ xor_mask
        occv = plane if occv is None else occv & plane
    word = local >> 5
    lane = jax.lax.broadcasted_iota(jnp.uint32, (8, 1), 0)
    in_word = jnp.uint32(_FULL) >> (jnp.uint32(31) - (local & jnp.uint32(31)))
    mask = jnp.where(lane < word, jnp.uint32(_FULL), jnp.where(lane == word, in_word, jnp.uint32(0)))
    # Mosaic has no unsigned reductions: popcount sums run in int32.
    pop = jax.lax.population_count(occv & mask).astype(jnp.int32).sum(axis=0, dtype=jnp.int32)
    milestone = _select_rows(rows_t, alphabet.num_planes * 8, alphabet.cardinality, sym)[0]
    return milestone + pop.astype(jnp.uint32)


def _symbol_from_rows_t(alphabet, rows_t, local):
    word = (local >> 5).astype(jnp.int32)
    bit = (local & jnp.uint32(31)).astype(jnp.uint32)
    code = jnp.zeros(local.shape, dtype=jnp.int32)
    for v in range(alphabet.num_planes):
        lane_word = _select_rows(rows_t, v * 8, 8, word)
        code = code | (((lane_word >> bit) & jnp.uint32(1)).astype(jnp.int32) << v)
    c2i = code_to_index_table(alphabet)
    sym = jnp.full(code.shape, np.int32(c2i[0]), dtype=jnp.int32)
    for k in range(1, len(c2i)):
        sym = jnp.where(code == k, np.int32(c2i[k]), sym)
    return sym


def _mark_bit_from_rows_t(mark_offset, rows_t, local):
    word = (local >> 5).astype(jnp.int32)
    bit = (local & jnp.uint32(31)).astype(jnp.uint32)
    lane_word = _select_rows(rows_t, mark_offset, 8, word)
    return (lane_word >> bit) & jnp.uint32(1)


def _mark_rank_from_rows_t(mark_offset, rows_t, local):
    """Marked rows strictly before pos (exclusive mask + mark milestone)."""
    word = local >> 5
    lane = jax.lax.broadcasted_iota(jnp.uint32, (8, 1), 0)
    in_word = (jnp.uint32(1) << (local & jnp.uint32(31))) - jnp.uint32(1)
    mask = jnp.where(lane < word, jnp.uint32(_FULL), jnp.where(lane == word, in_word, jnp.uint32(0)))
    marks = rows_t[mark_offset : mark_offset + 8]
    pop = jax.lax.population_count(marks & mask).astype(jnp.int32).sum(axis=0, dtype=jnp.int32)
    return rows_t[mark_offset + 8] + pop.astype(jnp.uint32)  # [128] milestone lane vector


def _prefix_select(ps_ref, cardinality, sym):
    """C[sym] from the scalar-prefetched prefix sums (runtime values)."""
    out = jnp.full(sym.shape, ps_ref[0], dtype=jnp.uint32)
    for k in range(1, cardinality + 1):
        out = jnp.where(sym == k, ps_ref[k], out)
    return out


# ---------------------------------------------------------------------------
# Sweep layout
# ---------------------------------------------------------------------------

def sweep_pad_tiles(num_blocks: int) -> int:
    nt = -(-num_blocks // CHUNK)
    return -(-nt // MAX_PAD_TILES) * MAX_PAD_TILES


def build_sweep_blocks(blocks: np.ndarray) -> np.ndarray:
    """[NB, W] fused rows -> [NT_pad, W, 128] transposed-per-tile layout."""
    from ..build.suffix_array import sweep_tiles_native

    nb, w = blocks.shape
    nt = sweep_pad_tiles(nb)
    out = sweep_tiles_native(np.asarray(blocks), nt)
    if out is not None:
        return out
    padded = np.zeros((nt * CHUNK, w), dtype=np.uint32)
    padded[:nb] = np.asarray(blocks, dtype=np.uint32)
    return np.ascontiguousarray(padded.reshape(nt, CHUNK, w).transpose(0, 2, 1))


def _row_select(winA, winB, local_block):
    """rows_t [W, 128] for per-lane window-local block ids: 2*wt lane-gathers
    + select chain (the Mosaic-supported gather shape)."""
    wt, w = winA.shape[0], winA.shape[1]
    sub = local_block >> 7
    lane_b = jnp.broadcast_to((local_block & 127).astype(jnp.int32), (w, CHUNK))
    rows_t = jnp.zeros((w, CHUNK), dtype=jnp.uint32)
    for s in range(2 * wt):
        src = winA[s] if s < wt else winB[s - wt]
        g = jnp.take_along_axis(src, lane_b, axis=1)
        rows_t = jnp.where(sub == s, g, rows_t)
    return rows_t


# ---------------------------------------------------------------------------
# Anchored windows (round-4 roofline lever): per-chunk manual-DMA windows.
#
# The blocked sweep above pays a select chain over 2*wt tiles because
# BlockSpec windows are block-ALIGNED and wt rounds up to a power of two: a
# 61-tile mean chunk span costs a 512-tile chain, and that chain IS the
# measured sparse-read cost (seed-table pair reads ~13 ms, mark=1 SA reads
# ~8 ms per 512k chr1 batch - BASELINE.md round-4 attribution).  Anchoring
# the window at each chunk's own first tile needs only mean-span x 1.35
# headroom tiles (chunk spans are ~Erlang(128); std ~9% of mean), cutting
# the chain 3-10x.  The covering S tiles are DMA'd from HBM into a
# double-buffered VMEM scratch: the copy for chunk c+1 is issued before
# chunk c's compute, so the stream stays pipelined exactly like the
# BlockSpec path it replaces.  Chunks whose span still exceeds S take the
# standard coverage fixup.  AWRY_SWEEP_BLOCKED=1 forces the old path (A/B).
# ---------------------------------------------------------------------------

USE_ANCHORED = os.environ.get("AWRY_SWEEP_BLOCKED") != "1"


def _anchored_dma(an_ref, hbm_ref, buf_ref, sem_ref, S: int, nchunks: int):
    """Shared double-buffered DMA prologue: start chunk c+1's window copy,
    wait for chunk c's.  Returns (c, slot)."""
    c = pl.program_id(0)
    slot = jax.lax.rem(c, 2)

    @pl.when(c == 0)
    def _():
        pltpu.make_async_copy(
            hbm_ref.at[pl.ds(an_ref[0], S)], buf_ref.at[0], sem_ref.at[0]
        ).start()

    @pl.when(c + 1 < nchunks)
    def _():
        nxt = jax.lax.rem(c + 1, 2)
        pltpu.make_async_copy(
            hbm_ref.at[pl.ds(an_ref[c + 1], S)], buf_ref.at[nxt], sem_ref.at[nxt]
        ).start()

    pltpu.make_async_copy(
        hbm_ref.at[pl.ds(an_ref[c], S)], buf_ref.at[slot], sem_ref.at[slot]
    ).wait()
    return c, slot


def _rows_multi_anchored(buf_ref, slot, S: int, local_idxs):
    """[w, 128] selected rows for each per-lane window-local row/block-id
    vector in `local_idxs`; each scratch tile is loaded ONCE and serves all
    of them (pair ranks, nr text rows)."""
    w = buf_ref.shape[2]
    subs = [li >> 7 for li in local_idxs]
    lanes = [
        jnp.broadcast_to((li & 127).astype(jnp.int32), (w, CHUNK)) for li in local_idxs
    ]
    outs = [jnp.zeros((w, CHUNK), dtype=jnp.uint32) for _ in local_idxs]
    for s in range(S):
        tile = buf_ref[slot, s]
        for i in range(len(local_idxs)):
            g = jnp.take_along_axis(tile, lanes[i], axis=1)
            outs[i] = jnp.where(subs[i] == s, g, outs[i])
    return outs


# ---------------------------------------------------------------------------
# Kernels
# ---------------------------------------------------------------------------

def _occ_kernel(alphabet, wt):
    def kernel(cw_ref, ps_ref, pos_ref, sym_ref, winA_ref, winB_ref, occ_ref):
        c = pl.program_id(0)
        r = c % 8
        base = cw_ref[c] * (wt * CHUNK)
        pos = pos_ref[0, r, :][None, :]
        sym = sym_ref[0, r, :][None, :]
        local_block = (pos >> 8).astype(jnp.int32) - base
        rows_t = _row_select(winA_ref, winB_ref, local_block)
        occ_ref[0, r, :] = _occ_from_rows_t(alphabet, rows_t, pos & jnp.uint32(255), sym)

    return kernel


def _occ_pair_kernel(alphabet, wt):
    """Both endpoint ranks of an LF range update from ONE chunk visit: the
    request stream is sorted by the LOW position (start-1); the high
    position (end) rides as a payload column and reads the SAME streamed
    windows (end - start < the window span for every covered chunk, checked
    by the caller's coverage flag).  Halves the sort/stream/grid work of a
    rank step vs two independent single-position requests."""

    def kernel(cw_ref, ps_ref, pos_ref, posb_ref, sym_ref, winA_ref, winB_ref,
               occa_ref, occb_ref):
        c = pl.program_id(0)
        r = c % 8
        base = cw_ref[c] * (wt * CHUNK)
        sym = sym_ref[0, r, :][None, :]
        for pref, oref in ((pos_ref, occa_ref), (posb_ref, occb_ref)):
            pos = pref[0, r, :][None, :]
            local_block = (pos >> 8).astype(jnp.int32) - base
            rows_t = _row_select(winA_ref, winB_ref, local_block)
            oref[0, r, :] = _occ_from_rows_t(alphabet, rows_t, pos & jnp.uint32(255), sym)

    return kernel


def _backstep_kernel(alphabet, mark_offset, ambiguity_idx, wt):
    """Fused marked-walk visit: from ONE row selection, emit the LF-stepped
    row (sentinel rows -> 0; src/fm_index.rs:585-593) and the packed mark
    state (mark_rank << 1) | mark_bit (ops/locate.py marked walk)."""

    def kernel(cw_ref, ps_ref, pos_ref, winA_ref, winB_ref, step_ref, mark_ref):
        c = pl.program_id(0)
        r = c % 8
        base = cw_ref[c] * (wt * CHUNK)
        pos = pos_ref[0, r, :][None, :]
        local_block = (pos >> 8).astype(jnp.int32) - base
        rows_t = _row_select(winA_ref, winB_ref, local_block)
        local = pos & jnp.uint32(255)
        sym = _symbol_from_rows_t(alphabet, rows_t, local)
        is_sentinel = sym == 0
        safe = jnp.where(is_sentinel, ambiguity_idx, sym)
        occ = _occ_from_rows_t(alphabet, rows_t, local, safe)
        stepped = _prefix_select(ps_ref, alphabet.cardinality, safe) + occ - jnp.uint32(1)
        mark_bit = _mark_bit_from_rows_t(mark_offset, rows_t, local)
        mark_rank = _mark_rank_from_rows_t(mark_offset, rows_t, local)
        step_ref[0, r, :] = jnp.where(is_sentinel, jnp.uint32(0), stepped)[0]
        mark_ref[0, r, :] = ((mark_rank << 1) | mark_bit)[0]

    return kernel


def _grid_spec(nchunks: int, nwin: int, w: int, n_req: int, n_out: int, wt: int):
    """PrefetchScalarGridSpec shared by the sweep kernels.

    Scalar prefetch: (chunk window ids, prefix sums).  Request arrays and
    outputs are grid-blocked in groups of 8 chunks ((1, 8, 128) blocks
    satisfy the (8, 128)-divisibility rule); the two window inputs follow
    the prefetched per-chunk window id (Pallas skips the re-fetch when the
    id repeats, which sorted requests make the common case)."""
    req_spec = pl.BlockSpec((1, 8, CHUNK), lambda c, cw, ps: (c // 8, 0, 0),
                            memory_space=pltpu.VMEM)

    def win_map(off):
        return lambda c, cw, ps: (jnp.minimum(cw[c] + off, nwin - 1), 0, 0)

    win_spec = lambda off: pl.BlockSpec(  # noqa: E731
        (wt, w, CHUNK), win_map(off), memory_space=pltpu.VMEM
    )
    out_spec = pl.BlockSpec((1, 8, CHUNK), lambda c, cw, ps: (c // 8, 0, 0),
                            memory_space=pltpu.VMEM)
    return pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(nchunks,),
        in_specs=[req_spec] * n_req + [win_spec(0), win_spec(1)],
        out_specs=tuple(out_spec for _ in range(n_out)) if n_out > 1 else out_spec,
    )


# ---------------------------------------------------------------------------
# XLA-side plumbing: sort, chunk, call, unsort
# ---------------------------------------------------------------------------

_VAL_SHIFT = 5  # low bits of the sort payload carry the symbol (cardinality <= 22)


def _chunk_windows(spos: jax.Array, wt: int):
    """Per-chunk window id + coverage flag for a SORTED position stream."""
    first_blk = (spos[::CHUNK] >> 8).astype(jnp.int32)
    last_blk = (spos[CHUNK - 1 :: CHUNK] >> 8).astype(jnp.int32)
    win = first_blk // (wt * CHUNK)
    covered = (last_blk - win * (wt * CHUNK)) < 2 * wt * CHUNK
    return win, covered


def _sorted_chunks(pos: jax.Array, val: jax.Array, wt: int):
    """Sort (pos, val) by pos; pad to whole groups of 8 chunks.  Padded lanes
    reuse the last position (stay covered) and carry payload ids ABOVE every
    real id so the unsort puts them at the tail."""
    r = pos.shape[0]
    nchunks = (-(-r // CHUNK) + 7) // 8 * 8
    npad = nchunks * CHUNK
    idx = jnp.arange(npad, dtype=jnp.int32)
    pos_p = jnp.where(idx < r, _pad_to(pos, npad), pos[r - 1])
    val_p = jnp.where(idx < r, _pad_to(val, npad), idx << _VAL_SHIFT)
    spos, sval = jax.lax.sort_key_val(pos_p, val_p)
    win, covered = _chunk_windows(spos, wt)
    return spos, sval, win, covered, nchunks


def _pad_to(x: jax.Array, n: int) -> jax.Array:
    if x.shape[0] == n:
        return x
    return jnp.concatenate([x, jnp.zeros((n - x.shape[0],), dtype=x.dtype)])


def _chunk_budget(nchunks: int) -> int:
    """Static per-call budget of uncovered CHUNKS recomputed by the plain
    path.  Uncovered chunks are rare but REAL: sorted span tails (~1% of
    chunks at the mean-span-sized window) and, on walk visits, chunks
    straddling LF-band gaps (positions after an LF step cluster into
    per-symbol bands; a chunk spanning the empty gap between bands exceeds
    any window).  Before this fixup ONE such chunk sent the whole batch
    through the full plain-gather fallback - measured 26 ms vs 3 ms per
    chr1 walk visit.  Within a SORTED chunk, chunk coverage (first and last
    lane in-window) implies every lane is covered, so whole-chunk fixup at
    [budget, CHUNK] granularity is exact and keeps the compaction machinery
    at nchunks (not request) size."""
    return min(nchunks, max(4, nchunks >> 5))


def _compact_flagged_chunks(covered_c: jax.Array, budget: int):
    """Ids of up to `budget` uncovered chunks, fixed shape.  Returns
    (idx int32[budget], valid bool[budget], overflow bool[]).  Invalid
    slots hold chunk 0; callers scatter results back through a dropped
    out-of-range destination for those slots."""
    flagged = ~covered_c
    n = flagged.shape[0]
    rank = jnp.cumsum(flagged.astype(jnp.int32)) - 1
    total = rank[-1] + 1
    slot = jnp.where(flagged & (rank < budget), rank, budget)
    idx = (
        jnp.zeros((budget + 1,), jnp.int32)
        .at[slot]
        .set(jnp.arange(n, dtype=jnp.int32), mode="drop")[:budget]
    )
    valid = jnp.arange(budget, dtype=jnp.int32) < total
    return idx, valid, total > budget


def _unsort(sval: jax.Array, *arrays):
    """Restore original request order (sval is unique and increasing in the
    original id); drop padded tail lanes at the caller via [:r].

    ONE multi-operand lax.sort carries every payload: at 512k requests a
    sort costs ~2.5 ms on a v5e and the per-array sort_key_val form paid it
    once per output (round-5 profiling: sorts, not the select chains, had
    become the sweep-path bottleneck)."""
    return list(jax.lax.sort((sval, *arrays), num_keys=1)[1:])


# Trace-time dispatch counters: tests and multichip dryruns assert the
# sweep hot path actually engaged (the gates in sweep_suits /
# window_sweep_suits silently fall back to plain gathers otherwise).  A
# counter ticks when a sweep kernel is TRACED into a program (once per
# compiled shape, not per dispatch) — enough to prove the path is live.
TRACE_COUNTS = {
    "occurrence_sweep": 0,
    "window_sweep": 0,
    "window_sweep_anchored": 0,
    "seeded_chain": 0,
}


@functools.partial(jax.jit, static_argnames=("interpret",))
def occurrence_sweep(index: FmDeviceIndex, pos: jax.Array, sym: jax.Array, *, interpret: bool = False):
    """Occ(pos[i], sym[i]) over a large request batch via the sorted sweep.

    Returns (occ uint32 [R], covered bool [R]); covered=False lanes were not
    computed (their chunk spanned more than two windows) and must be
    recomputed through the plain-gather path (rank.occurrence)."""
    TRACE_COUNTS["occurrence_sweep"] += 1
    r = pos.shape[0]
    val = (jnp.arange(r, dtype=jnp.int32) << _VAL_SHIFT) | sym.astype(jnp.int32)
    nt = index.blocks_sweep.shape[0]
    w = index.blocks_sweep.shape[1]
    wt = pick_window_tiles(nt, r, w)
    spos, sval, win, covered_c, nchunks = _sorted_chunks(pos, val, wt)
    nwin = nt // wt
    ssym = (sval & ((1 << _VAL_SHIFT) - 1)).astype(jnp.int32)
    if USE_ANCHORED:
        S = _anchored_block_tiles(nt, r, w)
        first = (spos[::CHUNK] >> 8).astype(jnp.int32)
        last = (spos[CHUNK - 1 :: CHUNK] >> 8).astype(jnp.int32)
        an, covered_c = _anchors_for(first, last, nt, S)
        occ_s = pl.pallas_call(
            _occ_kernel_anchored(index.alphabet, S, nchunks),
            grid_spec=_anchored_grid_spec(nchunks, w, n_req=2, n_out=1, S=S),
            out_shape=jax.ShapeDtypeStruct((nchunks // 8, 8, CHUNK), jnp.uint32),
            interpret=interpret,
        )(
            an,
            index.prefix_sums,
            spos.reshape(nchunks // 8, 8, CHUNK),
            ssym.reshape(nchunks // 8, 8, CHUNK),
            index.blocks_sweep,
        ).reshape(-1)
    else:
        occ_s = pl.pallas_call(
            _occ_kernel(index.alphabet, wt),
            grid_spec=_grid_spec(nchunks, nwin, w, n_req=2, n_out=1, wt=wt),
            out_shape=jax.ShapeDtypeStruct((nchunks // 8, 8, CHUNK), jnp.uint32),
            interpret=interpret,
        )(
            win,
            index.prefix_sums,
            spos.reshape(nchunks // 8, 8, CHUNK),
            ssym.reshape(nchunks // 8, 8, CHUNK),
            index.blocks_sweep,
            index.blocks_sweep,
        ).reshape(-1)
    # Whole-chunk coverage fixup: the few uncovered chunks are recomputed by
    # the plain-gather rank on a fixed budget, so a straggler chunk no longer
    # forces the caller's full-batch fallback (see _chunk_budget).
    from .rank import occurrence

    bc = _chunk_budget(nchunks)
    fcidx, fvalid, overflow = _compact_flagged_chunks(covered_c, bc)
    spos2 = spos.reshape(nchunks, CHUNK)
    sym2 = (sval & ((1 << _VAL_SHIFT) - 1)).astype(jnp.int32).reshape(nchunks, CHUNK)
    fix = occurrence(index, spos2[fcidx].reshape(-1), sym2[fcidx].reshape(-1))
    occ2 = occ_s.reshape(nchunks, CHUNK)
    dst = jnp.where(fvalid, fcidx, nchunks)
    occ_s = occ2.at[dst].set(fix.reshape(bc, CHUNK), mode="drop").reshape(-1)
    # All lanes are exact after the fixup unless the budget overflowed (then
    # the still-uncovered lanes stay flagged for the caller's fallback).
    # The cov unsort is a full extra sort (~1.5 ms at 256k); pay it only in
    # the overflow branch — the hot path returns constant all-covered.
    occ = _unsort(sval, occ_s)[0]
    npad = nchunks * CHUNK
    cov = jax.lax.cond(
        overflow,
        lambda: _unsort(
            sval,
            jnp.broadcast_to(covered_c[:, None], (nchunks, CHUNK)).reshape(-1),
        )[0],
        lambda: jnp.ones((npad,), bool),
    )
    return occ[:r], cov[:r]


@functools.partial(jax.jit, static_argnames=("interpret",))
def occurrence_sweep_pair(
    index: FmDeviceIndex, pos_a: jax.Array, pos_b: jax.Array, sym: jax.Array,
    *, interpret: bool = False,
):
    """(Occ(pos_a[i], sym[i]), Occ(pos_b[i], sym[i])) in one sweep.

    Both endpoints of an LF range update sit within one request: sorting by
    pos_a alone (HALF the sort keys of two independent requests) still
    covers pos_b, because pos_b >= pos_a and pos_b - pos_a = range width,
    far below the window span for every serving-shaped batch — the per-chunk
    coverage check includes the pos_b maximum, so wide stragglers just take
    the fixup/fallback like any uncovered chunk.

    Returns (occ_a uint32 [R], occ_b uint32 [R], covered bool [R])."""
    TRACE_COUNTS["occurrence_sweep"] += 1
    r = pos_a.shape[0]
    val = (jnp.arange(r, dtype=jnp.int32) << _VAL_SHIFT) | sym.astype(jnp.int32)
    nt = index.blocks_sweep.shape[0]
    w = index.blocks_sweep.shape[1]
    wt = pick_window_tiles(nt, r, w)
    nwin = nt // wt

    nchunks = (-(-r // CHUNK) + 7) // 8 * 8
    npad = nchunks * CHUNK
    idx = jnp.arange(npad, dtype=jnp.int32)
    pos_p = jnp.where(idx < r, _pad_to(pos_a, npad), pos_a[r - 1])
    posb_p = jnp.where(idx < r, _pad_to(pos_b, npad), pos_a[r - 1])
    val_p = jnp.where(idx < r, _pad_to(val, npad), idx << _VAL_SHIFT)
    spos, sval, sposb = jax.lax.sort((pos_p, val_p, posb_p), num_keys=1)
    ssym = (sval & ((1 << _VAL_SHIFT) - 1)).astype(jnp.int32)
    maxb_blk = (sposb.reshape(nchunks, CHUNK) >> 8).astype(jnp.int32).max(axis=1)
    if USE_ANCHORED:
        S = _anchored_block_tiles(nt, r, w)
        first = (spos[::CHUNK] >> 8).astype(jnp.int32)
        an, covered_c = _anchors_for(first, maxb_blk, nt, S)
        occa_s, occb_s = pl.pallas_call(
            _occ_pair_kernel_anchored(index.alphabet, S, nchunks),
            grid_spec=_anchored_grid_spec(nchunks, w, n_req=3, n_out=2, S=S),
            out_shape=(
                jax.ShapeDtypeStruct((nchunks // 8, 8, CHUNK), jnp.uint32),
                jax.ShapeDtypeStruct((nchunks // 8, 8, CHUNK), jnp.uint32),
            ),
            interpret=interpret,
        )(
            an,
            index.prefix_sums,
            spos.reshape(nchunks // 8, 8, CHUNK),
            sposb.reshape(nchunks // 8, 8, CHUNK),
            ssym.reshape(nchunks // 8, 8, CHUNK),
            index.blocks_sweep,
        )
    else:
        win, covered_a = _chunk_windows(spos, wt)
        covered_c = covered_a & ((maxb_blk - win * (wt * CHUNK)) < 2 * wt * CHUNK)
        occa_s, occb_s = pl.pallas_call(
            _occ_pair_kernel(index.alphabet, wt),
            grid_spec=_grid_spec(nchunks, nwin, w, n_req=3, n_out=2, wt=wt),
            out_shape=(
                jax.ShapeDtypeStruct((nchunks // 8, 8, CHUNK), jnp.uint32),
                jax.ShapeDtypeStruct((nchunks // 8, 8, CHUNK), jnp.uint32),
            ),
            interpret=interpret,
        )(
            win,
            index.prefix_sums,
            spos.reshape(nchunks // 8, 8, CHUNK),
            sposb.reshape(nchunks // 8, 8, CHUNK),
            ssym.reshape(nchunks // 8, 8, CHUNK),
            index.blocks_sweep,
            index.blocks_sweep,
        )
    occa_s, occb_s = occa_s.reshape(-1), occb_s.reshape(-1)

    # Whole-chunk coverage fixup on a fixed budget (see _chunk_budget).
    from .rank import occurrence

    bc = _chunk_budget(nchunks)
    fcidx, fvalid, overflow = _compact_flagged_chunks(covered_c, bc)
    spos2 = spos.reshape(nchunks, CHUNK)
    sposb2 = sposb.reshape(nchunks, CHUNK)
    sym2 = ssym.reshape(nchunks, CHUNK)
    fsym = sym2[fcidx].reshape(-1)
    fix_a = occurrence(index, spos2[fcidx].reshape(-1), fsym)
    fix_b = occurrence(index, sposb2[fcidx].reshape(-1), fsym)
    dst = jnp.where(fvalid, fcidx, nchunks)
    occa_s = occa_s.reshape(nchunks, CHUNK).at[dst].set(
        fix_a.reshape(bc, CHUNK), mode="drop").reshape(-1)
    occb_s = occb_s.reshape(nchunks, CHUNK).at[dst].set(
        fix_b.reshape(bc, CHUNK), mode="drop").reshape(-1)

    occ_a, occ_b = _unsort(sval, occa_s, occb_s)
    cov = jax.lax.cond(
        overflow,
        lambda: _unsort(
            sval,
            jnp.broadcast_to(covered_c[:, None], (nchunks, CHUNK)).reshape(-1),
        )[0],
        lambda: jnp.ones((npad,), bool),
    )
    return occ_a[:r], occ_b[:r], cov[:r]


def _auto_interpret() -> bool:
    """Pallas interpreter off-TPU (tests/CI run the CPU backend)."""
    return jax.default_backend() != "tpu"


def sweep_update_range(index: FmDeviceIndex, starts, ends, sym):
    """Drop-in LF-mapping range update (rank.update_range contract) served by
    the sorted sweep; uncovered lanes fall back to the plain-gather rank via
    lax.cond so the common (fully covered) batch never pays for it.

    Both endpoint ranks come from ONE paired sweep (occurrence_sweep_pair):
    half the sort keys and grid chunks of the two-request form."""
    from .rank import occurrence, prefix_sum_select

    pos_a = starts - jnp.uint32(1)
    occ_a, occ_b, cov = occurrence_sweep_pair(
        index, pos_a, ends, sym, interpret=_auto_interpret()
    )

    def fixup():
        oa = jnp.where(cov, occ_a, occurrence(index, pos_a, sym))
        ob = jnp.where(cov, occ_b, occurrence(index, ends, sym))
        return oa, ob

    occ_a, occ_b = jax.lax.cond(jnp.all(cov), lambda: (occ_a, occ_b), fixup)
    c = prefix_sum_select(index, sym)
    return c + occ_a, c + occ_b - jnp.uint32(1)


def seeded_chain_fits(index: FmDeviceIndex, batch: int, steps: int) -> bool:
    """True when seeded_pair_chain's payload packing fits int32 for this
    (batch, post-seed step count): id bits + steps x symbol bits + active-
    count bits <= 31."""
    if steps <= 0 or steps > 6 or index.blocks_sweep is None:
        return False
    sb = max(1, (index.alphabet.cardinality - 1).bit_length())
    nb = max(1, steps.bit_length())
    npad_max = ((batch + CHUNK - 1) // CHUNK + 7) // 8 * 8 * CHUNK
    return npad_max <= (1 << (31 - steps * sb - nb))


def seeded_pair_chain(index: FmDeviceIndex, s0, e0, qt, qlens, k: int, upper: int,
                      *, interpret: bool = False):
    """Post-seed backward-search steps k..upper-1 entirely in the SORTED
    request domain: ONE 3-operand sort per step (key = this step's low
    endpoint; the per-lane step symbols and active-step count ride in the
    payload) plus one final unsort — replacing sweep_update_range's
    per-step sort + unsort + implicit re-sort.  At 512k lanes a sort costs
    ~2.5 ms on a v5e and the old form paid ~3 per step (round-5 profiling:
    sorts, not select chains, bound the rank steps after the anchored
    windows landed).

    Endpoint convention: pos_a = start-1, pos_b = end (the two rank-query
    positions of the LF update, src/fm_index.rs:559-582); nonempty iff
    pos_a < pos_b.  Seed-miss lanes canonicalize to the empty (1, 0) range
    (pos 0: they cluster in the first chunk instead of blowing the sorted
    span).  Frozen lanes (exhausted qlens, empties) carry their range
    through the sort untouched.  Returns (starts, ends) in request order.
    """
    from .rank import occurrence, prefix_sum_select

    TRACE_COUNTS["seeded_chain"] += 1
    steps = upper - k
    B = s0.shape[0]
    sb = max(1, (index.alphabet.cardinality - 1).bit_length())
    nb = max(1, steps.bit_length())
    L = qt.shape[0]
    n_act = jnp.clip(qlens.astype(jnp.int32) - k, 0, steps)
    pay = (jnp.arange(B, dtype=jnp.int32) << (steps * sb + nb)) | n_act
    for i in range(steps):
        pay = pay | (qt[L - 1 - (k + i)].astype(jnp.int32) << (nb + i * sb))

    nt = index.blocks_sweep.shape[0]
    w = index.blocks_sweep.shape[1]
    nchunks = (-(-B // CHUNK) + 7) // 8 * 8
    npad = nchunks * CHUNK
    idx = jnp.arange(npad, dtype=jnp.int32)
    empty0 = s0 > e0
    pa = jnp.where(empty0, jnp.uint32(0), s0 - jnp.uint32(1))
    pb = jnp.where(empty0, jnp.uint32(0), e0)
    pos_a = jnp.where(idx < B, _pad_to(pa, npad), jnp.uint32(0))
    pos_b = jnp.where(idx < B, _pad_to(pb, npad), jnp.uint32(0))
    # Padding lanes: n_act = 0 (frozen), ids above every real id.
    pay = jnp.where(idx < B, _pad_to(pay, npad), idx << (steps * sb + nb))

    S = _anchored_block_tiles(nt, npad, w)
    bc = _chunk_budget(nchunks)
    out_shapes = (
        jax.ShapeDtypeStruct((nchunks // 8, 8, CHUNK), jnp.uint32),
        jax.ShapeDtypeStruct((nchunks // 8, 8, CHUNK), jnp.uint32),
    )
    for i in range(steps):
        spa, spay, spb = jax.lax.sort((pos_a, pay, pos_b), num_keys=1)
        shift = nb + i * sb
        first = (spa[::CHUNK] >> 8).astype(jnp.int32)
        maxb = (spb.reshape(nchunks, CHUNK) >> 8).astype(jnp.int32).max(axis=1)
        an, covered_c = _anchors_for(first, maxb, nt, S)
        occa_s, occb_s = pl.pallas_call(
            _occ_pair_pay_kernel_anchored(index.alphabet, S, nchunks, shift, sb),
            grid_spec=_anchored_grid_spec(nchunks, w, n_req=3, n_out=2, S=S),
            out_shape=out_shapes,
            interpret=interpret,
        )(
            an,
            index.prefix_sums,
            spa.reshape(nchunks // 8, 8, CHUNK),
            spb.reshape(nchunks // 8, 8, CHUNK),
            spay.reshape(nchunks // 8, 8, CHUNK),
            index.blocks_sweep,
        )
        occ_a, occ_b = occa_s.reshape(-1), occb_s.reshape(-1)

        sym_s = ((spay >> shift) & jnp.int32((1 << sb) - 1)).astype(jnp.int32)
        fcidx, fvalid, overflow = _compact_flagged_chunks(covered_c, bc)
        spa2 = spa.reshape(nchunks, CHUNK)
        spb2 = spb.reshape(nchunks, CHUNK)
        sym2 = sym_s.reshape(nchunks, CHUNK)
        fsym = sym2[fcidx].reshape(-1)
        fix_a = occurrence(index, spa2[fcidx].reshape(-1), fsym)
        fix_b = occurrence(index, spb2[fcidx].reshape(-1), fsym)
        dst = jnp.where(fvalid, fcidx, nchunks)
        occ_a = occ_a.reshape(nchunks, CHUNK).at[dst].set(
            fix_a.reshape(bc, CHUNK), mode="drop").reshape(-1)
        occ_b = occ_b.reshape(nchunks, CHUNK).at[dst].set(
            fix_b.reshape(bc, CHUNK), mode="drop").reshape(-1)

        def full_fix(occ_a=occ_a, occ_b=occ_b, spa=spa, spb=spb, sym_s=sym_s,
                     covered_c=covered_c):
            cov = jnp.broadcast_to(covered_c[:, None], (nchunks, CHUNK)).reshape(-1)
            oa = jnp.where(cov, occ_a, occurrence(index, spa, sym_s))
            ob = jnp.where(cov, occ_b, occurrence(index, spb, sym_s))
            return oa, ob

        occ_a, occ_b = jax.lax.cond(
            overflow, full_fix, lambda a=occ_a, b=occ_b: (a, b)
        )
        cpre = prefix_sum_select(index, sym_s)
        nact_s = spay & jnp.int32((1 << nb) - 1)
        active = (jnp.int32(i) < nact_s) & (spa < spb)
        pos_a = jnp.where(active, cpre + occ_a - jnp.uint32(1), spa)
        pos_b = jnp.where(active, cpre + occ_b - jnp.uint32(1), spb)
        pay = spay

    _, fa, fb = jax.lax.sort((pay, pos_a, pos_b), num_keys=1)
    return fa[:B] + jnp.uint32(1), fb[:B]


def _sweep_visit(index: FmDeviceIndex, pos: jax.Array, pay: jax.Array, interp: bool):
    """One sorted-domain walk visit: sort (pos, pay) by pos, run the fused
    backstep/mark kernel on the sorted stream, fall back to the plain-gather
    path for the (rare) uncovered case.  Returns everything in SORTED order -
    callers carry (spos, spay) forward instead of unsorting, which is the
    point: one sort per visit instead of sort + 3 unsorts."""
    from .locate import _mark_bit_t, _mark_rank_t
    from .rank import backstep_from_rows_t, fetch_rows_t

    npad = pos.shape[0]
    nchunks = npad // CHUNK
    nt = index.blocks_sweep.shape[0]
    w = index.blocks_sweep.shape[1]
    wt = pick_window_tiles(nt, npad, w)
    nwin = nt // wt
    spos, spay = jax.lax.sort_key_val(pos, pay)
    out_shapes = (
        jax.ShapeDtypeStruct((nchunks // 8, 8, CHUNK), jnp.uint32),
        jax.ShapeDtypeStruct((nchunks // 8, 8, CHUNK), jnp.uint32),
    )
    if USE_ANCHORED:
        S = _anchored_block_tiles(nt, npad, w)
        first = (spos[::CHUNK] >> 8).astype(jnp.int32)
        last = (spos[CHUNK - 1 :: CHUNK] >> 8).astype(jnp.int32)
        an, covered_c = _anchors_for(first, last, nt, S)
        step_s, mark_s = pl.pallas_call(
            _backstep_kernel_anchored(
                index.alphabet, index.mark_offset, index.alphabet.ambiguity_idx, S, nchunks
            ),
            grid_spec=_anchored_grid_spec(nchunks, w, n_req=1, n_out=2, S=S),
            out_shape=out_shapes,
            interpret=interp,
        )(an, index.prefix_sums, spos.reshape(nchunks // 8, 8, CHUNK),
          index.blocks_sweep)
    else:
        win, covered_c = _chunk_windows(spos, wt)
        step_s, mark_s = pl.pallas_call(
            _backstep_kernel(index.alphabet, index.mark_offset, index.alphabet.ambiguity_idx, wt),
            grid_spec=_grid_spec(nchunks, nwin, w, n_req=1, n_out=2, wt=wt),
            out_shape=out_shapes,
            interpret=interp,
        )(win, index.prefix_sums, spos.reshape(nchunks // 8, 8, CHUNK),
          index.blocks_sweep, index.blocks_sweep)
    stepped, mark = step_s.reshape(-1), mark_s.reshape(-1)

    # Whole-chunk coverage fixup (see _chunk_budget): walk visits routinely
    # produce LF-band-boundary chunks, so the budget path is the norm here,
    # and the full fallback below triggers only on budget overflow.
    bc = _chunk_budget(nchunks)
    fcidx, fvalid, overflow = _compact_flagged_chunks(covered_c, bc)
    spos2 = spos.reshape(nchunks, CHUNK)
    fpos = spos2[fcidx].reshape(-1)
    rows_f = fetch_rows_t(index, fpos)
    st_f = backstep_from_rows_t(index, rows_f, fpos)
    mk_f = (_mark_rank_t(index, rows_f, fpos) << 1) | _mark_bit_t(index, rows_f, fpos)
    dst = jnp.where(fvalid, fcidx, nchunks)
    stepped = (
        stepped.reshape(nchunks, CHUNK)
        .at[dst]
        .set(st_f.reshape(bc, CHUNK), mode="drop")
        .reshape(-1)
    )
    mark = (
        mark.reshape(nchunks, CHUNK)
        .at[dst]
        .set(mk_f.reshape(bc, CHUNK), mode="drop")
        .reshape(-1)
    )

    def fallback():
        cov = jnp.broadcast_to(covered_c[:, None], (nchunks, CHUNK)).reshape(-1)
        rows_t = fetch_rows_t(index, spos)
        st = backstep_from_rows_t(index, rows_t, spos)
        mk = (_mark_rank_t(index, rows_t, spos) << 1) | _mark_bit_t(index, rows_t, spos)
        return jnp.where(cov, stepped, st), jnp.where(cov, mark, mk)

    stepped, mark = jax.lax.cond(overflow, fallback, lambda: (stepped, mark))
    return spos, spay, stepped, mark


def marked_walk_sweep(index: FmDeviceIndex, rows: jax.Array) -> jax.Array:
    """Marked LF-walk (ops/locate.py._marked_walk semantics) with every row
    visit served by the fused sweep backstep kernel; returns text positions.

    The whole walk runs in the sorted-request domain: each visit re-sorts by
    the current row (positions scatter after an LF step), while the original
    request id plus the per-lane (steps, done) state ride in the sort payload
    - so the per-visit cost is ONE sort + one kernel, and the request order
    is restored by a single unsort at the very end."""
    from .locate import _text_pos_mod

    interp = _auto_interpret()
    r = rows.shape[0]
    nchunks = (-(-r // CHUNK) + 7) // 8 * 8
    npad = nchunks * CHUNK
    # Payload: (orig id << shift) | (steps << 1) | done.
    shift = max(2, (index.mark_ratio - 1).bit_length() + 1)
    steps_mask = (1 << shift) - 2  # bits [1, shift)
    idx = jnp.arange(npad, dtype=jnp.int32)
    pos = jnp.where(idx < r, _pad_to(rows, npad), rows[r - 1])
    pay = idx << shift

    def body(_, carry):
        pos, pay = carry
        spos, spay, stepped, mark = _sweep_visit(index, pos, pay, interp)
        was_done = (spay & 1) == 1
        done = was_done | ((mark & jnp.uint32(1)) == 1)
        new_pos = jnp.where(done, spos, stepped)
        new_pay = spay + jnp.where(was_done, 0, jnp.where(done, 1, 2))
        return new_pos, new_pay

    pos, pay = jax.lax.fori_loop(0, index.mark_ratio - 1, body, (pos, pay))
    # Final visit: the current row is marked (or the walk hit its bound);
    # its mark_rank indexes text_sampled_sa directly.
    spos, spay, _stepped, mark = _sweep_visit(index, pos, pay, interp)
    sa_vals = index.text_sampled_sa[(mark >> 1).astype(jnp.int32)]
    steps = ((spay & steps_mask) >> 1).astype(jnp.uint32)
    text_pos = _text_pos_mod(sa_vals, steps, index.bwt_len)
    _, out = jax.lax.sort_key_val(spay, text_pos)
    return out[:r]


@functools.partial(jax.jit, static_argnames=("interpret",))
def backstep_mark_sweep(index: FmDeviceIndex, rows: jax.Array, *, interpret: bool = False):
    """One fused marked-walk visit per row via the sorted sweep.

    Returns (stepped uint32 [R], packed uint32 [R] = (mark_rank << 1) |
    mark_bit, covered bool [R])."""
    r = rows.shape[0]
    val = jnp.arange(r, dtype=jnp.int32) << _VAL_SHIFT
    nt = index.blocks_sweep.shape[0]
    w = index.blocks_sweep.shape[1]
    wt = pick_window_tiles(nt, r, w)
    spos, sval, win, covered_c, nchunks = _sorted_chunks(rows, val, wt)
    nwin = nt // wt
    out_shapes = (
        jax.ShapeDtypeStruct((nchunks // 8, 8, CHUNK), jnp.uint32),
        jax.ShapeDtypeStruct((nchunks // 8, 8, CHUNK), jnp.uint32),
    )
    if USE_ANCHORED:
        S = _anchored_block_tiles(nt, r, w)
        first = (spos[::CHUNK] >> 8).astype(jnp.int32)
        last = (spos[CHUNK - 1 :: CHUNK] >> 8).astype(jnp.int32)
        an, covered_c = _anchors_for(first, last, nt, S)
        step_s, mark_s = pl.pallas_call(
            _backstep_kernel_anchored(
                index.alphabet, index.mark_offset, index.alphabet.ambiguity_idx, S, nchunks
            ),
            grid_spec=_anchored_grid_spec(nchunks, w, n_req=1, n_out=2, S=S),
            out_shape=out_shapes,
            interpret=interpret,
        )(
            an,
            index.prefix_sums,
            spos.reshape(nchunks // 8, 8, CHUNK),
            index.blocks_sweep,
        )
    else:
        step_s, mark_s = pl.pallas_call(
            _backstep_kernel(index.alphabet, index.mark_offset, index.alphabet.ambiguity_idx, wt),
            grid_spec=_grid_spec(nchunks, nwin, w, n_req=1, n_out=2, wt=wt),
            out_shape=out_shapes,
            interpret=interpret,
        )(
            win,
            index.prefix_sums,
            spos.reshape(nchunks // 8, 8, CHUNK),
            index.blocks_sweep,
            index.blocks_sweep,
        )
    stepped, mark = step_s.reshape(-1), mark_s.reshape(-1)
    from .locate import _mark_bit_t, _mark_rank_t
    from .rank import backstep_from_rows_t, fetch_rows_t

    bc = _chunk_budget(nchunks)
    fcidx, fvalid, overflow = _compact_flagged_chunks(covered_c, bc)
    fpos = spos.reshape(nchunks, CHUNK)[fcidx].reshape(-1)
    rows_f = fetch_rows_t(index, fpos)
    st_f = backstep_from_rows_t(index, rows_f, fpos)
    mk_f = (_mark_rank_t(index, rows_f, fpos) << 1) | _mark_bit_t(index, rows_f, fpos)
    dst = jnp.where(fvalid, fcidx, nchunks)
    stepped = (
        stepped.reshape(nchunks, CHUNK)
        .at[dst]
        .set(st_f.reshape(bc, CHUNK), mode="drop")
        .reshape(-1)
    )
    mark = (
        mark.reshape(nchunks, CHUNK)
        .at[dst]
        .set(mk_f.reshape(bc, CHUNK), mode="drop")
        .reshape(-1)
    )
    cov_c = covered_c | jnp.logical_not(overflow)
    cov_s = jnp.broadcast_to(cov_c[:, None], (nchunks, CHUNK)).reshape(-1)
    stepped, mark, cov = _unsort(sval, stepped, mark, cov_s)
    return stepped[:r], mark[:r], cov[:r]


# ---------------------------------------------------------------------------
# Text window sweep: K consecutive packed-text words per request
# ---------------------------------------------------------------------------

def _text_kernel(wt: int, nr: int, k: int):
    """Emit word (wbase - j) for j in 0..k-1, where wbase = anchor*8 + off
    + k - 1, from `nr` consecutive 8-word text rows selected per lane."""

    def kernel(cw_ref, row_ref, off_ref, winA_ref, winB_ref, *out_refs):
        c = pl.program_id(0)
        r = c % 8
        base = cw_ref[c] * (wt * CHUNK)
        anchor = row_ref[0, r, :][None, :].astype(jnp.int32) - base  # [1, 128]
        o = off_ref[0, r, :].astype(jnp.int32)  # [128], in [0, 8)
        rows = [_row_select(winA_ref, winB_ref, anchor + i) for i in range(nr)]
        for j, out in enumerate(out_refs):
            idx = o + (k - 1 - j)  # word slot within the nr-row span
            acc = rows[0][0]
            for i in range(1, nr * 8):
                acc = jnp.where(idx == i, rows[i // 8][i % 8], acc)
            out[0, r, :] = acc

    return kernel


def _anchored_tiles(nt: int, num_requests: int, nr: int, dup: int = 1) -> int:
    """Static per-chunk ANCHORED window size in tiles (non-pow2) for the
    8-word-row text/window sweeps: mean chunk span x variance headroom
    (chunk spans are ~Erlang(CHUNK/dup); see _anchored_want) + nr straddle
    rows + 1 alignment tile.  Chunks whose span still exceeds S take the
    standard coverage fixup."""
    return min(_anchored_want(nt, num_requests, nr, dup), _anchored_cap(nt, 8))


def _anchored_text_kernel(S: int, nr: int, k: int, nchunks: int):
    """_text_kernel with a per-chunk anchored window: the row-select chain
    runs over S tiles instead of 2*wt."""

    def kernel(an_ref, row_ref, off_ref, hbm_ref, *out_and_scratch):
        out_refs = out_and_scratch[:k]
        buf_ref, sem_ref = out_and_scratch[k], out_and_scratch[k + 1]
        c, slot = _anchored_dma(an_ref, hbm_ref, buf_ref, sem_ref, S, nchunks)
        r = c % 8
        local_row = (
            row_ref[0, r, :][None, :].astype(jnp.int32) - an_ref[c] * CHUNK
        )  # [1, 128] window-local 8-word-row index
        o = off_ref[0, r, :].astype(jnp.int32)  # [128], in [0, 8)
        rows = _rows_multi_anchored(
            buf_ref, slot, S, [local_row + i for i in range(nr)]
        )
        for j, out in enumerate(out_refs):
            idx = o + (k - 1 - j)
            acc = rows[0][0]
            for i in range(1, nr * 8):
                acc = jnp.where(idx == i, rows[i // 8][i % 8], acc)
            out[0, r, :] = acc

    return kernel


def _occ_pair_kernel_anchored(alphabet, S: int, nchunks: int):
    """_occ_pair_kernel with a per-chunk anchored window (see _anchored_dma);
    both endpoint ranks share each tile load."""

    def kernel(an_ref, ps_ref, pos_ref, posb_ref, sym_ref, hbm_ref,
               occa_ref, occb_ref, buf_ref, sem_ref):
        c, slot = _anchored_dma(an_ref, hbm_ref, buf_ref, sem_ref, S, nchunks)
        r = c % 8
        base = an_ref[c] * CHUNK  # window start in BLOCK units
        sym = sym_ref[0, r, :][None, :]
        pos = pos_ref[0, r, :][None, :]
        posb = posb_ref[0, r, :][None, :]
        rows_a, rows_b = _rows_multi_anchored(
            buf_ref, slot, S,
            [(pos >> 8).astype(jnp.int32) - base, (posb >> 8).astype(jnp.int32) - base],
        )
        occa_ref[0, r, :] = _occ_from_rows_t(alphabet, rows_a, pos & jnp.uint32(255), sym)
        occb_ref[0, r, :] = _occ_from_rows_t(alphabet, rows_b, posb & jnp.uint32(255), sym)

    return kernel


def _occ_pair_pay_kernel_anchored(alphabet, S: int, nchunks: int, shift: int, sb: int):
    """_occ_pair_kernel_anchored with the step symbol extracted from the
    sort PAYLOAD (bits [shift, shift+sb)) instead of a separate request
    operand — the seeded sorted-domain chain (seeded_pair_chain) never
    materializes per-step symbol arrays in request order."""

    def kernel(an_ref, ps_ref, pos_ref, posb_ref, pay_ref, hbm_ref,
               occa_ref, occb_ref, buf_ref, sem_ref):
        c, slot = _anchored_dma(an_ref, hbm_ref, buf_ref, sem_ref, S, nchunks)
        r = c % 8
        base = an_ref[c] * CHUNK
        sym = (pay_ref[0, r, :][None, :] >> shift) & jnp.int32((1 << sb) - 1)
        pos = pos_ref[0, r, :][None, :]
        posb = posb_ref[0, r, :][None, :]
        rows_a, rows_b = _rows_multi_anchored(
            buf_ref, slot, S,
            [(pos >> 8).astype(jnp.int32) - base, (posb >> 8).astype(jnp.int32) - base],
        )
        occa_ref[0, r, :] = _occ_from_rows_t(alphabet, rows_a, pos & jnp.uint32(255), sym)
        occb_ref[0, r, :] = _occ_from_rows_t(alphabet, rows_b, posb & jnp.uint32(255), sym)

    return kernel


def _occ_kernel_anchored(alphabet, S: int, nchunks: int):
    def kernel(an_ref, ps_ref, pos_ref, sym_ref, hbm_ref, occ_ref, buf_ref, sem_ref):
        c, slot = _anchored_dma(an_ref, hbm_ref, buf_ref, sem_ref, S, nchunks)
        r = c % 8
        base = an_ref[c] * CHUNK
        pos = pos_ref[0, r, :][None, :]
        sym = sym_ref[0, r, :][None, :]
        (rows_t,) = _rows_multi_anchored(
            buf_ref, slot, S, [(pos >> 8).astype(jnp.int32) - base]
        )
        occ_ref[0, r, :] = _occ_from_rows_t(alphabet, rows_t, pos & jnp.uint32(255), sym)

    return kernel


def _backstep_kernel_anchored(alphabet, mark_offset, ambiguity_idx, S: int, nchunks: int):
    def kernel(an_ref, ps_ref, pos_ref, hbm_ref, step_ref, mark_ref, buf_ref, sem_ref):
        c, slot = _anchored_dma(an_ref, hbm_ref, buf_ref, sem_ref, S, nchunks)
        r = c % 8
        base = an_ref[c] * CHUNK
        pos = pos_ref[0, r, :][None, :]
        (rows_t,) = _rows_multi_anchored(
            buf_ref, slot, S, [(pos >> 8).astype(jnp.int32) - base]
        )
        local = pos & jnp.uint32(255)
        sym = _symbol_from_rows_t(alphabet, rows_t, local)
        is_sentinel = sym == 0
        safe = jnp.where(is_sentinel, ambiguity_idx, sym)
        occ = _occ_from_rows_t(alphabet, rows_t, local, safe)
        stepped = _prefix_select(ps_ref, alphabet.cardinality, safe) + occ - jnp.uint32(1)
        mark_bit = _mark_bit_from_rows_t(mark_offset, rows_t, local)
        mark_rank = _mark_rank_from_rows_t(mark_offset, rows_t, local)
        step_ref[0, r, :] = jnp.where(is_sentinel, jnp.uint32(0), stepped)[0]
        mark_ref[0, r, :] = ((mark_rank << 1) | mark_bit)[0]

    return kernel


def _anchored_grid_spec(nchunks: int, w: int, n_req: int, n_out: int, S: int):
    """PrefetchScalarGridSpec for the anchored rank/backstep kernels: scalar
    prefetch (per-chunk anchor tiles, prefix sums), request/output blocks as
    in _grid_spec, the table as an un-blocked ANY-space input, and the
    double-buffered window scratch + DMA semaphores."""
    req = pl.BlockSpec((1, 8, CHUNK), lambda c, an, ps: (c // 8, 0, 0),
                       memory_space=pltpu.VMEM)
    out = pl.BlockSpec((1, 8, CHUNK), lambda c, an, ps: (c // 8, 0, 0),
                       memory_space=pltpu.VMEM)
    return pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(nchunks,),
        in_specs=[req] * n_req + [pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=tuple(out for _ in range(n_out)) if n_out > 1 else out,
        scratch_shapes=[
            pltpu.VMEM((2, S, w, CHUNK), jnp.uint32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )


def _anchored_cap(nt: int, row_words: int) -> int:
    """VMEM bound on the anchored window: 2 buffers x S x row_words x 128 x
    4 B must stay well inside the ~16 MB/core (<= ~8 MB)."""
    return min(768, (8 << 20) // (2 * CHUNK * row_words * 4), nt)


def _anchored_want(nt: int, num_requests: int, extra: int, dup: int = 1) -> int:
    """Anchored window size before capping.  ``dup``: expected duplication
    factor of the request stream (slot-verify fat reads repeat each lane's
    base row up to WIDE_CAP times).  Duplicates leave the MEAN chunk span
    unchanged but grow its variance — a chunk averages CHUNK/dup distinct
    gaps instead of CHUNK, so cv ~ 1/sqrt(CHUNK/dup) — and an
    under-headroomed window silently fails coverage on the tail (chr20's
    slot regime measured 0.9% of lanes re-dispatching from exactly this
    before dup-aware headroom: 2M requests, ~512k distinct)."""
    import math

    span_tiles = CHUNK * nt / max(1, num_requests)
    headroom = 1.0 + 0.4 * math.sqrt(max(1, dup))
    return max(4, int(-(-headroom * span_tiles // 1)) + extra + 1)


def _anchored_block_tiles(nt: int, num_requests: int, row_words: int) -> int:
    """Anchored window size for BLOCK-row sweeps (rank/backstep): like
    _anchored_tiles but without the text straddle row (each request touches
    exactly one block)."""
    return min(_anchored_want(nt, num_requests, 0), _anchored_cap(nt, row_words))


def _anchors_for(first: jax.Array, last: jax.Array, nt: int, S: int, extra: int = 0):
    """Per-chunk anchor tile + coverage for sorted first/last block(or row)
    ids; `extra` = trailing rows a lane may touch past its anchor (text nr-1)."""
    an = jnp.clip(first >> 7, 0, nt - S).astype(jnp.int32)
    covered_c = (((last + extra) >> 7) - an) < S
    return an, covered_c


def _anchored_text_grid_spec(nchunks: int, S: int, k: int):
    req = pl.BlockSpec((1, 8, CHUNK), lambda c, an: (c // 8, 0, 0),
                       memory_space=pltpu.VMEM)
    out = pl.BlockSpec((1, 8, CHUNK), lambda c, an: (c // 8, 0, 0),
                       memory_space=pltpu.VMEM)
    return pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nchunks,),
        in_specs=[req, req, pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=tuple(out for _ in range(k)),
        scratch_shapes=[
            pltpu.VMEM((2, S, 8, CHUNK), jnp.uint32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )


def _text_grid_spec(nchunks: int, nwin: int, wt: int, k: int):
    req = pl.BlockSpec((1, 8, CHUNK), lambda c, cw: (c // 8, 0, 0),
                       memory_space=pltpu.VMEM)

    def win_map(off):
        return lambda c, cw: (jnp.minimum(cw[c] + off, nwin - 1), 0, 0)

    win = lambda off: pl.BlockSpec(  # noqa: E731
        (wt, 8, CHUNK), win_map(off), memory_space=pltpu.VMEM
    )
    out = pl.BlockSpec((1, 8, CHUNK), lambda c, cw: (c // 8, 0, 0),
                       memory_space=pltpu.VMEM)
    return pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nchunks,),
        in_specs=[req, req, win(0), win(1)],
        out_specs=tuple(out for _ in range(k)),
    )


def text_sweep_suits(index: FmDeviceIndex, num_requests: int) -> bool:
    """True when the text sweep can serve `num_requests` window-covered."""
    return window_sweep_suits(index.text_sweep, num_requests)


def window_sweep_suits(sweep_arr, num_requests: int, dup: int = 1) -> bool:
    """True when window_sweep over this 8-word-row layout can serve
    `num_requests` with guaranteed window coverage (batches too sparse for
    the VMEM-capped window pay the uncovered-fallback cliff instead).
    ``dup``: expected request duplication factor (see _anchored_want)."""
    if sweep_arr is None or num_requests > MAX_SWEEP_REQUESTS:
        return False
    nt = sweep_arr.shape[0]
    if USE_ANCHORED:
        return _anchored_want(nt, num_requests, 2, dup) <= _anchored_cap(nt, 8)
    return pick_window_tiles(nt, num_requests, 8) >= _want_window_tiles(nt, num_requests)


@functools.partial(jax.jit, static_argnames=("k", "interpret"))
def text_window_sweep(index: FmDeviceIndex, wbase: jax.Array, k: int, *, interpret: bool = False):
    """words[i, j] = text_packed[wbase[i] - j] for j in 0..k-1 via the sorted
    sweep over the 8-word-row text layout (index.text_sweep)."""
    return window_sweep(index.text_sweep, index.text_packed, wbase, k, interpret=interpret)


@functools.partial(jax.jit, static_argnames=("k", "interpret", "dup"))
def window_sweep(sweep_arr, flat_arr, wbase: jax.Array, k: int, *, interpret: bool = False, dup: int = 1):
    """words[i, j] = flat_arr[wbase[i] - j] for j in 0..k-1 via the sorted
    sweep over `sweep_arr` (build_sweep_blocks of flat_arr viewed as 8-word
    rows).  The generalized random-read engine for ANY HBM-resident table:
    plain XLA gathers are issue-bound (~16-65 ns/row); sorting requests and
    streaming covering row windows through VMEM serves the same reads at
    sweep rates (BASELINE.md).  Serves element reads (k=2, take j=0),
    k-mer seed pairs (wbase=2a+1), and fat verify rows (wbase=8r+7, k=8).

    wbase values are clamped into [k-1, len(flat_arr)); out-of-range lanes
    return in-bounds garbage that callers mask.
    """
    outs, covered_c, sval, swb, nchunks, r = _window_sweep_core(
        sweep_arr, flat_arr.shape[0], wbase, k, interpret, dup
    )

    # Whole-chunk fixup for uncovered chunks (see _chunk_budget).
    bc = _chunk_budget(nchunks)
    fcidx, fvalid, overflow = _compact_flagged_chunks(covered_c, bc)
    fw = swb.reshape(nchunks, CHUNK)[fcidx].reshape(-1)
    fix = flat_arr[
        fw[:, None].astype(jnp.int32) - jnp.arange(k, dtype=jnp.int32)[None, :]
    ]  # [bc*CHUNK, k]
    dst = jnp.where(fvalid, fcidx, nchunks)
    outs = [
        outs[j]
        .reshape(nchunks, CHUNK)
        .at[dst]
        .set(fix[:, j].reshape(bc, CHUNK), mode="drop")
        .reshape(-1)
        for j in range(k)
    ]

    def full_fallback():
        allfix = flat_arr[
            swb[:, None].astype(jnp.int32) - jnp.arange(k, dtype=jnp.int32)[None, :]
        ]
        cov = jnp.broadcast_to(covered_c[:, None], (nchunks, CHUNK)).reshape(-1)
        return tuple(jnp.where(cov, outs[j], allfix[:, j]) for j in range(k))

    outs = jax.lax.cond(overflow, full_fallback, lambda: tuple(outs))
    unsorted = _unsort(sval, *outs)
    return jnp.stack([u[:r] for u in unsorted], axis=1)


@functools.partial(jax.jit, static_argnames=("flat_len", "k", "interpret", "dup"))
def window_sweep_cov(sweep_arr, flat_len: int, wbase: jax.Array, k: int, *, interpret: bool = False, dup: int = 1):
    """window_sweep WITHOUT a flat fixup array: returns (words [r, k],
    covered bool [r]).  Uncovered lanes hold garbage and must be re-served
    by the caller (the slot-verify path re-dispatches them through the
    classic engine).  Used where the flat copy of a multi-GB table is not
    worth its HBM (slim verify fat rows at chr1 scale)."""
    outs, covered_c, sval, _swb, nchunks, r = _window_sweep_core(
        sweep_arr, flat_len, wbase, k, interpret, dup
    )
    covb = jnp.broadcast_to(covered_c[:, None], (nchunks, CHUNK)).reshape(-1)
    unsorted = _unsort(sval, covb.astype(jnp.uint32), *outs)
    cov = unsorted[0][:r].astype(bool)
    return jnp.stack([u[:r] for u in unsorted[1:]], axis=1), cov


def _window_sweep_core(sweep_arr, flat_len: int, wbase: jax.Array, k: int, interpret: bool, dup: int = 1):
    """Shared sort + Pallas stream of window_sweep / window_sweep_cov.

    Returns (outs list of k flat uint32 arrays in SORTED order… unsorted by
    sval downstream, covered_c per chunk, sval sort payload, swb sorted
    wbase, nchunks, r)."""
    assert k >= 2
    TRACE_COUNTS["window_sweep"] += 1
    r = wbase.shape[0]
    nt = sweep_arr.shape[0]
    wb = jnp.clip(wbase, jnp.uint32(k - 1), jnp.uint32(flat_len - 1))
    lo = wb - jnp.uint32(k - 1)  # lowest word read; wbase >= TEXT_PAD_WORDS >= k-1
    anchor = lo >> 3
    off = (lo & jnp.uint32(7)).astype(jnp.int32)
    nr = ((k + 6) >> 3) + 1  # rows covering k consecutive words, worst alignment
    wt = pick_window_tiles(nt, r, 8)
    nwin = nt // wt

    # Sort by anchor row; payload (id << 3) | off reconstructs wbase.
    val = (jnp.arange(r, dtype=jnp.int32) << 3) | off
    nchunks = (-(-r // CHUNK) + 7) // 8 * 8
    npad = nchunks * CHUNK
    idx = jnp.arange(npad, dtype=jnp.int32)
    anc_p = jnp.where(idx < r, _pad_to(anchor, npad), anchor[r - 1])
    val_p = jnp.where(idx < r, _pad_to(val, npad), idx << 3)
    sanc, sval = jax.lax.sort_key_val(anc_p, val_p)
    first = sanc[::CHUNK].astype(jnp.int32)
    last = sanc[CHUNK - 1 :: CHUNK].astype(jnp.int32)
    soff = (sval & 7).astype(jnp.int32)

    if USE_ANCHORED:
        # Per-chunk ANCHORED window (manual double-buffered DMA).  The
        # select chain shrinks from 2*wt pow2-rounded tiles to ~1.35x the
        # mean chunk span — the dominant sparse-read cost on the seed-table
        # and SA reads (round-4 roofline note).
        TRACE_COUNTS["window_sweep_anchored"] += 1
        S = _anchored_tiles(nt, r, nr, dup)
        an, covered_c = _anchors_for(first, last, nt, S, extra=nr - 1)
        outs = pl.pallas_call(
            _anchored_text_kernel(S, nr, k, nchunks),
            grid_spec=_anchored_text_grid_spec(nchunks, S, k),
            out_shape=tuple(
                jax.ShapeDtypeStruct((nchunks // 8, 8, CHUNK), jnp.uint32)
                for _ in range(k)
            ),
            interpret=interpret,
        )(
            an,
            sanc.reshape(nchunks // 8, 8, CHUNK),
            soff.reshape(nchunks // 8, 8, CHUNK),
            sweep_arr,
        )
    else:
        win = first // (wt * CHUNK)
        covered_c = (last + (nr - 1) - win * (wt * CHUNK)) < 2 * wt * CHUNK
        outs = pl.pallas_call(
            _text_kernel(wt, nr, k),
            grid_spec=_text_grid_spec(nchunks, nwin, wt, k),
            out_shape=tuple(
                jax.ShapeDtypeStruct((nchunks // 8, 8, CHUNK), jnp.uint32)
                for _ in range(k)
            ),
            interpret=interpret,
        )(
            win,
            sanc.reshape(nchunks // 8, 8, CHUNK),
            soff.reshape(nchunks // 8, 8, CHUNK),
            sweep_arr,
            sweep_arr,
        )
    outs = [o.reshape(-1) for o in outs]
    swb = (sanc.astype(jnp.uint32) << 3) + soff.astype(jnp.uint32) + jnp.uint32(k - 1)
    return outs, covered_c, sval, swb, nchunks, r
