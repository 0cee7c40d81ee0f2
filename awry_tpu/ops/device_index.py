"""Device-resident FM-index: a pytree of jnp arrays living in TPU HBM.

The host FmIndexData (awry_tpu/index.py) converts to this form once; every
query batch then runs against it with vectorized gathers.  Positions, counts
and ranges use uint32 throughout - texts up to 2^32-1 symbols cover every
single-chip config (GRCh38 at 3.1 Gbp included; SURVEY.md section 7 "hard
parts"); beyond that the index must be range-sharded (awry_tpu/parallel).
"""

from __future__ import annotations

import dataclasses
import logging
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

_log = logging.getLogger("awry_tpu.ship")

from ..alphabet import (
    Alphabet,
    code_to_index_table,
    index_to_code_table,
    index_to_dense_table,
)
from ..index import FmIndexData


def _text_pad_words() -> int:
    """ops/verify.py's TEXT_PAD_WORDS (local import: verify imports this
    module).  One source of truth - raising the verify window must also grow
    the device text's front padding, or its backward gather would clamp and
    silently compare wrong text words."""
    from .verify import TEXT_PAD_WORDS

    return TEXT_PAD_WORDS


def fused_row_words(alphabet: Alphabet, has_marks: bool = True) -> int:
    """uint32 words per fused block row: V*8 plane words + cardinality
    milestone words [+ 8 text-sampling mark words + 1 mark milestone],
    padded to a multiple of 8.  Nucleotide: 24+6 -> 32 words = exactly one
    128 B HBM line without marks, 40 words with; amino: 64 / 72 words.
    Indexes without mark data (.awry imports) keep the slimmer row - they
    never read mark words and shouldn't pay +25% per rank for them."""
    raw = alphabet.num_planes * 8 + alphabet.cardinality + (9 if has_marks else 0)
    return -(-raw // 8) * 8


def mark_words_offset(alphabet: Alphabet) -> int:
    """Word offset of the 8 mark words within a fused row (mark milestone
    follows immediately after)."""
    return alphabet.num_planes * 8 + alphabet.cardinality


@partial(jax.tree_util.register_dataclass, data_fields=[
    "blocks", "prefix_sums", "sampled_sa", "text_sampled_sa", "kmer_table", "seq_starts",
    "index_to_code", "code_to_index", "index_to_dense", "blocks_sweep", "text_packed",
    "text_sweep", "text_rows8", "marked_sa8", "verify_windows", "blocks_search",
    "kmer_sweep", "sa_sweep", "vw_sweep", "kmer_flat", "vw_flat",
], meta_fields=["alphabet", "sa_ratio", "bwt_len", "kmer_len", "has_marks", "mark_ratio",
                "verify_windows_s", "verify_windows_w", "vw_row_words"])
@dataclasses.dataclass(frozen=True)
class FmDeviceIndex:
    """jnp mirror of FmIndexData plus the small codec LUTs the kernels need.

    The windowed BWT lives as ONE fused array `blocks[nb, row_words]`: each
    row holds the block's V 256-bit occurrence windows (as V*8 uint32 lanes)
    followed by its per-symbol milestone counts, padded to an HBM-line
    multiple.  A rank query is then a single 128 B (nucleotide) gather - the
    reference reads the same 160 B block but needed no gather engine; on TPU
    one fused row per rank is the difference between one and two
    latency-bound HBM accesses.
    """

    blocks: jax.Array  # uint32 [num_blocks, fused_row_words]
    prefix_sums: jax.Array  # uint32 [cardinality + 1]
    sampled_sa: jax.Array  # uint32 [ceil(bwt_len / sa_ratio)]
    text_sampled_sa: jax.Array  # uint32 [num marked rows]; == sampled_sa when marks absent
    kmer_table: jax.Array  # uint32 [base**kmer_len, 2]
    seq_starts: jax.Array  # uint32 [num_records]
    index_to_code: jax.Array  # uint32 [cardinality]
    code_to_index: jax.Array  # int32 [2**V]
    index_to_dense: jax.Array  # int32 [cardinality]
    alphabet: Alphabet
    sa_ratio: int
    bwt_len: int
    kmer_len: int
    has_marks: bool
    # Text-order mark density: the locate walk is bounded at mark_ratio - 1
    # visits (equals sa_ratio on legacy indexes; see FmIndexData.mark_ratio).
    mark_ratio: int = 8
    # Sweep-engine layout (ops/sweep.py): the same fused rows transposed per
    # 128-block tile, [num_tiles_padded, row_words, 128].  Costs a second
    # copy of the block payload in HBM; built only when the sorted-sweep hot
    # path is enabled (HBM-resident indexes + large batches).  None otherwise.
    blocks_sweep: jax.Array | None = None
    # Packed original text (FmIndexData.text_packed) for the seed-walk-verify
    # serving path (ops/verify.py); None when unavailable (.awry imports).
    text_packed: jax.Array | None = None
    # Sweep layout of the padded text, 8-word rows transposed per 128-row
    # tile: [num_text_tiles, 8, 128] (ops/sweep.py text_window_sweep).  Built
    # with blocks_sweep; costs one extra text-sized copy in HBM.
    text_sweep: jax.Array | None = None
    # Overlapping stride-4 8-word rows of the padded text, each word
    # pre-SYMBOL-REVERSED: row r = rev(padded[4r .. 4r+8]).  The verify
    # compare's backward window read becomes ONE row gather (any <=5
    # consecutive words sit inside one row); element gathers are issue-bound
    # on TPU (scripts/micro_vmem_layouts.py).  Built for VMEM-regime indexes
    # (the HBM regime uses text_sweep); costs 2x the packed text.
    text_rows8: jax.Array | None = None
    # text_sampled_sa reshaped to 8-word rows [ceil(len/8), 8] (zero-padded).
    # The mark_ratio == 1 walk's SA read becomes a row gather + 8-way select
    # instead of an issue-bound element gather.  VMEM-regime only: at HBM
    # scale a 131k-row gather is SLOWER than the element gather (row issues
    # cost ~40 ns there), so big indexes keep the flat read.
    marked_sa8: jax.Array | None = None
    # ROW-indexed pre-aligned verify windows, uint32 [bwt_len, 8]: for BWT
    # row r with SA value p and anchor e = p + s - 1, word i holds the
    # packed text symbols at query-end distances s + spw*i + t in bits
    # bits*t (t in 0..spw-1; out-of-text distances hold 0 = sentinel), and
    # word verify_windows_w holds p itself.  The fused verify's LF-walk +
    # text compare collapse into ONE row gather + static shifts/compares -
    # no SA gather, no funnel alignment, no per-lane selects
    # (scripts/ablate_verify.py: walk+compare were ~16 of 24 ms compute per
    # 512k batch).  Costs 32 B x bwt_len; built for VMEM-regime mark=1
    # indexes only.
    verify_windows: jax.Array | None = None
    verify_windows_s: int = 0  # the switch step the windows were aligned for
    verify_windows_w: int = 0  # window words per row (word index of p)
    # uint32 words per fat row: 8 classic (5 windows + SA + pad), 4 SLIM
    # (3 windows + SA; the slot-verify regime's rows — half the HBM/sweep
    # traffic when the post-seed query tail fits 3 words).
    vw_row_words: int = 8
    # Mark-free copy of the fused rows for SEARCH gathers (planes +
    # milestones only, padded to 32/64 words): rank steps never read mark
    # words, and a nucleotide step moves 20% fewer bytes through the
    # gather (the plane/milestone word offsets are unchanged - marks sit
    # at the row tail).  VMEM-regime only; the walk and sweep keep the
    # full rows.
    blocks_search: jax.Array | None = None
    # Sorted-sweep layouts (ops/sweep.py window_sweep) over three
    # issue-bound random-read tables, each an 8-word-row view of the flat
    # array (costs one extra copy of the table in HBM; built only where
    # the plain gather is the measured bottleneck AND serving batches are
    # dense enough for window coverage):
    #   kmer_sweep - flat k-mer table (k >= 12: 512 MB at k=13);
    #   sa_sweep   - flat text_sampled_sa (mark=1 HBM indexes: the walk
    #                IS one SA read per lane);
    #   vw_sweep   - flat verify_windows (the fat-row gather).
    kmer_sweep: jax.Array | None = None
    sa_sweep: jax.Array | None = None
    vw_sweep: jax.Array | None = None
    # 1-D copies of the k-mer table / verify_windows for window_sweep's
    # fixup reads: an in-graph reshape of a tiled [N, 2]/[N, 8] device
    # array materializes a T(8,128)-padded copy (observed 34 GB for the
    # k=13 table).  Shipped flat from the host instead; present iff the
    # matching sweep layout is.
    kmer_flat: jax.Array | None = None
    vw_flat: jax.Array | None = None

    @property
    def num_planes(self) -> int:
        return self.alphabet.num_planes

    @property
    def plane_words(self) -> int:
        return self.alphabet.num_planes * 8

    @property
    def mark_offset(self) -> int:
        return mark_words_offset(self.alphabet)



def _derive_sweep8(flat: jax.Array) -> jax.Array:
    """On-device 1-D word array -> [NT_pad, 8, 128] sweep layout (mirrors
    ops/sweep.build_sweep_blocks over 8-word rows).

    Uploading the second copy of a multi-GB table through a slow
    host<->device relay costs minutes; deriving it from the already-resident
    flat array is an on-chip relayout.  Shape discipline: every intermediate
    keeps a >=128 minor dimension — an in-graph reshape to [N, 8] materializes
    a T(8,128)-padded temp (16x: observed 14.9 GB for chr1's 1 GB SA flat),
    so the per-word columns are taken as STRIDED SLICES of [NT, 1024] and
    stacked, which XLA lowers without padded temps."""
    from .sweep import CHUNK, sweep_pad_tiles

    n8 = -(-flat.shape[0] // 8)
    nt = sweep_pad_tiles(n8)

    @jax.jit
    def go(f):
        f = jnp.concatenate(
            [f, jnp.zeros(nt * CHUNK * 8 - f.shape[0], dtype=f.dtype)]
        )
        F = f.reshape(nt, CHUNK * 8)  # leading split only; minor dim 1024
        return jnp.stack([F[:, i::8] for i in range(8)], axis=1)

    return go(flat)


_VERIFY_WINDOW_WORDS = 5  # window words per fat row (see verify_windows)

# Row-count ceiling for the VMEM-regime per-BWT-row extras (verify_windows
# fat rows at 32 B/row, marked_sa8 at 4 B/row).  Above it the fat table
# alone reaches GBs (chr1's 250M rows -> 8 GB x3 with its sweep/flat
# copies: an instant HBM OOM) while the HBM regime is served by the sorted
# sweep / walk+compare paths anyway.  16M rows covers every index whose
# block payload is VMEM-ish (E. coli: 4.6M) with headroom.
VMEM_REGIME_MAX_ROWS = 16 * 1024 * 1024

# Slot-verify regime (ops/verify.py count_locate_slots_t): when the k-mer
# seed already narrows the expected range width to ~1, every lane's <=
# WIDE_CAP candidate rows are verified straight off fat rows — zero
# post-seed rank sweeps.  Capable when marks are dense (mark=1: the fat row
# carries the SA value), the expected seed width bwt_len / base^k is small
# enough that few lanes exceed WIDE_CAP candidates, and the SLIM 16 B/row
# fat table fits HBM (chr1's 250M rows -> 4 GB).
SLOT_REGIME_MAX_ROWS = 1 << 28
SLOT_WIDTH_MAX = 1.6


def slot_regime_capable(index: FmIndexData) -> bool:
    base = index.alphabet.num_encoding_symbols
    return (
        index.resolved_mark_ratio == 1
        and index.has_marks
        and index.text_packed is not None
        and index.kmer_len >= 2
        and index.bwt_len <= SLOT_REGIME_MAX_ROWS
        and index.bwt_len <= SLOT_WIDTH_MAX * base**index.kmer_len
    )


def _build_verify_windows(
    index: FmIndexData, inv_sa: np.ndarray, *, s: int | None = None, row_words: int = 8
):
    """Assemble FmDeviceIndex.verify_windows: [bwt_len, row_words] uint32 fat
    rows (row_words-1 pre-aligned window words + the row's SA value; see the
    field doc).

    inv_sa: uint32[bwt_len], SA value per BWT row (text_sampled_sa at
    mark_ratio 1).  Alignment happens HERE, once per index: runtime then
    needs no funnel shifts - the symbol at query-end distance d sits at a
    static bit position of word (d - s) // spw.

    ``s``: the handover step the windows are aligned for (defaults to
    switch_step; the slot-verify regime passes kmer_len).  ``row_words``:
    8 for the classic fat row (5 window words), 4 for the SLIM row (3
    window words + SA) — half the HBM and sweep traffic when the remaining
    query tail fits 3 words (slot regime, 30 bp reads).
    """
    from .verify import switch_step

    card = index.alphabet.cardinality
    bits = 4 if card <= 16 else 8
    spw = 32 // bits
    if s is None:
        s = switch_step(index)
    w = _VERIFY_WINDOW_WORDS if row_words == 8 else row_words - 1
    n_rows = inv_sa.shape[0]
    n_text = index.bwt_len - 1  # text symbols (sentinel excluded)
    n_all = index.bwt_len  # SA values p range over [0, bwt_len)

    # Build in TEXT order first: g[p, i] packs the symbols at positions
    # p - 1 - spw*i - t; one parallel native pass straight off the packed
    # text (the NumPy shifted-slice form did w*spw read-modify-write sweeps
    # over the multi-GB output — minutes at chr1 scale on fault-bound
    # pages).  One parallel row gather then permutes text order -> BWT-row
    # order; the last column g[p, w] = p lands as the row's SA value for
    # free.
    from ..build.suffix_array import fat_rows_native, gather_rows_u32

    g = fat_rows_native(index.text_packed, n_text, bits, n_all, row_words, w)
    if g is None:
        # Pure-NumPy fallback (native library unavailable): unpack the
        # packed text then OR shifted slices per (word, slot).
        tp = index.text_packed.astype(np.uint32)
        syms = np.zeros(tp.shape[0] * spw, dtype=np.uint8)
        for t in range(spw):
            syms[t::spw] = (tp >> np.uint32(bits * t)) & ((1 << bits) - 1)
        syms = syms[:n_text]
        g = np.zeros((n_all, row_words), dtype=np.uint32)
        for i in range(w):
            acc = np.zeros(n_all, dtype=np.uint32)
            for t in range(spw):
                off = 1 + spw * i + t
                if off < n_all:
                    take = min(n_text, n_all - off)
                    acc[off : off + take] |= syms[:take].astype(np.uint32) << np.uint32(bits * t)
            g[:, i] = acc
        g[:, w] = np.arange(n_all, dtype=np.uint32)

    # Pad the row count so the flat view is 8-word divisible (the sweep
    # layout reads 8-word rows); zero pad rows are never addressed (window
    # sweeps clamp wbase to the REAL flat length).
    pad = 1 if (n_rows * row_words) % 8 else 0  # row_words 4: odd n_rows
    fat = gather_rows_u32(g, inv_sa.astype(np.uint32), pad_rows=pad)
    assert fat.shape == (n_rows + pad, row_words)
    return fat, s, w


def _reverse_symbols_np(w: np.ndarray, bits: int) -> np.ndarray:
    """Host mirror of ops/verify._reverse_symbols (symbol order within each
    uint32 word), applied once at index-ship time for text_rows8."""
    w = w.astype(np.uint32)
    if bits == 4:
        w = ((w & np.uint32(0x0F0F0F0F)) << 4) | ((w >> 4) & np.uint32(0x0F0F0F0F))
    w = ((w & np.uint32(0x00FF00FF)) << 8) | ((w >> 8) & np.uint32(0x00FF00FF))
    return (((w << 16) | (w >> 16)) & np.uint32(0xFFFFFFFF)).astype(np.uint32)


def build_fused_blocks(index: FmIndexData) -> np.ndarray:
    """Assemble the fused [num_blocks, row_words] uint32 block array."""
    nb = index.num_blocks
    v = index.alphabet.num_planes
    c = index.alphabet.cardinality
    row_words = fused_row_words(index.alphabet, index.has_marks)
    fused = np.zeros((nb, row_words), dtype=np.uint32)
    fused[:, : v * 8] = index.planes.reshape(nb, v * 8)
    fused[:, v * 8 : v * 8 + c] = index.milestones.astype(np.uint32)
    if index.has_marks:
        off = mark_words_offset(index.alphabet)
        fused[:, off : off + 8] = index.mark_bits
        fused[:, off + 8] = index.mark_milestones
    return fused


def to_device(
    index: FmIndexData,
    *,
    sharding=None,
    device=None,
    build_sweep: bool = False,
    minimal: bool = False,
    ship_row_sa: bool | None = None,
    lean: bool = False,
) -> FmDeviceIndex:
    """Ship a host index to the device(s).

    `sharding`: optional dict component-name -> jax.sharding.Sharding to
    place arrays (used by awry_tpu.parallel for replication/range-sharding);
    `device`: optional single jax.Device to pin every array to (used by
    PartitionedFmIndex to spread partitions across local devices); default
    is single-device placement by jnp.asarray.  `build_sweep` additionally
    ships the transposed-per-tile layout for the sorted-sweep hot path
    (ops/sweep.py; doubles the block payload in HBM).

    `minimal=True` ships only what the rank/backward-search kernels touch
    (fused blocks + prefix sums + codec LUTs); the locate/verify/seed
    tables are 1-element placeholders.  Used by the device k-mer table
    build (ops/kmer.py), whose update_range loop never locates or
    verifies - shipping the full index there cost GBs of dead HBM (and,
    at chr1 scale with mark=1 fat rows, an outright OOM).

    `ship_row_sa`: ship the ROW-sampled SA (bwt_len/sa_ratio uint32s).  The
    marked walk never reads it - only the row-sampled fallback walk does
    (indexes without marks, and ShardedFmEngine's collective backstep walk) -
    so the default (None) ships it iff the index has no marks.  On GRCh38
    the old always-ship was 1.55 GB of dead HBM.

    `lean=True` additionally skips the slim search-row copy (blocks_search,
    ~0.5 B/symbol): rank gathers then read the full fused rows (25% more
    bytes each).  For multi-index deployments (PartitionedFmIndex: four
    2.6 Gbp partitions sharing one chip's HBM) the copy is the difference
    between fitting and RESOURCE_EXHAUSTED.
    """
    if index.bwt_len >= 2**32:
        raise NotImplementedError(
            "this engine is uint32-positioned (texts < 4 Gbp); wider single"
            " indexes route through ops/wide.to_device_wide (FmQueryEngine"
            " does this automatically)"
        )

    t_phase = time.perf_counter()

    def phase(name: str) -> None:
        # Ship observability: genome-scale layout assembly (fat rows, sweep
        # transposes) runs for minutes; INFO-level phase timings make a slow
        # engine construction diagnosable (mirrors build/builder.py).
        nonlocal t_phase
        now = time.perf_counter()
        _log.info("ship phase %-22s %.1fs", name, now - t_phase)
        t_phase = now

    def put(name: str, arr: np.ndarray) -> jax.Array:
        if sharding is not None and not isinstance(sharding, dict):
            return jax.device_put(arr, sharding)  # one sharding for all
        if sharding and name in sharding:
            return jax.device_put(arr, sharding[name])
        if device is not None:
            return jax.device_put(arr, device)
        return jnp.asarray(arr)

    text_sampled = (
        index.text_sampled_sa if index.has_marks else index.sampled_sa
    )
    # Single-device non-CPU placements derive the sweep relayouts ON DEVICE
    # from the already-uploaded base arrays (one upload per table instead of
    # two; through a ~20 MB/s relay that halves multi-GB engine bring-up).
    derive_dev = (
        sharding is None and device is None and jax.default_backend() != "cpu"
    )
    fused = build_fused_blocks(index)
    phase("fused blocks")
    if minimal:
        dummy = np.zeros(1, dtype=np.uint32)
        return FmDeviceIndex(
            blocks=put("blocks", fused),
            prefix_sums=put("prefix_sums", index.prefix_sums.astype(np.uint32)),
            sampled_sa=put("sampled_sa", dummy),
            text_sampled_sa=put("text_sampled_sa", dummy),
            kmer_table=put("kmer_table", np.zeros((1, 2), dtype=np.uint32)),
            seq_starts=put("seq_starts", index.seq_starts.astype(np.uint32)),
            index_to_code=put("index_to_code", index_to_code_table(index.alphabet).astype(np.uint32)),
            code_to_index=put("code_to_index", code_to_index_table(index.alphabet).astype(np.int32)),
            index_to_dense=put("index_to_dense", index_to_dense_table(index.alphabet).astype(np.int32)),
            alphabet=index.alphabet,
            sa_ratio=index.sa_ratio,
            bwt_len=index.bwt_len,
            # kmer_len 0 = "table disabled": the placeholder table must never
            # seed a search (ops/search.py takes the pure backward path).
            kmer_len=0,
            has_marks=index.has_marks,
            mark_ratio=index.resolved_mark_ratio,
        )
    blocks_arr = put("blocks", fused)
    text_packed_arr = (
        put("text_packed", np.concatenate([
            np.zeros(_text_pad_words(), dtype=np.uint32),
            index.text_packed.astype(np.uint32),
        ]))
        if index.text_packed is not None
        else None
    )
    text_sampled_arr = put("text_sampled_sa", text_sampled.astype(np.uint32))
    sweep_arr = None
    text_sweep_arr = None
    text_rows8_arr = None
    if build_sweep:
        from .sweep import build_sweep_blocks

        # blocks_sweep stays host-built: its source is 2-D (no flat device
        # copy to derive from) and it is the smallest sweep layout anyway.
        sweep_arr = put("blocks_sweep", build_sweep_blocks(fused))
        phase("blocks sweep")
        if text_packed_arr is not None:
            if derive_dev:
                text_sweep_arr = _derive_sweep8(text_packed_arr)
            else:
                padded_text = np.concatenate(
                    [np.zeros(_text_pad_words(), dtype=np.uint32),
                     index.text_packed.astype(np.uint32)]
                )
                nw8 = -(-padded_text.shape[0] // 8)
                rows8 = np.zeros((nw8, 8), dtype=np.uint32)
                rows8.reshape(-1)[: padded_text.shape[0]] = padded_text
                text_sweep_arr = put("text_sweep", build_sweep_blocks(rows8))
            phase("text sweep")
    elif index.text_packed is not None and not lean:
        # VMEM-regime verify compare: overlapping stride-4 rows of the
        # padded text, pre-symbol-reversed (see FmDeviceIndex.text_rows8).
        # Skipped under `lean` (2x the packed text: 2.6 GB per pan-genome
        # partition); the compare then takes the flat element gather.
        bits = 4 if index.alphabet.cardinality <= 16 else 8
        padded_text = np.concatenate(
            [np.zeros(_text_pad_words(), dtype=np.uint32),
             index.text_packed.astype(np.uint32)]
        )
        rev = _reverse_symbols_np(padded_text, bits)
        nrows = -(-rev.shape[0] // 4) + 1
        buf = np.zeros(4 * nrows + 4, dtype=np.uint32)
        buf[: rev.shape[0]] = rev
        overlapped = np.lib.stride_tricks.sliding_window_view(buf, 8)[::4]
        text_rows8_arr = put("text_rows8", np.ascontiguousarray(overlapped))
    kmer_sweep_arr = None
    sa_sweep_arr = None
    vw_sweep_arr = None
    kmer_flat_arr = None
    vw_flat_arr = None
    if build_sweep:
        from .sweep import build_sweep_blocks

        def sweep8(flat: np.ndarray) -> np.ndarray:
            n8 = -(-flat.shape[0] // 8)
            flat = np.ascontiguousarray(flat, dtype=np.uint32)
            if flat.shape[0] == n8 * 8:
                rows = flat.reshape(n8, 8)  # view: no multi-GB copy
            else:
                rows = np.zeros((n8, 8), dtype=np.uint32)
                rows.reshape(-1)[: flat.shape[0]] = flat
            return build_sweep_blocks(rows)

        if index.kmer_table.shape[0] * 8 >= 64 * 1024 * 1024:
            # device table size = entries x 2 u32 words (host dtype varies).
            kflat = index.kmer_table.astype(np.uint32).reshape(-1)
            kmer_flat_arr = put("kmer_flat", kflat)
            kmer_sweep_arr = (
                _derive_sweep8(kmer_flat_arr) if derive_dev else put("kmer_sweep", sweep8(kflat))
            )
            phase("kmer sweep")
        if index.resolved_mark_ratio == 1 and index.has_marks:
            sa_sweep_arr = (
                _derive_sweep8(text_sampled_arr)
                if derive_dev
                else put("sa_sweep", sweep8(text_sampled.astype(np.uint32)))
            )
            phase("sa sweep")
    marked_sa8_arr = None
    vw_arr, vw_s, vw_w = None, 0, 0
    vw_row_words = 8
    if build_sweep and slot_regime_capable(index):
        # HBM slot-verify regime: SLIM 4-word fat rows (3 window words +
        # SA) aligned at s = kmer_len, shipped ONLY as the sweep layout —
        # no plain copy, no flat fixup copy (window_sweep_cov flags
        # uncovered lanes for classic re-dispatch instead).  16 B/row:
        # chr1's 250M rows cost 4 GB instead of the classic 3 x 32 B.
        flat = text_sampled.astype(np.uint32)
        vw, vw_s, vw_w = _build_verify_windows(
            index, flat, s=index.kmer_len, row_words=4
        )
        vw_row_words = 4
        phase("slot fat rows")
        from .sweep import build_sweep_blocks as _bsb

        # vw's row count is padded so this flat view is 8-word divisible:
        # no multi-GB pad copy before the tile transpose.
        rows8 = vw.reshape(-1).reshape(-1, 8)
        vw_sweep_arr = put("vw_sweep", _bsb(rows8))
        del vw, rows8
        phase("slot fat sweep")
    # NOTE (round 5): an HBM *switch-step* slim-fat regime — fat rows
    # aligned at the classic switch step for indexes too wide for the slot
    # regime (chr1 at k=13) — was built and MEASURED A LOSS: at 250 Mbp the
    # 655k fat-row requests over a 977k-tile table are sparse (anchored
    # windows ~260 tiles), so the fat sweep's select chain costs as much as
    # the walk + compare sweeps it replaces, and its coverage tail
    # re-dispatched 0.4-4.6% of lanes (device 11.46M -> 11.23M q/s, fast
    # path dark).  E. coli-scale lost ~4% too (13.47M -> 12.92M).  The
    # walk + compare path stays the HBM default; verify.py keeps full
    # support for sweep-only fat via _read_fat (the slot regime uses it).
    if (
        index.resolved_mark_ratio == 1
        and index.has_marks
        and not build_sweep
        # HARD size gate, not a heuristic: these tables cost 4 B (marked_sa8)
        # and 3 x 32 B (verify_windows + its sweep/flat copies) PER BWT ROW -
        # at chr1 scale that is ~25 GB of HBM.  Past the gate the verify path
        # falls back to walk + text compare (exact, just slower).
        and index.bwt_len <= VMEM_REGIME_MAX_ROWS
    ):
        flat = text_sampled.astype(np.uint32)
        n8 = -(-flat.shape[0] // 8)
        sa8 = np.zeros((n8, 8), dtype=np.uint32)
        sa8.reshape(-1)[: flat.shape[0]] = flat
        marked_sa8_arr = put("marked_sa8", sa8)
        if index.text_packed is not None:
            # VMEM-regime windows stay aligned at the classic switch step:
            # rank steps are cheap here (VMEM-resident lane-major rank), so
            # the slot path's extra per-candidate fat fetches LOSE (measured
            # 8.8M -> 6.3M q/s on E. coli).  The slot regime is an
            # HBM-regime trade (build_sweep branch above).
            vw, vw_s, vw_w = _build_verify_windows(index, flat)
            vw_arr = put("verify_windows", vw)
            from .sweep import build_sweep_blocks

            # Fat rows are 8 words already: the sweep layout is a direct
            # per-128-row transpose (serves the fat gather at sweep rates;
            # the 147 MB E. coli table gathers issue-bound at ~16 ns/row).
            vw_sweep_arr = put("vw_sweep", build_sweep_blocks(vw))
            vw_flat_arr = put("vw_flat", np.ascontiguousarray(vw.reshape(-1)))
    blocks_search_arr = None
    if not build_sweep and index.has_marks and not lean:
        slim_words = fused_row_words(index.alphabet, False)
        blocks_search_arr = put(
            "blocks_search", np.ascontiguousarray(fused[:, :slim_words])
        )
    if ship_row_sa is None:
        ship_row_sa = not index.has_marks
    row_sa = (
        index.sampled_sa.astype(np.uint32)
        if ship_row_sa
        else np.zeros(1, dtype=np.uint32)
    )
    phase("aux layouts")
    dev = FmDeviceIndex(
        blocks=blocks_arr,
        blocks_sweep=sweep_arr,
        text_sweep=text_sweep_arr,
        text_rows8=text_rows8_arr,
        marked_sa8=marked_sa8_arr,
        verify_windows=vw_arr,
        verify_windows_s=vw_s,
        verify_windows_w=vw_w,
        vw_row_words=vw_row_words,
        blocks_search=blocks_search_arr,
        kmer_sweep=kmer_sweep_arr,
        sa_sweep=sa_sweep_arr,
        vw_sweep=vw_sweep_arr,
        kmer_flat=kmer_flat_arr,
        vw_flat=vw_flat_arr,
        # TEXT_PAD_WORDS zero words prepended: the verify path's backward
        # window gather never clamps (ops/verify.py).
        text_packed=text_packed_arr,
        prefix_sums=put("prefix_sums", index.prefix_sums.astype(np.uint32)),
        sampled_sa=put("sampled_sa", row_sa),
        text_sampled_sa=text_sampled_arr,
        kmer_table=(
            # kmer_flat IS the same data: ship a placeholder instead of a
            # third copy (2.1 GB at k=14); the seed's sparse-batch fallback
            # reads the flat words (ops/search.py).
            put("kmer_table", np.zeros((1, 2), dtype=np.uint32))
            if kmer_flat_arr is not None
            else put("kmer_table", index.kmer_table.astype(np.uint32))
        ),
        seq_starts=put("seq_starts", index.seq_starts.astype(np.uint32)),
        index_to_code=put("index_to_code", index_to_code_table(index.alphabet).astype(np.uint32)),
        code_to_index=put("code_to_index", code_to_index_table(index.alphabet).astype(np.int32)),
        index_to_dense=put("index_to_dense", index_to_dense_table(index.alphabet).astype(np.int32)),
        alphabet=index.alphabet,
        sa_ratio=index.sa_ratio,
        bwt_len=index.bwt_len,
        kmer_len=index.kmer_len,
        has_marks=index.has_marks,
        mark_ratio=index.resolved_mark_ratio,
    )
    phase("core arrays + upload")
    return dev
