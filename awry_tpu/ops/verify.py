"""Seed-walk-verify: the HBM-regime fused count+locate serving path.

The classic path (ops/search.py + ops/locate.py) pays one rank sweep per
consumed symbol - ~17 sweeps for a 30 bp query after a k=13 seed, ~87 for
the 100 bp queries GRCh38 serving wants.  But on genome-scale indexes the
range collapses almost immediately: after S = kmer_len + 4 consumed
symbols the expected width is n / 4^S << 1, so almost every query is down
to a SINGLE candidate row.  This module stops the backward search at S,
walks that one row to its text position (the bounded marked walk), and
confirms the remaining qlen - S query symbols by comparing them directly
against the original packed text - replacing ~qlen - S rank sweeps with
one walk + one word-gather + static vector compares, and making locate
FREE for verified hits (the match position falls out of the walk).

The reference has no analog (its per-query loop always finishes the
search, src/fm_index.rs:402-438); this trade only makes sense on hardware
where rank steps are batch-global sweeps.  Results are exact:

* width == 0 at S, or qlen <= S: the search already finished; the range
  IS the final answer.
* width == 1 and qlen > S: the unique candidate for the query's last S
  symbols; the full query occurs iff the text just before the candidate
  suffix equals the query's remaining prefix (verified here).  Count is
  0/1, position p - (qlen - S).
* width >= 2 and qlen > S ("wide": repetitive seeds): flagged; the engine
  re-dispatches just those queries through the classic full-depth path.

Text layout: FmIndexData.text_packed - symbol indices at 4 bits
(cardinality <= 16) or 8 bits, little-endian within uint32 words, with
TEXT_PAD_WORDS zero words PREPENDED on device so the per-lane backward
window gather never clamps (zero = sentinel, which never matches a query
symbol; out-of-range distances are masked anyway).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .device_index import FmDeviceIndex
from .locate import lf_walk
from .search import counts_from_ranges, search_ranges_t

TEXT_PAD_WORDS = 64  # zero words prepended to the device text (device_index.py)


# Expected spurious candidates per lane at the search->walk handover.  Each
# +1 of allowed expectation costs wide-group slots (P(width >= 2) ~= the
# expectation for small values, and wide_groups budgets batch/16) but SAVES
# one full batch-wide rank sweep per 4x: 0.06 cuts one sweep step on
# chr20/chr1/GRCh38 (8.8 ms/step on chr1-scale, scripts/ -> BASELINE.md)
# while E. coli and amino switch steps stay put.
SPURIOUS_TARGET = 0.06


def switch_step(index: FmDeviceIndex) -> int:
    """Consumed-symbol count at which the search hands over to the walk.

    Scale-aware: deep enough that the expected residual range width on
    random text, bwt_len / base^S, drops under SPURIOUS_TARGET — then the
    wide-lane fraction (~= that expectation for small values) stays inside
    the on-device wide_groups budget (batch/32) and classic-path
    redispatches are rare at every index scale.  A fixed ``kmer_len + 4``
    undershoots at GRCh38 scale (3.1e9 / 4^17 ~= 0.18 -> ~16% wide lanes,
    mass redispatch of 100 bp queries) and overshoots on small or amino
    indexes (wasted rank sweeps).  Never below the k-mer seed: the seed is
    a single gather, so stopping earlier saves nothing.
    """
    import math

    base = max(2, index.alphabet.cardinality - 2)  # dense searchable symbols
    need = math.ceil(math.log(max(2.0, index.bwt_len / SPURIOUS_TARGET), base))
    return max(2, index.kmer_len, need)


def _reverse_symbols(word: jax.Array, bits: int) -> jax.Array:
    """Reverse the symbol order within each uint32 word."""
    w = word
    if bits == 4:
        w = ((w & jnp.uint32(0x0F0F0F0F)) << 4) | ((w >> 4) & jnp.uint32(0x0F0F0F0F))
    # byte swap (bits == 8 needs only this)
    w = ((w & jnp.uint32(0x00FF00FF)) << 8) | ((w >> 8) & jnp.uint32(0x00FF00FF))
    return (w << 16) | (w >> 16)


def compare_text_suffixes_t(
    index: FmDeviceIndex, e: jax.Array, qt: jax.Array, qlens: jax.Array, s: int
) -> jax.Array:
    """True per lane iff text[e - d] == query symbol at distance d from the
    query end, for every d in [s, qlen).  e: uint32[B] anchor positions
    (position of the LAST already-matched symbol); qt int32[L, B]
    TRANSPOSED right-aligned queries, so the distance-d query symbol is the
    STATIC row L-1-d.

    Three backends for the K-word backward window read, fastest available
    first; then funnel alignment into per-distance static slots and L-s
    static vector compares - no per-lane dynamic indexing anywhere:

    * ``text_rows8`` (VMEM-regime indexes): ONE row gather from the
      pre-symbol-reversed, stride-4 overlapping 8-word-row text layout
      (device_index.py) + per-lane select chains over the 8 sublanes.
      Covers windows up to 5 words (any 5 consecutive words fit one
      stride-4 row); element gathers are issue-bound at ~65M words/s on a
      v5e while row gathers stream (scripts/micro_vmem_layouts.py: 17.5 ms
      -> ~2 ms per 512k batch).
    * sorted text sweep (HBM-regime indexes with the sweep layout).
    * flat element gather (fallback; also the CPU-test path).
    """
    bits = 4 if index.alphabet.cardinality <= 16 else 8
    spw = 32 // bits
    lg = 3 if bits == 4 else 2
    L = qt.shape[0]
    # Only distances d in [s, L) are compared (the search already matched
    # the last s symbols), so only backward words jlo..jhi around e are
    # needed: aligned[d//spw] reads rev[j] and rev[j+1] for j = d//spw.
    jlo = s // spw
    jhi = (L - 1) // spw + 1
    if jhi > TEXT_PAD_WORDS:
        raise ValueError(f"padded query length {L} exceeds verify window")

    # rev_at(j) is the symbol-reversed text word at index (e>>lg) - j.
    from .sweep import _auto_interpret, text_sweep_suits, text_window_sweep

    K = jhi - jlo + 1
    if index.text_rows8 is not None and K <= 5:
        # Window words w in [wb-jhi, wb-jlo]; the stride-4 row r covers
        # words [4r, 4r+8), and (a & 3) + K <= 3 + 5 <= 8 guarantees the
        # whole window sits in row (a >> 2) for a = wb - jhi.
        wb = (e >> lg) + jnp.uint32(TEXT_PAD_WORDS)
        a = wb - jnp.uint32(jhi)
        rows_t = index.text_rows8[(a >> 2).astype(jnp.int32)].T  # [8, B]
        o = (a & jnp.uint32(3)).astype(jnp.int32)

        def rev_at(j):
            idx = o + (jhi - j)  # in [0, 7]
            out = rows_t[0]
            for t in range(1, 8):
                out = jnp.where(idx == t, rows_t[t], out)
            return out

    else:
        if text_sweep_suits(index, e.shape[0]):
            wb = ((e >> lg) + jnp.uint32(TEXT_PAD_WORDS)) - jnp.uint32(jlo)
            words = text_window_sweep(index, wb, K, interpret=_auto_interpret())
        else:
            w_base = (e >> lg).astype(jnp.int32) + TEXT_PAD_WORDS
            cols = jnp.arange(jlo, jhi + 1, dtype=jnp.int32)  # ascending j
            words = index.text_packed[w_base[:, None] - cols[None, :]]  # [B, K]
        rev = _reverse_symbols(words, bits)

        def rev_at(j):
            return rev[:, j - jlo]

    # Align so distance d sits at slot d: a = spw-1 - (e % spw) symbols of
    # lead-in to drop from the reversed stream.
    a_sh = (jnp.uint32(spw - 1) - (e & jnp.uint32(spw - 1))).astype(jnp.uint32)
    sh = (a_sh * bits).astype(jnp.uint32)
    aligned = {}
    for j in range(jlo, jhi):
        lo = rev_at(j) >> sh
        hi = jnp.where(sh == 0, jnp.uint32(0), rev_at(j + 1) << (jnp.uint32(32) - sh))
        aligned[j] = lo | hi

    mask_sym = jnp.uint32((1 << bits) - 1)
    ok = jnp.ones(e.shape, dtype=bool)
    for d in range(s, L):
        tsym = (aligned[d // spw] >> jnp.uint32(bits * (d % spw))) & mask_sym
        qsym = qt[L - 1 - d].astype(jnp.uint32)
        ok = ok & ((tsym == qsym) | (d >= qlens))
    return ok


def compare_text_suffixes(
    index: FmDeviceIndex, e: jax.Array, qsyms: jax.Array, qlens: jax.Array, s: int
) -> jax.Array:
    """Row-major [B, L] compat wrapper over compare_text_suffixes_t."""
    return compare_text_suffixes_t(index, e, qsyms.T.astype(jnp.int32), qlens, s)


WIDE_CAP = 4  # candidate rows verified per wide lane inside the fused kernel
# Slot-verify extended pass: lanes whose seed width is WIDE_CAP+1..SLOT_EXT
# verify through ext_groups(B) compacted groups of SLOT_EXT candidate slots
# (count_locate_slots_t) instead of re-dispatching.
SLOT_EXT = 8


def ext_groups(batch: int) -> int:
    """Extended-slot budget: ~2% of lanes sit in the WIDE_CAP+1..SLOT_EXT
    width band at slot-regime depths (Poisson tail of the ~1 expected seed
    width); batch/32 groups give 1.6x headroom at the recorded chr20 rate.
    Overflow lanes fall back to the classic redispatch."""
    return max(16, batch // 32)


def wide_groups(batch: int) -> int:
    """Compacted wide-lane budget: lanes whose step-``s`` range is 2..WIDE_CAP
    wide are settled on device through this many group slots (~6% of the
    batch matches SPURIOUS_TARGET's wide-lane rate with headroom; overflow
    just falls back to the classic redispatch)."""
    return max(16, batch // 16)


def _read_fat(index: FmDeviceIndex, rows_flat: jax.Array, rw: int, dup: int = 1):
    """(fat [N, rw] word rows in ascending word order, covered bool [N]) for
    flat candidate BWT-row ids, from whichever fat source this batch shape
    reaches: sorted sweep with flat fixup (VMEM regime) > sweep with
    coverage flags (HBM slim regime) > dense gather > coordinate gather
    from the tiled layout (tiny/hyper-sparse batches) > none."""
    from .sweep import (
        _auto_interpret,
        window_sweep,
        window_sweep_cov,
        window_sweep_suits,
    )

    nreq = rows_flat.shape[0]
    flat_len = index.bwt_len * rw
    if index.vw_sweep is not None and window_sweep_suits(index.vw_sweep, nreq, dup):
        wbase = (rows_flat * jnp.uint32(rw)) | jnp.uint32(rw - 1)
        if index.vw_flat is not None:
            words = window_sweep(
                index.vw_sweep, index.vw_flat, wbase, rw,
                interpret=_auto_interpret(), dup=dup,
            )
            return words[:, ::-1], jnp.ones((nreq,), dtype=bool)
        words, cov = window_sweep_cov(
            index.vw_sweep, flat_len, wbase, rw,
            interpret=_auto_interpret(), dup=dup,
        )
        return words[:, ::-1], cov
    if index.verify_windows is not None:
        fat = index.verify_windows[rows_flat.astype(jnp.int32), :rw]
        return fat, jnp.ones((nreq,), dtype=bool)
    if index.vw_sweep is not None:
        # Sweep-unsuitable shape with only the tiled layout shipped: the
        # tiled layout is a permutation of the flat words — flat[x] =
        # sweep[(x>>3)>>7, x&7, (x>>3)&127] — so a coordinate gather serves
        # it exactly (issue-bound, fine at these request counts).
        x = rows_flat[:, None].astype(jnp.uint32) * jnp.uint32(rw) + jnp.arange(
            rw, dtype=jnp.uint32
        )[None, :]
        r3 = (x >> 3).astype(jnp.int32)
        fat = index.vw_sweep[r3 >> 7, (x & 7).astype(jnp.int32), r3 & 127]
        return fat, jnp.ones((nreq,), dtype=bool)
    return (
        jnp.zeros((nreq, rw), dtype=jnp.uint32),
        jnp.zeros((nreq,), dtype=bool),
    )


def count_locate_verify(
    index: FmDeviceIndex, qsyms: jax.Array, qlens: jax.Array, s: int
):
    """Row-major [B, L] compat wrapper over count_locate_verify_t."""
    return count_locate_verify_t(index, qsyms.T.astype(jnp.int32), qlens, s)


def count_locate_verify_t(
    index: FmDeviceIndex, qt: jax.Array, qlens: jax.Array, s: int, *, no_sentinel: bool = False
):
    """Fused seed-walk-verify count+locate in one device dispatch.
    qt: int32[L, B] TRANSPOSED right-aligned queries (wire unpackers emit
    this layout directly; ops/search.py); qlens: integer[B] (int32
    canonical; the engine's uint8 length wire promotes safely).

    Returns ``(bundle, starts, ends)``; ``bundle`` is a single packed u8
    buffer (one host transfer; see unpack_verify_bundle) carrying:

    * counts (7-bit clamp): exact for every lane with redis False; lanes
      with count == 1, qlen > s and not wide-settled have their (unique)
      global match position in pos.
    * redis bool[B]: lanes the caller must re-dispatch through the classic
      full-depth path — ranges wider than WIDE_CAP at step ``s`` (or wide
      lanes past the group budget), and qlen <= s lanes with hits (exact
      count but unwalked positions); their clamped counts are discarded.
    * Wide lanes with width 2..WIDE_CAP are settled HERE: their candidate
      rows are compacted into ``wide_groups(B)`` groups of WIDE_CAP slots
      and verified alongside the singleton lanes.  lane_g maps group ->
      lane (>= B = empty); ok_slot marks verified slots (in BWT-row order,
      the reference's hit order, src/fm_index.rs:521); pos_slot their
      positions.
    * (starts, ends): the step-``s`` device ranges (never transferred).
    """
    starts, ends = search_ranges_t(index, qt, qlens, num_steps=s, no_sentinel=no_sentinel)
    width = counts_from_ranges(starts, ends)
    long_enough = qlens > s
    candidate = (width == 1) & long_enough
    wide = (width >= 2) & long_enough

    B = starts.shape[0]
    G = wide_groups(B)

    # Compact wide lanes (width <= WIDE_CAP) into group slots: group g's
    # lane is the g-th fitting lane = first index where the running count
    # reaches g+1 (searchsorted over the monotone cumsum; keys past the
    # total return B = "empty group").  A 512k-lane scatter with ~98% of
    # lanes colliding on a dump slot serializes badly on TPU; this form
    # also stops over-WIDE_CAP lanes from burning group slots.
    fitsable = wide & (width <= WIDE_CAP)
    csum = jnp.cumsum(fitsable.astype(jnp.int32))
    lane_of_group = jnp.searchsorted(
        csum, jnp.arange(1, G + 1, dtype=jnp.int32), side="left"
    ).astype(jnp.int32)
    valid_g = lane_of_group < B
    lane_safe = jnp.where(valid_g, lane_of_group, 0)
    # Dump reads must SPREAD, not pile up: empty groups reading lane 0's
    # row (and non-candidate lanes reading row 0, below) cluster a quarter
    # of the fat-read stream into one spot, diluting the real request
    # density the sorted sweep's window estimator assumes — measured 4.6%
    # uncovered->redis on chr1's slim fat regime before this fix.  Empty
    # groups read evenly spaced rows; their slots are discarded anyway.
    spread_g = (
        jnp.arange(G, dtype=jnp.uint32) * jnp.uint32(max(1, (index.bwt_len - 1) // max(1, G)))
    )
    g_start = jnp.where(valid_g, starts[lane_safe], spread_g)
    g_width = jnp.where(valid_g, width[lane_safe], jnp.uint32(0))
    jslot = jnp.arange(WIDE_CAP, dtype=jnp.uint32)
    slot_valid = jslot[None, :] < g_width[:, None]  # [G, WIDE_CAP]
    # Invalid slots duplicate the group's base row (sorted duplicates ride
    # the same window for free).
    jclip_g = jnp.minimum(jslot[None, :], jnp.maximum(g_width, jnp.uint32(1))[:, None] - 1)
    slot_rows = g_start[:, None] + jclip_g

    # One shared walk + text compare treatment for singleton lanes and wide
    # slots - but compared SEPARATELY: concatenating the repeated slot
    # queries onto qt materializes a second full-batch [L, B+4G] matrix,
    # and each group's WIDE_CAP slots share one query anyway (the [G, CAP]
    # slot compare broadcasts one query read per group).
    # Non-candidate lanes read their own (valid, spread) start row instead
    # of piling up at row 0 — see the dump-spread note above.
    rows_main = jnp.minimum(starts, jnp.uint32(index.bwt_len - 1))
    qt_g = qt[:, lane_safe]  # [L, G]
    l_g = qlens[lane_safe]

    L = qt.shape[0]
    bits = 4 if index.alphabet.cardinality <= 16 else 8
    spw = 32 // bits
    use_fat = (
        (index.verify_windows is not None or index.vw_sweep is not None)
        and index.verify_windows_s == s
        and L <= s + spw * index.verify_windows_w
    )
    cov_main = cov_gok = None
    if use_fat:
        # Fat-row path: ONE gather serves the SA value AND the pre-aligned
        # text window (see FmDeviceIndex.verify_windows) - no LF-walk, no
        # second gather, no funnel.  Served by the sorted sweep when the
        # layout is present; SLIM sweep-only tables (HBM switch-step
        # regime, round 5) flag uncovered lanes, which re-dispatch like any
        # unresolved lane.
        mask_sym = jnp.uint32((1 << bits) - 1)
        w = index.verify_windows_w
        rw = index.vw_row_words
        rows_all = jnp.concatenate([rows_main, slot_rows.reshape(-1)])
        fat_all, cov_all = _read_fat(index, rows_all, rw)
        fat_t = fat_all[:B].T  # [rw, B]
        fat_g = fat_all[B:].reshape(G, WIDE_CAP, rw)
        cov_main = cov_all[:B]
        # A wide group settles only if every USED slot was covered.
        cov_gok = (cov_all[B:].reshape(G, WIDE_CAP) | ~slot_valid).all(axis=1)
        p = fat_t[w]
        matches = jnp.ones(rows_main.shape, dtype=bool)
        p_slot = fat_g[:, :, w]
        ok_slot_cmp = jnp.ones(slot_rows.shape, dtype=bool)
        for d in range(s, L):
            i, t = (d - s) // spw, (d - s) % spw
            sh = jnp.uint32(bits * t)
            qsym = qt[L - 1 - d].astype(jnp.uint32)
            matches = matches & (
                (((fat_t[i] >> sh) & mask_sym) == qsym) | (d >= qlens)
            )
            qsym_g = qt_g[L - 1 - d].astype(jnp.uint32)[:, None]
            ok_slot_cmp = ok_slot_cmp & (
                (((fat_g[:, :, i] >> sh) & mask_sym) == qsym_g) | (d >= l_g)[:, None]
            )
    else:
        rows_all = jnp.concatenate([rows_main, slot_rows.reshape(-1)])
        p_all = lf_walk(index, rows_all)
        p = p_all[:B]
        p_slot = p_all[B:].reshape(G, WIDE_CAP)
        e_all = p_all + jnp.uint32(s - 1)
        qt_all = jnp.concatenate(
            [qt, jnp.repeat(qt_g, WIDE_CAP, axis=1)], axis=1
        )
        l_all = jnp.concatenate([qlens, jnp.repeat(l_g, WIDE_CAP)])
        ok_all = compare_text_suffixes_t(index, e_all, qt_all, l_all, s)
        matches = ok_all[:B]
        ok_slot_cmp = ok_all[B:].reshape(G, WIDE_CAP)

    rem = jnp.where(long_enough, qlens - s, 0).astype(jnp.uint32)
    rem_g = rem[lane_safe]
    verified = candidate & matches & (p >= rem)
    ok_slot = ok_slot_cmp & slot_valid & (p_slot >= rem_g[:, None])
    uncov_cand = jnp.zeros(candidate.shape, dtype=bool)
    if cov_main is not None:
        # Sweep-uncovered fat reads (slim HBM regime): those lanes/groups
        # cannot settle here and re-dispatch like any unresolved lane.
        verified = verified & cov_main
        uncov_cand = candidate & ~cov_main
        valid_g = valid_g & cov_gok
    pos_slot = p_slot - rem_g[:, None]
    wide_counts = ok_slot.sum(axis=1).astype(jnp.uint32)  # [G]

    # Scatter wide-group results back to lanes (dump index B for empties).
    lane_or_dump = jnp.where(valid_g, lane_of_group, B)
    settled_w = (
        jnp.zeros((B + 1,), dtype=bool).at[lane_or_dump].set(valid_g)[:B]
    )
    counts_w = (
        jnp.zeros((B + 1,), dtype=jnp.uint32).at[lane_or_dump].set(wide_counts)[:B]
    )
    counts = jnp.where(candidate, verified.astype(jnp.uint32), width)
    counts = jnp.where(settled_w, counts_w, counts)
    redis = (wide & ~settled_w) | ((counts > 0) & ~long_enough) | uncov_cand
    text_pos = p - rem

    # Pack every host-bound result into ONE buffer: each np.asarray on a
    # separate output pays a full tunnel/PCIe round trip (measured 187 ms
    # for six transfers vs ~45 ms for one on the relay link), and redis
    # lanes' counts are recomputed anyway so a small clamp loses nothing
    # (non-redis counts are exact and <= WIDE_CAP).
    bundle = _pack_result_bundle(
        index, text_pos, counts, redis,
        jnp.where(valid_g, lane_of_group, B), pos_slot, ok_slot,
    )
    return bundle, starts, ends


def _packed_bundle(index: FmDeviceIndex) -> bool:
    """u32-per-lane bundle mode: positions fit 28 bits and exact non-redis
    counts (<= WIDE_CAP) fit 3."""
    return index.bwt_len < (1 << 28) and WIDE_CAP <= 7


def _pack_result_bundle(index, text_pos, counts, redis, lane_of_group, pos_slot, ok_slot):
    """Pack (lane words + wide meta) into the single host-bound buffer (see
    count_locate_verify_t's bundle doc; unpack_verify_bundle is the host
    mirror).  Shared by the switch-step and slot-verify paths."""
    okbits = (
        ok_slot.astype(jnp.uint32) << jnp.arange(WIDE_CAP, dtype=jnp.uint32)[None, :]
    ).sum(axis=1, dtype=jnp.uint32)
    wide_meta = jnp.concatenate(
        [lane_of_group.astype(jnp.uint32)[:, None], pos_slot, okbits[:, None]], axis=1
    )  # [G, 2 + WIDE_CAP]
    if _packed_bundle(index):
        # One u32 per lane: [28b pos | 3b count | 1b redis] - 20% less
        # result wire than the split pos+flags form, and no byte-level
        # relayouts packing it.
        lane_words = (
            (text_pos & jnp.uint32(0x0FFFFFFF))
            | (jnp.minimum(counts, jnp.uint32(7)) << 28)
            | (redis.astype(jnp.uint32) << 31)
        )
        return jnp.concatenate([lane_words, wide_meta.reshape(-1)])
    flags = (
        jnp.minimum(counts, jnp.uint32(127)).astype(jnp.uint8)
        | (redis.astype(jnp.uint8) << 7)
    )
    return jnp.concatenate(
        [
            jax.lax.bitcast_convert_type(text_pos, jnp.uint8).reshape(-1),
            flags,
            jax.lax.bitcast_convert_type(wide_meta, jnp.uint8).reshape(-1),
        ]
    )


def count_locate_slots_t(
    index: FmDeviceIndex, qt: jax.Array, qlens: jax.Array, s: int, *, no_sentinel: bool = False
):
    """Slot-verify fused count+locate: ZERO post-seed rank sweeps.

    Applicable when the k-mer seed alone narrows the expected range width
    to ~1 (slot_regime_capable: bwt_len / base^k small).  The search stops
    AT the seed (s == kmer_len); every lane with 1 <= width <= WIDE_CAP
    verifies ALL its candidate rows directly against the pre-aligned fat
    rows (SLIM 4-word rows in the HBM regime, served by the sorted sweep):
    one fat gather + static word compares per candidate replaces the
    switch-step path's post-seed rank sweeps AND its wide-group machinery.
    Wider lanes (heavy repeats, P ~ Poisson tail of the expected width) and
    sweep-uncovered lanes are flagged for classic re-dispatch.

    Returns the same ``(bundle, starts, ends)`` contract as
    count_locate_verify_t — the engine's unpack/finish paths are shared:
    counts/pos per lane in the lane words, multi-hit (2..WIDE_CAP) lanes'
    per-slot positions in the wide-meta groups.
    """
    assert s == index.kmer_len, "slot path stops the search at the seed"
    starts, ends = search_ranges_t(index, qt, qlens, num_steps=s, no_sentinel=no_sentinel)
    width = counts_from_ranges(starts, ends)
    long_enough = qlens > s
    B = starts.shape[0]
    L = qt.shape[0]
    bits = 4 if index.alphabet.cardinality <= 16 else 8
    spw = 32 // bits
    rw = index.vw_row_words
    w = index.verify_windows_w
    assert L <= s + spw * w, "padded query length exceeds the slot fat window"

    jslot = jnp.arange(WIDE_CAP, dtype=jnp.uint32)
    fits = long_enough & (width >= 1) & (width <= WIDE_CAP)
    slot_valid = fits[:, None] & (jslot[None, :] < width[:, None])  # [B, CAP]
    # Invalid slots DUPLICATE the lane's last valid row instead of pointing
    # at row 0: the sweep sorts requests by position, so duplicates ride the
    # same window for free, while a ~75% pile-up at row 0 makes the real
    # requests look 4x sparser than the coverage estimator assumes (the
    # round-3 all-redis failure mode).
    jclip = jnp.minimum(jslot[None, :], jnp.maximum(width, jnp.uint32(1))[:, None] - 1)
    slot_rows = starts[:, None] + jclip

    # Slot streams repeat each lane's base row up to WIDE_CAP times:
    # dup-aware window headroom (chr20 measured 0.9% uncovered->redis
    # with duplicate-blind sizing).
    fat_flat, cov_flat = _read_fat(index, slot_rows.reshape(-1), rw, dup=WIDE_CAP)
    fat = fat_flat.reshape(B, WIDE_CAP, rw)
    cov = cov_flat.reshape(B, WIDE_CAP)

    mask_sym = jnp.uint32((1 << bits) - 1)
    p_slot = fat[:, :, w]
    ok_cmp = jnp.ones((B, WIDE_CAP), dtype=bool)
    for d in range(s, L):
        i, t = (d - s) // spw, (d - s) % spw
        qsym = qt[L - 1 - d].astype(jnp.uint32)[:, None]
        ok_cmp = ok_cmp & (
            (((fat[:, :, i] >> jnp.uint32(bits * t)) & mask_sym) == qsym)
            | (d >= qlens)[:, None]
        )

    rem = jnp.where(long_enough, qlens - s, 0).astype(jnp.uint32)
    ok = ok_cmp & slot_valid & cov & (p_slot >= rem[:, None])
    pos_adj = p_slot - rem[:, None]
    lane_cov = (cov | ~slot_valid).all(axis=1)
    counts_v = ok.sum(axis=1).astype(jnp.uint32)
    settled = fits & lane_cov

    # Extended slot pass (width WIDE_CAP+1 .. SLOT_EXT): at slot-regime
    # depths the expected seed width is ~1, so the Poisson tail puts ~1-2%
    # of 512k lanes past WIDE_CAP (chr20 recorded redis_rate 0.016) — and
    # each previously forced a synchronous classic re-dispatch per batch,
    # keeping the engine's fast path dark.  Those lanes compact into
    # ext_groups(B) groups of SLOT_EXT candidate slots, verify in THIS
    # dispatch, and settle when at most one candidate survives (true
    # multi-hit extended lanes stay redis: P ~ 1e-5 on unique reads, and
    # their positions would not fit the WIDE_CAP-slot wide-meta).
    ext = long_enough & (width > WIDE_CAP) & (width <= SLOT_EXT)
    Gx = ext_groups(B)
    csum_x = jnp.cumsum(ext.astype(jnp.int32))
    lane_xg = jnp.searchsorted(
        csum_x, jnp.arange(1, Gx + 1, dtype=jnp.int32), side="left"
    ).astype(jnp.int32)
    valid_x = lane_xg < B
    lane_sx = jnp.where(valid_x, lane_xg, 0)
    w_x = jnp.where(valid_x, width[lane_sx], jnp.uint32(0))
    jx = jnp.arange(SLOT_EXT, dtype=jnp.uint32)
    sv_x = jx[None, :] < w_x[:, None]  # [Gx, SLOT_EXT]
    jclip_x = jnp.minimum(jx[None, :], jnp.maximum(w_x, jnp.uint32(1))[:, None] - 1)
    # Empty groups read evenly spaced rows (dump-spread; see
    # count_locate_verify_t) so the sweep's density estimate stays honest.
    spread_x = (
        jnp.arange(Gx, dtype=jnp.uint32)
        * jnp.uint32(max(1, (index.bwt_len - 1) // max(1, Gx)))
    )
    base_x = jnp.where(valid_x, starts[lane_sx], spread_x)
    rows_x = base_x[:, None] + jclip_x
    fat_xf, cov_xf = _read_fat(index, rows_x.reshape(-1), rw, dup=WIDE_CAP)
    fat_x = fat_xf.reshape(Gx, SLOT_EXT, rw)
    cov_x = cov_xf.reshape(Gx, SLOT_EXT)
    qt_x = qt[:, lane_sx]  # [L, Gx]
    l_x = qlens[lane_sx]
    p_x = fat_x[:, :, w]
    okc_x = jnp.ones((Gx, SLOT_EXT), dtype=bool)
    for d in range(s, L):
        i, t = (d - s) // spw, (d - s) % spw
        qsym_x = qt_x[L - 1 - d].astype(jnp.uint32)[:, None]
        okc_x = okc_x & (
            (((fat_x[:, :, i] >> jnp.uint32(bits * t)) & mask_sym) == qsym_x)
            | (d >= l_x)[:, None]
        )
    rem_x = rem[lane_sx]
    ok_x = okc_x & sv_x & cov_x & (p_x >= rem_x[:, None])
    cnt_x = ok_x.sum(axis=1).astype(jnp.uint32)
    lane_cov_x = (cov_x | ~sv_x).all(axis=1)
    settle_xg = valid_x & lane_cov_x & (cnt_x <= 1)
    first_x = jnp.argmax(ok_x, axis=1)
    pos_x = jnp.take_along_axis(p_x - rem_x[:, None], first_x[:, None], axis=1)[:, 0]
    dump_x = jnp.where(settle_xg, lane_xg, B)
    settled_x = jnp.zeros((B + 1,), dtype=bool).at[dump_x].set(settle_xg)[:B]
    counts_x = jnp.zeros((B + 1,), dtype=jnp.uint32).at[dump_x].set(cnt_x)[:B]
    pos_xl = jnp.zeros((B + 1,), dtype=jnp.uint32).at[dump_x].set(pos_x)[:B]

    counts = jnp.where(settled, counts_v, width)
    counts = jnp.where(settled_x, counts_x, counts)
    redis = (long_enough & (width >= 1) & ~(settled | settled_x)) | (
        (width >= 1) & ~long_enough
    )

    first = jnp.argmax(ok, axis=1)
    text_pos = jnp.take_along_axis(pos_adj, first[:, None], axis=1)[:, 0]
    text_pos = jnp.where(settled_x, pos_xl, text_pos)

    # Multi-hit settled lanes carry their per-slot positions through the
    # wide-meta groups (same compaction trick as the switch-step path);
    # budget overflow re-dispatches.
    multi = settled & (counts_v >= 2)
    G = wide_groups(B)
    csum = jnp.cumsum(multi.astype(jnp.int32))
    lane_of_group = jnp.searchsorted(
        csum, jnp.arange(1, G + 1, dtype=jnp.int32), side="left"
    ).astype(jnp.int32)
    valid_g = lane_of_group < B
    lane_safe = jnp.where(valid_g, lane_of_group, 0)
    pos_slot_g = pos_adj[lane_safe]
    ok_g = ok[lane_safe] & valid_g[:, None]
    redis = redis | (multi & (csum > G))
    lane_of_group = jnp.where(valid_g, lane_of_group, B)

    bundle = _pack_result_bundle(
        index, text_pos, counts, redis, lane_of_group, pos_slot_g, ok_g
    )
    return bundle, starts, ends


def unpack_verify_bundle(bundle: "np.ndarray", batch: int, groups: int):
    """Host-side view of count_locate_verify's packed result buffer (u32
    lane-word mode when the buffer dtype is uint32, else the split
    pos+flags u8 mode; the device picked per _packed_bundle).

    Returns (pos uint32[B], counts int64[B], redis bool[B], lane_g int64[G],
    pos_slot uint32[G, WIDE_CAP], ok_slot bool[G, WIDE_CAP])."""
    import numpy as np

    if bundle.dtype == np.uint32:
        lane_words = bundle[:batch]
        pos = lane_words & np.uint32(0x0FFFFFFF)
        counts = ((lane_words >> 28) & 7).astype(np.int64)
        redis = (lane_words >> 31).astype(bool)
        meta = bundle[batch:].reshape(groups, 2 + WIDE_CAP)
    else:
        b4 = 4 * batch
        pos = bundle[:b4].view(np.uint32)
        flags = bundle[b4 : b4 + batch]
        meta = bundle[b4 + batch :].view(np.uint32).reshape(groups, 2 + WIDE_CAP)
        counts = (flags & 0x7F).astype(np.int64)
        redis = (flags >> 7).astype(bool)
    lane_g = meta[:, 0].astype(np.int64)
    pos_slot = meta[:, 1 : 1 + WIDE_CAP]
    ok_slot = ((meta[:, 1 + WIDE_CAP][:, None] >> np.arange(WIDE_CAP)) & 1).astype(bool)
    return pos, counts, redis, lane_g, pos_slot, ok_slot


def unpack_verify_bundle_sharded(bundle: "np.ndarray", batch: int, shards: int):
    """Unpack a data-sharded verify dispatch's result buffer.

    Under shard_map (FmQueryEngine(mesh=...)) each device packs its OWN
    bundle over its local batch/shards lanes; out_specs concatenate them.
    This splits per device, unpacks each, rebases the wide-group lane ids
    to global lane numbers (empties -> batch), and concatenates — callers
    see exactly unpack_verify_bundle's contract for the global batch."""
    import numpy as np

    bl = batch // shards
    gl = wide_groups(bl)
    chunk = bundle.shape[0] // shards
    parts = [
        unpack_verify_bundle(bundle[i * chunk : (i + 1) * chunk], bl, gl)
        for i in range(shards)
    ]
    pos = np.concatenate([p[0] for p in parts])
    counts = np.concatenate([p[1] for p in parts])
    redis = np.concatenate([p[2] for p in parts])
    lane_g = np.concatenate(
        [np.where(p[3] < bl, p[3] + i * bl, batch) for i, p in enumerate(parts)]
    )
    pos_slot = np.concatenate([p[4] for p in parts])
    ok_slot = np.concatenate([p[5] for p in parts])
    return pos, counts, redis, lane_g, pos_slot, ok_slot
