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
from .search import counts_from_ranges, search_ranges

TEXT_PAD_WORDS = 64  # zero words prepended to the device text (device_index.py)


def switch_step(index: FmDeviceIndex) -> int:
    """Consumed-symbol count at which the search hands over to the walk:
    the k-mer seed plus 4 sweep steps (expected residual width n / base^S)."""
    return max(2, index.kmer_len + 4)


def _reverse_symbols(word: jax.Array, bits: int) -> jax.Array:
    """Reverse the symbol order within each uint32 word."""
    w = word
    if bits == 4:
        w = ((w & jnp.uint32(0x0F0F0F0F)) << 4) | ((w >> 4) & jnp.uint32(0x0F0F0F0F))
    # byte swap (bits == 8 needs only this)
    w = ((w & jnp.uint32(0x00FF00FF)) << 8) | ((w >> 8) & jnp.uint32(0x00FF00FF))
    return (w << 16) | (w >> 16)


def compare_text_suffixes(
    index: FmDeviceIndex, e: jax.Array, qsyms: jax.Array, qlens: jax.Array, s: int
) -> jax.Array:
    """True per lane iff text[e - d] == query symbol at distance d from the
    query end, for every d in [s, qlen).  e: uint32[B] anchor positions
    (position of the LAST already-matched symbol); qsyms int32[B, L]
    right-aligned, so the distance-d query symbol is the STATIC column
    L-1-d.

    One K-word backward slice-gather per lane, symbol-reversal + funnel
    alignment into per-distance static slots, then L-s static vector
    compares - no per-lane dynamic indexing anywhere.
    """
    bits = 4 if index.alphabet.cardinality <= 16 else 8
    spw = 32 // bits
    lg = 3 if bits == 4 else 2
    L = qsyms.shape[1]
    K = -(-(L - 1) // spw) + 1
    if K > TEXT_PAD_WORDS:
        raise ValueError(f"padded query length {L} exceeds verify window")

    w_base = (e >> lg).astype(jnp.int32)
    start = w_base - (K - 1) + TEXT_PAD_WORDS  # >= 1: front padding absorbs it
    words = jax.vmap(
        lambda st: jax.lax.dynamic_slice(index.text_packed, (st,), (K,))
    )(start)  # [B, K]; words[:, K-1] contains e

    # Reverse into an ascending-distance stream, then align so distance d
    # sits at slot d: a = spw-1 - (e % spw) symbols of lead-in to drop.
    rev = _reverse_symbols(words[:, ::-1], bits)  # [B, K]; rev[:, 0] holds e's word
    a = (jnp.uint32(spw - 1) - (e & jnp.uint32(spw - 1))).astype(jnp.uint32)
    sh = (a * bits).astype(jnp.uint32)
    aligned = []
    for j in range(K - 1):
        lo = rev[:, j] >> sh
        hi = jnp.where(sh == 0, jnp.uint32(0), rev[:, j + 1] << (jnp.uint32(32) - sh))
        aligned.append(lo | hi)

    mask_sym = jnp.uint32((1 << bits) - 1)
    ok = jnp.ones(e.shape, dtype=bool)
    for d in range(s, L):
        tsym = (aligned[d // spw] >> jnp.uint32(bits * (d % spw))) & mask_sym
        qsym = qsyms[:, L - 1 - d].astype(jnp.uint32)
        ok = ok & ((tsym == qsym) | (d >= qlens))
    return ok


def count_locate_verify(
    index: FmDeviceIndex, qsyms: jax.Array, qlens: jax.Array, s: int
):
    """Fused seed-walk-verify count+locate in one device dispatch.

    Returns (counts uint32[B], text_pos uint32[B], wide bool[B]):
    * wide lanes (width >= 2 at step ``s`` and qlen > s) report their
      PARTIAL width as count and must be re-dispatched through the classic
      path by the caller;
    * all other lanes are final: count is exact, and lanes with
      count == 1 and qlen > s have their (unique) global match position in
      text_pos.  Lanes with qlen <= s report final counts but NO positions
      (the caller walks their ranges classically); callers that serve
      fixed-length reads longer than ``s`` never hit that case.
    Also returns (starts, ends) of the step-``s`` ranges for that walk.
    """
    starts, ends = search_ranges(index, qsyms, qlens, num_steps=s)
    width = counts_from_ranges(starts, ends)
    long_enough = qlens > s
    candidate = (width == 1) & long_enough
    wide = (width >= 2) & long_enough

    rows = jnp.where(candidate, starts, jnp.uint32(0))  # row 0 is marked
    p = lf_walk(index, rows)
    rem = jnp.where(long_enough, qlens - s, 0).astype(jnp.uint32)
    e = p + jnp.uint32(s - 1)
    matches = compare_text_suffixes(index, e, qsyms, qlens, s)
    verified = candidate & matches & (p >= rem)
    counts = jnp.where(candidate, verified.astype(jnp.uint32), width)
    text_pos = p - rem
    return counts, text_pos, wide, starts, ends
