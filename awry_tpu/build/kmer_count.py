"""Counting-based k-mer seed-table construction (host, O(N*k + base**k)).

The table entry for k-mer ``w`` is the BWT row range of suffixes prefixed by
``w`` — which is fully determined by *suffix order truncated to k symbols*:

    start(w) = #{suffixes s : s <_lex w within the first k symbols}
    end(w)   = start(w) + #{suffixes whose first k symbols == w} - 1

So instead of running base**k backward-search range updates over the BWT
(the reference's construction, kmer_lookup_table.rs:121-167; our BFS analogs
in host_engine.populate_kmer_table / ops.kmer.populate_kmer_table_device),
the table can be built directly from the text by a radix histogram:

  1. cnt[a]  = #windows of k encoding symbols with dense address a
               (one O(N*k) rolling-address pass + one bincount);
  2. every remaining suffix (window containing the ambiguity symbol or
     reaching the final virtual sentinel) contributes +1 to start(a) for all
     a ABOVE its lexicographic insert point.  The insert point depends only
     on the digits up to the FIRST non-encoding symbol: a sentinel sorts
     below every encoding symbol, and the ambiguity symbol sorts at a fixed
     rank among them (N between G and T, raw order "$ACGNT"; X between W and
     Y) — so insert = (prefix*b + rank_above) * b**(k-j-1) for first-bad
     digit j, where rank_above = #encoding symbols sorting below ambiguity.
  3. start(a) = exclusive-cumsum(cnt)[a] + #{insert points <= a}.

This is exact (bit-identical to the BFS constructions — pinned by
tests/test_kmer_count.py against host_engine.populate_kmer_table) and turns
the dominant k>=13 build phase from minutes of device range updates into
seconds of host bincounts.  It is the production path in build/builder.py;
the BFS versions remain as oracles and for table (re)construction when only
the BWT is available (io/awry_format.py).
"""

from __future__ import annotations

import numpy as np

from ..alphabet import Alphabet, index_to_dense_table

# Invalid-window insert points are processed in bounded chunks so texts with
# huge ambiguity runs (real genomes' N gaps) never materialize an m x k
# matrix at once.
_INVALID_CHUNK = 1 << 24


def populate_kmer_table_counting(
    text_syms: np.ndarray, alphabet: Alphabet, k: int
) -> np.ndarray:
    """Build the dense k-mer seed table by counting, from the raw text.

    ``text_syms``: uint8 symbol indices of the concatenated text (no
    sentinel; record delimiters are ambiguity symbols per
    io/sequence_io.concat_records).  Returns uint64[base**k, 2] bit-identical
    to host_engine.populate_kmer_table(index).
    """
    if k == 0:  # table disabled: single canonical-empty entry, never read
        return np.array([[1, 0]], dtype=np.uint64)
    b = alphabet.num_encoding_symbols
    n = int(text_syms.shape[0])
    total = b**k
    dense_tab = index_to_dense_table(alphabet)
    # rank_above: #encoding symbols whose raw index sorts below the ambiguity
    # symbol (A,C,G for nucleotide N; 19 aminos below X).
    rank_above = int(
        ((dense_tab >= 0) & (np.arange(dense_tab.shape[0]) < alphabet.ambiguity_idx)).sum()
    )

    # Dense digits over the bwt text (text + one virtual sentinel), padded to
    # n + k so every window start in [0, n] has k digits to read.  Padding and
    # the sentinel are -1: any window touching them takes the invalid path,
    # where only digits before the first -1 matter.
    dense = np.full(n + k, -1, dtype=np.int8)
    dense[:n] = dense_tab[text_syms]
    bad = dense < 0

    # --- valid windows: rolling base-b address + histogram ------------------
    # Window starts [0, n-k] whose k digits are all encoding symbols.
    cnt = np.zeros(total, dtype=np.int64)
    n_starts = n - k + 1  # window starts fully inside the text
    m_invalid_text = 0
    if n_starts > 0:
        badcum = np.zeros(n + k + 1, dtype=np.int64)
        np.cumsum(bad, out=badcum[1:])
        valid = (badcum[k : n_starts + k] - badcum[:n_starts]) == 0
        # Rolling address in int64: addr[i] = sum_j dense[i+j] * b**(k-1-j).
        weights = b ** np.arange(k - 1, -1, -1, dtype=np.int64)
        chunk = max(1 << 26, k)
        for lo in range(0, n_starts, chunk):
            hi = min(lo + chunk, n_starts)
            v = valid[lo:hi]
            if not v.any():
                m_invalid_text += hi - lo
                continue
            addr = np.zeros(hi - lo, dtype=np.int64)
            for j in range(k):
                # digits are >= 0 on valid windows; invalid lanes are garbage
                # and masked out before the bincount.
                np.add(addr, dense[lo + j : hi + j] * weights[j], out=addr)
            cnt += np.bincount(addr[v], minlength=total)
            m_invalid_text += int((~v).sum())
    else:
        valid = np.zeros(0, dtype=bool)

    # --- invalid windows: lexicographic insert points ------------------------
    # Every suffix of the bwt text not counted above: window starts in
    # [0, n-k] with an ambiguity digit, plus all starts in (n-k, n] (they
    # reach the virtual sentinel at position n).  Their contribution to
    # start(a) is +1 for every a >= their insert point.
    inv_hist = np.zeros(total + 1, dtype=np.int64)
    n_tail = n + 1 - max(n_starts, 0)  # starts in (n-k, n]
    m = m_invalid_text + n_tail

    if m:
        if m_invalid_text:
            inv_starts_text = np.flatnonzero(~valid)
        else:
            inv_starts_text = np.zeros(0, dtype=np.int64)
        tail = np.arange(max(n_starts, 0), n + 1, dtype=np.int64)
        inv_starts = np.concatenate([inv_starts_text, tail])
        pow_b = b ** np.arange(k + 1, dtype=np.int64)  # pow_b[j] = b**j
        for lo in range(0, inv_starts.shape[0], _INVALID_CHUNK):
            s = inv_starts[lo : lo + _INVALID_CHUNK]
            win = dense[s[:, None] + np.arange(k, dtype=np.int64)[None, :]].astype(
                np.int64
            )  # [m_c, k]
            is_bad = win < 0
            j = np.argmax(is_bad, axis=1)  # first bad digit (exists by construction)
            # Was the first bad digit the sentinel (position n or padding past
            # it) or the ambiguity symbol?  Sentinel sorts below everything
            # (rank 0); ambiguity at rank_above.
            first_bad_pos = s + j
            is_sentinel = first_bad_pos >= n
            rank = np.where(is_sentinel, 0, rank_above)
            # prefix = digits 0..j-1 as a base-b number.
            masked = np.where(np.arange(k)[None, :] < j[:, None], win, 0)
            # weight of digit t is b**(j-1-t): scale the fixed k-digit weights
            # down by b**(k-j).
            prefix = (masked * pow_b[k - 1 :: -1][None, :]).sum(axis=1) // pow_b[k - j]
            insert = (prefix * b + rank) * pow_b[k - 1 - j]
            inv_hist += np.bincount(insert, minlength=total + 1)

    # --- assemble -------------------------------------------------------------
    assert int(cnt.sum()) + m == n + 1, "every suffix must be counted exactly once"
    starts = np.zeros(total, dtype=np.int64)
    np.cumsum(cnt[:-1], out=starts[1:])  # exclusive cumsum of bucket sizes
    starts += np.cumsum(inv_hist[:total])  # inserts at <= a shift start(a) up
    ends = starts + cnt - 1

    table = np.empty((total, 2), dtype=np.uint64)
    table[:, 0] = starts.astype(np.uint64)
    table[:, 1] = ends.astype(np.uint64)
    empty = cnt == 0
    table[empty, 0] = 1  # canonical empty range (src/search.rs:51-56)
    table[empty, 1] = 0
    return table
