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
               (O(log k) doubling multiply-add passes + one bincount);
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


def _window_addresses(dense: np.ndarray, k: int, b: int) -> np.ndarray:
    """Base-``b`` address of every k-symbol window: ``addr[i] = sum_j
    dense[i+j] * b**(k-1-j)``, valid wherever all k digits are >= 0 (lanes
    with a negative digit hold wrapped garbage; the caller masks them).

    O(log k) whole-array multiply-add passes via width doubling
    (addr_{2m}[i] = addr_m[i] * b**m + addr_m[i+m]) instead of the O(k)
    per-digit loop — the difference between ~440 s and a few seconds at
    250M symbols, k=14 (round-3 VERDICT task 1).  uint32 is always wide
    enough: the table is materialized at 8-16 B/entry, so b**k >= 2**32
    could never be built anyway (asserted by the caller).
    """
    L = dense.shape[0]
    d1 = dense.astype(np.uint32)  # -1 digits wrap; masked by the caller
    cur, m = d1, 1
    for bit in bin(k)[3:]:  # binary expansion below the MSB
        p = np.uint32(b) ** np.uint32(m)
        nlen = L - 2 * m + 1
        nxt = cur[:nlen] * p
        nxt += cur[m : m + nlen]
        cur, m = nxt, 2 * m
        if bit == "1":
            nlen = L - m
            nxt = cur[:nlen] * np.uint32(b)
            nxt += d1[m : m + nlen]
            cur, m = nxt, m + 1
    return cur


def populate_kmer_table_counting(
    text_syms: np.ndarray, alphabet: Alphabet, k: int
) -> np.ndarray:
    """Build the dense k-mer seed table by counting, from the raw text.

    ``text_syms``: uint8 symbol indices of the concatenated text (no
    sentinel; record delimiters are ambiguity symbols per
    io/sequence_io.concat_records).  Returns [base**k, 2] ranges bit-identical
    to host_engine.populate_kmer_table(index); dtype uint32 when every row
    index fits (bwt_len <= 2**32, the common case — halves the table's host
    memory, artifact size and load time), else uint64.
    """
    if k == 0:  # table disabled: single canonical-empty entry, never read
        return np.array([[1, 0]], dtype=np.uint64)
    b = alphabet.num_encoding_symbols
    n = int(text_syms.shape[0])
    total = b**k
    assert total < 1 << 32, "b**k table would exceed addressable/host memory"
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
    any_bad_text = bool(bad[:n].any())

    # --- valid windows: CHUNKED doubling-pass addresses + histogram ---------
    # Window starts [0, n-k] whose k digits are all encoding symbols.  The
    # address stream is processed in bounded chunks (each chunk's doubling
    # temporaries are ~3 x chunk x 4 B) so multi-Gbp texts never hold an
    # n-sized uint32 address array — a pan-genome partition build at 2.6 Gbp
    # peaked past the OOM killer with the one-shot form.
    n_starts = n - k + 1  # window starts fully inside the text
    m_invalid_text = 0
    inv_text_parts: list[np.ndarray] = []
    use_native = n + 1 <= (1 << 32)
    cnt32 = np.zeros(total, dtype=np.uint32) if use_native else None
    cnt64 = None
    chunk = 1 << 28
    for lo in range(0, max(n_starts, 0), chunk):
        hi = min(lo + chunk, n_starts)
        sub = dense[lo : hi + k - 1]
        addr = _window_addresses(sub, k, b)[: hi - lo]
        if any_bad_text:
            bsub = bad[lo : hi + k - 1]
            bc = np.zeros(bsub.shape[0] + 1, dtype=np.int64)
            np.cumsum(bsub, out=bc[1:])
            valid = (bc[k:] - bc[: hi - lo]) == 0
            n_inv = int(hi - lo - valid.sum())
            if n_inv:
                inv_text_parts.append(lo + np.flatnonzero(~valid))
                m_invalid_text += n_inv
                addr = addr[valid]
        if use_native:
            from .suffix_array import kmer_hist_native

            if not kmer_hist_native(addr, cnt32):
                use_native = False
        if not use_native:
            if cnt64 is None:
                cnt64 = cnt32.astype(np.int64) if cnt32 is not None else np.zeros(total, dtype=np.int64)
                cnt32 = None
            cnt64 += np.bincount(addr, minlength=total)
        del addr

    # --- invalid windows: lexicographic insert points ------------------------
    # Every suffix of the bwt text not counted above: window starts in
    # [0, n-k] with an ambiguity digit, plus all starts in (n-k, n] (they
    # reach the virtual sentinel at position n).  Their contribution to
    # start(a) is +1 for every a >= their insert point.
    n_tail = n + 1 - max(n_starts, 0)  # starts in (n-k, n]
    m = m_invalid_text + n_tail
    insert_parts = []
    if m:
        inv_starts_text = (
            np.concatenate(inv_text_parts)
            if inv_text_parts
            else np.zeros(0, dtype=np.int64)
        )
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
            insert_parts.append((prefix * b + rank) * pow_b[k - 1 - j])
    inserts = (
        np.sort(np.concatenate(insert_parts)) if insert_parts else np.zeros(0, dtype=np.int64)
    )
    counted = int(cnt32.sum(dtype=np.int64) if cnt32 is not None else cnt64.sum())
    assert counted + m == n + 1, "every suffix must be counted exactly once"

    # --- assemble -------------------------------------------------------------
    # uint32 whenever every row index fits (bwt_len = n+1 <= 2**32): half the
    # host memory / artifact bytes / load time of the dominant component.
    if use_native:
        from .suffix_array import kmer_fill_native

        # Native scan + fill (one uint32 count bin + the output per table
        # entry: NumPy's cumsum/mask pipeline first-touches ~5x the bytes,
        # minutes at k=14 on fault-bound hosts).
        table = kmer_fill_native(cnt32, inserts)
        if table is not None:
            return table
        cnt64 = cnt32.astype(np.int64)

    cnt = cnt64
    inv_hist = np.bincount(inserts, minlength=total + 1) if m else np.zeros(total + 1, dtype=np.int64)
    starts = np.zeros(total, dtype=np.int64)
    np.cumsum(cnt[:-1], out=starts[1:])  # exclusive cumsum of bucket sizes
    starts += np.cumsum(inv_hist[:total])  # inserts at <= a shift start(a) up
    ends = starts + cnt - 1

    dtype = np.uint32 if n + 1 <= (1 << 32) else np.uint64
    table = np.empty((total, 2), dtype=dtype)
    table[:, 0] = starts.astype(dtype)
    table[:, 1] = ends.astype(dtype)
    empty = cnt == 0
    table[empty, 0] = 1  # canonical empty range (src/search.rs:51-56)
    table[empty, 1] = 0
    return table
