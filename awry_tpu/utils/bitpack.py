"""Bit-packed suffix-array codec (the .awry file's CompressedSuffixArray).

In-memory and on-device the sampled SA is a plain aligned uint32/uint64 array
(gather-friendly; SURVEY.md section 2, native component #3); the reference's
cross-word bit packing (src/compressed_suffix_array.rs:51-106) exists in this
framework only at the .awry file boundary, implemented here as vectorized
whole-array passes.

Layout contract (bit-exact with the reference):
* bits_per_element = 64 - leading_zeros(bwt_len - 1)
  (src/compressed_suffix_array.rs:124-130);
* element i occupies bits [i*bpe, (i+1)*bpe) little-endian across a uint64
  word array of ceil(num_elements * bpe / 64) words
  (src/compressed_suffix_array.rs:113-123).
"""

from __future__ import annotations

import numpy as np


def bits_per_element(bwt_len: int) -> int:
    """Bits needed for the largest SA value, bwt_len - 1
    (src/compressed_suffix_array.rs:124-130)."""
    return max(1, int(bwt_len - 1).bit_length())


def packed_word_len(bwt_len: int, sa_ratio: int) -> int:
    """Number of uint64 words for the packed sampled SA
    (src/compressed_suffix_array.rs:113-123)."""
    bpe = bits_per_element(bwt_len)
    num_elements = -(-bwt_len // sa_ratio)
    return -(-(num_elements * bpe) // 64)


def pack(values: np.ndarray, bwt_len: int, sa_ratio: int) -> np.ndarray:
    """Pack sampled SA values into the reference's word layout."""
    bpe = bits_per_element(bwt_len)
    values = np.asarray(values, dtype=np.uint64)
    n = values.shape[0]
    words = np.zeros(packed_word_len(bwt_len, sa_ratio), dtype=np.uint64)
    starts = np.arange(n, dtype=np.uint64) * np.uint64(bpe)
    word_idx = (starts >> np.uint64(6)).astype(np.int64)
    bit = starts & np.uint64(63)
    np.bitwise_or.at(words, word_idx, values << bit)
    # High spill into the next word when the element straddles the boundary.
    spill = bit + np.uint64(bpe) > np.uint64(64)
    shift = (np.uint64(64) - bit[spill]) & np.uint64(63)  # bit>0 when spilling
    np.bitwise_or.at(words, word_idx[spill] + 1, values[spill] >> shift)
    return words


def unpack(words: np.ndarray, bwt_len: int, sa_ratio: int) -> np.ndarray:
    """Inverse of pack: recover the sampled SA values."""
    bpe = bits_per_element(bwt_len)
    words = np.asarray(words, dtype=np.uint64)
    n = -(-bwt_len // sa_ratio)
    starts = np.arange(n, dtype=np.uint64) * np.uint64(bpe)
    word_idx = (starts >> np.uint64(6)).astype(np.int64)
    bit = starts & np.uint64(63)
    lo = words[word_idx] >> bit
    has_hi = bit + np.uint64(bpe) > np.uint64(64)
    hi = np.zeros(n, dtype=np.uint64)
    if has_hi.any():
        shift = (np.uint64(64) - bit[has_hi]) & np.uint64(63)
        hi[has_hi] = words[word_idx[has_hi] + 1] << shift
    mask = (np.uint64(1) << np.uint64(bpe)) - np.uint64(1) if bpe < 64 else np.uint64(0xFFFFFFFFFFFFFFFF)
    return (lo | hi) & mask
