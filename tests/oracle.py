"""Brute-force text-scan oracle.

Python re-creation of the reference's ground-truth parity harness
(compare_index_to_reference, src/fm_index.rs:612-664): enumerate every k-mer
of the canonical concatenated text with its positions, then assert count ==
map count and sorted locate == sorted positions.
"""

from __future__ import annotations

from collections import defaultdict

import numpy as np

from awry_tpu.alphabet import Alphabet, normalize_text
from awry_tpu.io.sequence_io import SequenceData


def concat_text_with_positions(seq_data: SequenceData) -> tuple[bytes, np.ndarray]:
    return bytes(seq_data.text), seq_data.start_positions


def kmer_position_map(text: bytes, k: int) -> dict[bytes, list[int]]:
    """kmer -> sorted global text positions, for every k-mer of the text
    (mirrors src/fm_index.rs:627-636)."""
    table: dict[bytes, list[int]] = defaultdict(list)
    for i in range(len(text) - k + 1):
        table[text[i : i + k]].append(i)
    return table


def brute_count(text: bytes, query: bytes, alphabet: Alphabet) -> int:
    """Occurrences of the canonicalized query in the canonical text."""
    q = bytes(normalize_text(alphabet, query))
    if not q or len(q) > len(text):
        return 0
    count = 0
    start = 0
    while True:
        idx = text.find(q, start)
        if idx < 0:
            return count
        count += 1
        start = idx + 1


def brute_positions(text: bytes, query: bytes, alphabet: Alphabet) -> list[int]:
    q = bytes(normalize_text(alphabet, query))
    out = []
    start = 0
    while q:
        idx = text.find(q, start)
        if idx < 0:
            break
        out.append(idx)
        start = idx + 1
    return out


def localize(positions: list[int], starts: np.ndarray) -> list[tuple[int, int]]:
    """Map global text positions to (sequence_idx, local_position) with
    correct searchsorted semantics."""
    out = []
    for p in positions:
        si = int(np.searchsorted(starts, p, side="right")) - 1
        out.append((si, p - int(starts[si])))
    return out
