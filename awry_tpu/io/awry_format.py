"""Reader/writer for the reference's binary ``.awry`` index format.

Byte-level layout pinned to src/fm_index_file.rs:42-287:
  magic            11 bytes  b"AWRY-Index\\n"          (:18)
  header           4 x u64   [version, sa_ratio, bwt_len, alphabet_idx] (:165-181)
  per block        V x 32 B bit-vectors, then 8 (nucleotide) / 24 (amino)
                   u64 milestones                       (:56-83)
  prefix sums      (cardinality+1) x u64                (:86-88)
  packed SA        packed_word_len u64 words            (:91-93)
  k-mer table      u8 k, then base**k (start,end) u64 pairs (:96-101)
  sequence index   u64 count, then per record (u64 start, u64 header_len,
                   header bytes)                        (src/sequence_index.rs:144-183)

Everything little-endian; no checksums.  The in-memory uint32-lane plane
layout is byte-identical to the reference's [u64;4] Vec256 when both are
viewed little-endian, so block IO is a pure reinterpret.

Conscious divergence (documented per SURVEY.md 2.3 quirk #1/#3): the k-mer
table section we WRITE has the reference's exact size and is read back by
AWRY without affecting any query (AWRY never reads table entries), but we
store our dense-radix ranges in it rather than reproducing the reference's
buggy sparse population.  On LOAD we therefore ignore the stored table
contents and re-derive the dense table from the index itself, which makes
load(x).kmer_table correct for ANY producer (AWRY or us).
"""

from __future__ import annotations

import io
import struct

import numpy as np

from ..alphabet import Alphabet
from ..index import SYMBOLS_PER_BLOCK, WORDS_PER_WINDOW, FmIndexData
from ..utils.bitpack import pack, packed_word_len, unpack

MAGIC = b"AWRY-Index\n"  # src/fm_index_file.rs:18

_MILESTONE_SLOTS = {Alphabet.NUCLEOTIDE: 8, Alphabet.AMINO: 24}  # src/bwt.rs:29,139


def save_awry(index: FmIndexData, path: str) -> None:
    """Serialize to the reference's .awry layout (src/fm_index_file.rs:42-106)."""
    alphabet = index.alphabet
    nv = alphabet.num_planes
    slots = _MILESTONE_SLOTS[alphabet]
    nb = index.num_blocks
    if index.kmer_len == 0:
        # The reference can never produce kmer_len=0 (its save debug_asserts
        # kmer_len != 0) and its loader mis-reads such files: get_range_for_kmer
        # computes take((0u8 - 1) as usize), a u8 underflow that double-processes
        # the query (src/kmer_lookup_table.rs:90-110).  Refuse to write a file
        # AWRY would silently mis-search.
        raise ValueError(
            "cannot save a kmer_len=0 index to .awry: the reference loader"
            " mis-searches such files; rebuild with kmer_len >= 1 or use the"
            " .npz artifact format"
        )

    with open(path, "wb") as f:
        f.write(MAGIC)
        header = np.array(
            [index.version_number, index.sa_ratio, index.bwt_len, alphabet.value],
            dtype="<u8",
        )
        f.write(header.tobytes())

        # Blocks: interleave bit-vectors + padded milestones per block.
        planes64 = index.planes.astype("<u4").reshape(nb, nv, WORDS_PER_WINDOW)
        milestones = np.zeros((nb, slots), dtype="<u8")
        milestones[:, : alphabet.cardinality] = index.milestones.astype("<u8")
        block_bytes = np.empty((nb, nv * 32 + slots * 8), dtype=np.uint8)
        block_bytes[:, : nv * 32] = planes64.reshape(nb, -1).view(np.uint8).reshape(nb, nv * 32)
        block_bytes[:, nv * 32 :] = milestones.view(np.uint8).reshape(nb, slots * 8)
        f.write(block_bytes.tobytes())

        f.write(index.prefix_sums.astype("<u8").tobytes())
        f.write(pack(index.sampled_sa, index.bwt_len, index.sa_ratio).astype("<u8").tobytes())

        f.write(struct.pack("<B", index.kmer_len))
        f.write(index.kmer_table.astype("<u8").tobytes())  # (start,end) pairs row-major

        f.write(struct.pack("<Q", len(index.headers)))
        for start, header_str in zip(index.seq_starts, index.headers):
            hb = header_str.encode()
            f.write(struct.pack("<QQ", int(start), len(hb)))
            f.write(hb)


def load_awry(
    path: str, *, kmer_on_device: bool | None = None, strict: bool = False
) -> FmIndexData:
    """Parse a .awry file (ours or AWRY's) back to FmIndexData
    (src/fm_index_file.rs:132-287).

    The k-mer table is re-derived rather than trusted (see module
    docstring).  ``kmer_on_device`` routes that re-derivation through the
    breadth-wise device builder (ops/kmer.py) - at k >= 12 the host path
    takes minutes-to-hours while the device build takes seconds; default
    (None) picks the device exactly in that regime when an accelerator is
    available.

    Structural damage (truncation, absurd header fields, short sections)
    always raises ValueError — the reference loader panics or reinterprets
    garbage here (src/fm_index_file.rs:218-231 unsafe reinterpret).
    ``strict=True`` additionally runs value-level corruption checks
    (FmIndexData.validate(strict=True)) and rejects trailing bytes; note
    the format has NO checksums (matching the reference), so bit flips in
    the plane payload are undetectable by any loader."""
    with open(path, "rb") as f:
        data = f.read()
    buf = io.BytesIO(data)

    def read_exact(n: int, what: str) -> bytes:
        b = buf.read(n)
        if len(b) != n:
            raise ValueError(
                f"truncated .awry file: {what} needs {n} bytes, got {len(b)}"
            )
        return b

    if buf.read(len(MAGIC)) != MAGIC:
        raise ValueError("not an .awry index file (bad magic)")

    version, sa_ratio, bwt_len, alphabet_idx = struct.unpack(
        "<4Q", read_exact(32, "header")
    )
    alphabet = Alphabet(alphabet_idx)
    if sa_ratio < 1 or bwt_len < 1:
        raise ValueError(
            f".awry header out of range: sa_ratio={sa_ratio}, bwt_len={bwt_len}"
        )
    nv = alphabet.num_planes
    slots = _MILESTONE_SLOTS[alphabet]
    nb = -(-bwt_len // SYMBOLS_PER_BLOCK)

    block_stride = nv * 32 + slots * 8
    if nb * block_stride > len(data):
        raise ValueError(
            f"truncated .awry file: {nb} blocks x {block_stride} B exceed the file"
        )
    raw = np.frombuffer(
        read_exact(nb * block_stride, "block section"), dtype=np.uint8
    ).reshape(nb, block_stride)
    planes = (
        raw[:, : nv * 32]
        .reshape(nb, nv, 32)
        .copy()
        .view("<u4")
        .reshape(nb, nv, WORDS_PER_WINDOW)
        .astype(np.uint32)
    )
    milestones = (
        raw[:, nv * 32 :].copy().view("<u8").reshape(nb, slots)[:, : alphabet.cardinality]
        .astype(np.uint64)
    )

    c = alphabet.cardinality
    prefix_sums = np.frombuffer(
        read_exact((c + 1) * 8, "prefix sums"), dtype="<u8"
    ).astype(np.uint64)

    n_words = packed_word_len(bwt_len, sa_ratio)
    packed = np.frombuffer(
        read_exact(n_words * 8, "packed suffix array"), dtype="<u8"
    ).astype(np.uint64)
    sampled_sa = unpack(packed, bwt_len, sa_ratio)

    (kmer_len,) = struct.unpack("<B", read_exact(1, "kmer length"))
    base = alphabet.num_encoding_symbols
    n_entries = base**kmer_len
    if buf.tell() + n_entries * 16 > len(data):
        raise ValueError(
            f"truncated .awry file: kmer_len={kmer_len} table exceeds the file"
        )
    buf.seek(n_entries * 16, io.SEEK_CUR)  # stored table ignored; re-derived below

    (num_seqs,) = struct.unpack("<Q", read_exact(8, "sequence count"))
    if num_seqs * 16 > len(data) - buf.tell():
        raise ValueError(f"truncated .awry file: {num_seqs} sequence records")
    seq_starts = np.zeros(num_seqs, dtype=np.int64)
    headers: list[str] = []
    for i in range(num_seqs):
        start, hlen = struct.unpack("<QQ", read_exact(16, f"sequence record {i}"))
        seq_starts[i] = start
        headers.append(read_exact(hlen, f"header {i}").decode("utf-8", errors="replace"))
    if strict and buf.read(1):
        raise ValueError("trailing bytes after the .awry sequence index")

    index = FmIndexData(
        alphabet=alphabet,
        planes=planes,
        milestones=milestones,
        prefix_sums=prefix_sums,
        sampled_sa=sampled_sa,
        sa_ratio=int(sa_ratio),
        bwt_len=int(bwt_len),
        kmer_table=np.zeros((n_entries, 2), dtype=np.uint64),
        kmer_len=int(kmer_len),
        seq_starts=seq_starts,
        headers=headers,
        version_number=int(version),
    )
    if kmer_on_device is None:
        try:
            import jax

            kmer_on_device = kmer_len >= 12 and jax.default_backend() != "cpu"
        except Exception:  # noqa: BLE001
            kmer_on_device = False
    if kmer_on_device:
        from ..ops.device_index import to_device
        from ..ops.kmer import populate_kmer_table_device

        index.kmer_table = populate_kmer_table_device(
            to_device(index, minimal=True), kmer_len
        )
    else:
        from ..host_engine import populate_kmer_table

        index.kmer_table = populate_kmer_table(index)
    index.validate(strict=strict)
    return index
