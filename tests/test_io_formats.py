"""Bit-packing sweep, .awry round trip, artifact round trip, FASTA/FASTQ
parsing (mirrors src/compressed_suffix_array.rs:137-212 and
save_load_equality_test, src/fm_index.rs:1046-1088)."""

import struct

import numpy as np
import pytest

import awry_tpu.host_engine as he
from awry_tpu import Alphabet, FmBuildArgs, build_from_records
from awry_tpu.io.artifact import load_artifact, save_artifact
from awry_tpu.io.awry_format import load_awry, save_awry
from awry_tpu.io.sequence_io import parse_fasta, parse_fastq
from awry_tpu.utils.bitpack import bits_per_element, pack, packed_word_len, unpack

from .conftest import random_seq


def test_bits_per_element_pinned():
    # src/compressed_suffix_array.rs:182-212 table
    for length, expected in [
        (15, 4), (16, 4), (17, 5), (31, 5), (32, 5), (33, 6),
        (1022, 10), (1023, 10), (1024, 10), (1025, 11),
        (65535, 16), (65536, 16), (65537, 17),
        (2**31 - 1, 31), (2**31, 31), (2**31 + 1, 32),
    ]:
        assert bits_per_element(length) == expected, length


@pytest.mark.parametrize("ratio", range(1, 16))
def test_bitpack_round_trip(ratio):
    # src/compressed_suffix_array.rs:137-180 sweep
    sa_len = 12345
    values = np.arange(0, sa_len, ratio, dtype=np.uint64)
    words = pack(values, sa_len, ratio)
    assert words.shape[0] == packed_word_len(sa_len, ratio)
    np.testing.assert_array_equal(unpack(words, sa_len, ratio), values)


def test_bitpack_word_straddle():
    # bwt_len forcing bpe that straddles u64 boundaries often
    bwt_len = 2**20 + 3  # 21 bits/element
    ratio = 1
    rng = np.random.default_rng(7)
    values = rng.integers(0, bwt_len, size=-(-bwt_len // ratio), dtype=np.uint64)
    words = pack(values, bwt_len, ratio)
    np.testing.assert_array_equal(unpack(words, bwt_len, ratio), values)


def _build(alphabet, rng, n=500, num_records=2, kmer_len=2):
    records = [
        (f"header with spaces {i}", random_seq(alphabet, rng, int(rng.integers(20, n))))
        for i in range(num_records)
    ]
    return build_from_records(records, FmBuildArgs(alphabet=alphabet, lookup_table_kmer_len=kmer_len)), records


@pytest.mark.parametrize("alphabet", [Alphabet.NUCLEOTIDE, Alphabet.AMINO])
def test_awry_round_trip(alphabet, rng, tmp_path):
    index, records = _build(alphabet, rng)
    path = str(tmp_path / "test.awry")
    save_awry(index, path)
    loaded = load_awry(path)

    assert loaded.alphabet == index.alphabet
    assert loaded.bwt_len == index.bwt_len
    assert loaded.sa_ratio == index.sa_ratio
    assert loaded.kmer_len == index.kmer_len
    assert loaded.version_number == index.version_number
    assert loaded.headers == index.headers
    np.testing.assert_array_equal(loaded.planes, index.planes)
    np.testing.assert_array_equal(loaded.milestones, index.milestones)
    np.testing.assert_array_equal(loaded.prefix_sums, index.prefix_sums)
    np.testing.assert_array_equal(loaded.sampled_sa, index.sampled_sa)
    np.testing.assert_array_equal(loaded.kmer_table, index.kmer_table)
    np.testing.assert_array_equal(loaded.seq_starts, index.seq_starts)

    # and queries agree
    q = records[0][1][:12]
    assert he.count(loaded, q) == he.count(index, q)
    assert he.locate(loaded, q) == he.locate(index, q)


def test_awry_magic_validation(tmp_path):
    p = tmp_path / "bogus.awry"
    p.write_bytes(b"NOT-AN-INDEX" + b"\x00" * 64)
    with pytest.raises(ValueError, match="magic"):
        load_awry(str(p))


@pytest.mark.parametrize("alphabet", [Alphabet.NUCLEOTIDE, Alphabet.AMINO])
def test_artifact_round_trip(alphabet, rng, tmp_path):
    index, _ = _build(alphabet, rng)
    path = str(tmp_path / "index.npz")
    save_artifact(index, path)
    loaded = load_artifact(path)
    for field in ("planes", "milestones", "prefix_sums", "sampled_sa", "kmer_table", "seq_starts"):
        np.testing.assert_array_equal(getattr(loaded, field), getattr(index, field))
    assert loaded.headers == index.headers
    assert (loaded.alphabet, loaded.sa_ratio, loaded.bwt_len, loaded.kmer_len) == (
        index.alphabet, index.sa_ratio, index.bwt_len, index.kmer_len)


def test_parse_fasta_variants():
    recs = parse_fasta(b">a desc\nACGT\nACGT\n\n>b\nTTTT")
    assert recs == [("a desc", b"ACGTACGT"), ("b", b"TTTT")]


def test_parse_fastq_variants():
    recs = parse_fastq(b"@r1\nACGT\n+\nIIII\n@r2 x\nGG\n+r2\n!!\n")
    assert recs == [("r1", b"ACGT"), ("r2 x", b"GG")]
    with pytest.raises(ValueError):
        parse_fastq(b"@r1\nACGT\n+\n")  # truncated


def test_sa_intermediate_artifact(rng, tmp_path):
    """suffix_array_output_src persists the SA; a second build reuses it;
    remove flag deletes it (fm_index.rs:170-181, :263-265 analog)."""
    import os

    from awry_tpu import build_from_records

    seq = random_seq(Alphabet.NUCLEOTIDE, rng, 300)
    sa_path = str(tmp_path / "sa.npy")
    args = FmBuildArgs(suffix_array_output_src=sa_path, lookup_table_kmer_len=2)
    idx1 = build_from_records([("s", seq)], args)
    assert os.path.exists(sa_path)
    idx2 = build_from_records([("s", seq)], args)  # reuse path
    np.testing.assert_array_equal(idx1.sampled_sa, idx2.sampled_sa)
    args_rm = FmBuildArgs(
        suffix_array_output_src=sa_path,
        lookup_table_kmer_len=2,
        remove_intermediate_suffix_array_file=True,
    )
    build_from_records([("s", seq)], args_rm)
    assert not os.path.exists(sa_path)


def test_artifact_round_trips_marks(rng, tmp_path):
    index, _ = _build(Alphabet.NUCLEOTIDE, rng)
    assert index.has_marks
    p = str(tmp_path / "m.npz")
    save_artifact(index, p)
    loaded = load_artifact(p)
    assert loaded.has_marks
    np.testing.assert_array_equal(loaded.mark_bits, index.mark_bits)
    np.testing.assert_array_equal(loaded.mark_milestones, index.mark_milestones)
    np.testing.assert_array_equal(loaded.text_sampled_sa, index.text_sampled_sa)


def test_awry_golden_bytes():
    """Pin the .awry byte layout against hand-computed values so format
    drift is caught (magic at 0, header u64s, block payload sizes:
    src/fm_index_file.rs:18,165-181,56-83)."""
    import struct

    from awry_tpu import FmBuildArgs, build_from_records

    index = build_from_records(
        [("tiny", b"ACGTACGTAC")],
        FmBuildArgs(lookup_table_kmer_len=1, suffix_array_compression_ratio=2),
    )
    import io as _io

    buf = _io.BytesIO()
    import tempfile, os

    with tempfile.TemporaryDirectory() as d:
        p = os.path.join(d, "g.awry")
        save_awry(index, p)
        data = open(p, "rb").read()

    assert data[:11] == b"AWRY-Index\n"
    version, ratio, bwt_len, alpha = struct.unpack_from("<4Q", data, 11)
    assert (version, ratio, bwt_len, alpha) == (1, 2, 11, 0)
    # one nucleotide block: 3 x 32 B vectors + 8 u64 milestones = 160 B
    block_end = 11 + 32 + 160
    # prefix sums: 7 u64 ending in bwt_len
    prefix = struct.unpack_from("<7Q", data, block_end)
    assert prefix[0] == 0 and prefix[-1] == 11
    # milestones of block 0 are all zero (counts before the first block)
    milestones = struct.unpack_from("<8Q", data, 11 + 32 + 96)
    assert milestones == (0,) * 8
    # packed SA section: ceil(ceil(11/2)*4 / 64) = 1 word (4 bits/element)
    (kmer_len_byte,) = struct.unpack_from("<B", data, block_end + 56 + 8)
    assert kmer_len_byte == 1


def test_save_awry_rejects_kmer_len_zero(rng, tmp_path):
    """kmer_len=0 files would be mis-searched by the reference loader
    (u8 underflow in get_range_for_kmer); refuse to write them."""
    from awry_tpu import build_from_records

    seq = random_seq(Alphabet.NUCLEOTIDE, rng, 200)
    index = build_from_records([("s", seq)], FmBuildArgs(lookup_table_kmer_len=0))
    with pytest.raises(ValueError, match="kmer_len"):
        save_awry(index, str(tmp_path / "bad.awry"))


def test_sa_cache_rejects_foreign_same_length_text(rng, tmp_path):
    """A cached SA from a DIFFERENT same-length text must not be reused
    (fingerprint sidecar, ADVICE round-1 medium finding)."""
    from awry_tpu import build_from_records

    seq_a = random_seq(Alphabet.NUCLEOTIDE, rng, 300)
    seq_b = random_seq(Alphabet.NUCLEOTIDE, rng, 300)
    assert seq_a != seq_b
    sa_path = str(tmp_path / "sa.npy")
    args = FmBuildArgs(suffix_array_output_src=sa_path, lookup_table_kmer_len=2)
    build_from_records([("s", seq_a)], args)
    idx_b = build_from_records([("s", seq_b)], args)  # same path, other text
    import awry_tpu.host_engine as he

    assert he.count(idx_b, seq_b[:20]) == 1  # correct index for text B
    # And a cache missing its fingerprint sidecar is rebuilt, not trusted.
    import os

    os.remove(sa_path + ".sha256")
    idx_b2 = build_from_records([("s", seq_b)], args)
    np.testing.assert_array_equal(idx_b2.sampled_sa, idx_b.sampled_sa)


def test_stream_fasta_matches_slurp(rng, tmp_path):
    """The streaming FASTA reader produces byte-identical SequenceData to the
    in-memory parse, across record boundaries, tiny chunks, CRLF and
    chunk-straddling headers."""
    from awry_tpu.io.sequence_io import read_sequence_file, stream_fasta

    recs = []
    for i in range(7):
        ln = int(rng.integers(1, 2000))
        recs.append((f"rec {i} with spaces", random_seq(Alphabet.NUCLEOTIDE, rng, ln)))
    lines = []
    for h, s in recs:
        lines.append(f">{h}".encode())
        for j in range(0, len(s), 61):
            lines.append(s[j : j + 61])
    payload = b"\r\n".join(lines) + b"\n"
    p = str(tmp_path / "multi.fasta")
    with open(p, "wb") as f:
        f.write(payload)
    slurped = read_sequence_file(p, Alphabet.NUCLEOTIDE)
    for chunk in (17, 61, 4096, 1 << 20):
        streamed = stream_fasta(p, Alphabet.NUCLEOTIDE, chunk_bytes=chunk)
        np.testing.assert_array_equal(streamed.text, slurped.text), chunk
        np.testing.assert_array_equal(streamed.start_positions, slurped.start_positions)
        assert streamed.headers == slurped.headers

    with open(str(tmp_path / "bad.fasta"), "wb") as f:
        f.write(b"ACGT\n>late\nACGT\n")
    with pytest.raises(ValueError, match="before first"):
        stream_fasta(str(tmp_path / "bad.fasta"), Alphabet.NUCLEOTIDE, chunk_bytes=8)


def test_stream_fasta_matches_slurp_edge_payloads(tmp_path):
    """Adversarial payloads where the two parsers once diverged: trailing
    spaces/tabs on sequence lines, padded headers, blank/whitespace-only
    lines, empty records (incl. a trailing bare '>'), and an indented '>'
    that is sequence data, not a header."""
    from awry_tpu.io.sequence_io import concat_records, stream_fasta

    payloads = [
        b"> rec1 \nACGT \nTTAA\n>",               # padded header, trailing ws, bare '>'
        b">a\nAC\tGT\n\n   \n>b\n\nGG  \n",        # tabs, whitespace-only lines
        b">a\r\nACGT\r\n>empty\r\n>c\r\nTT\r\n",   # CRLF + empty record mid-file
        b">a\nACGT\n  >notheader\nGG\n",           # indented '>' is data
        b">only header no newline",
        b">a\nACGT",                               # no trailing newline
    ]
    for pi, payload in enumerate(payloads):
        p = str(tmp_path / f"edge_{pi}.fasta")
        with open(p, "wb") as f:
            f.write(payload)
        slurped = concat_records(parse_fasta(payload), Alphabet.NUCLEOTIDE)
        for chunk in (3, 7, 4096):
            streamed = stream_fasta(p, Alphabet.NUCLEOTIDE, chunk_bytes=chunk)
            np.testing.assert_array_equal(streamed.text, slurped.text, err_msg=f"{pi}/{chunk}")
            np.testing.assert_array_equal(
                streamed.start_positions, slurped.start_positions, err_msg=f"{pi}/{chunk}"
            )
            assert streamed.headers == slurped.headers, (pi, chunk)


def test_awry_golden_full_file():
    """COMPLETE hand-computed .awry file for text 'ACGT', pinned byte for
    byte against the reference write order (src/fm_index_file.rs:42-106).
    Every section is derived here independently of the library:
      SA of ACGT$ = [4,0,1,2,3]; BWT = T $ A C G;
      codes $=0b100 A=0b110 C=0b101 G=0b011 T=0b001 (src/alphabet.rs:310-317)
      plane v bit p = bit v of code(BWT[p]), little-endian within the window.
    """
    import struct

    from awry_tpu import FmBuildArgs, build_from_records

    index = build_from_records(
        [("golden", b"ACGT")],
        FmBuildArgs(lookup_table_kmer_len=1, suffix_array_compression_ratio=8),
    )
    path_bytes = None
    import io as _io
    import tempfile, os as _os

    with tempfile.TemporaryDirectory() as d:
        p = _os.path.join(d, "g.awry")
        save_awry(index, p)
        path_bytes = open(p, "rb").read()

    expected = bytearray()
    expected += b"AWRY-Index\n"  # magic (fm_index_file.rs:18)
    expected += struct.pack("<4Q", 1, 8, 5, 0)  # version, ratio, bwt_len, Nucleotide
    # Block 0: 3 bit-vector windows of 32 B each, then 8 u64 milestones.
    # BWT = T $ A C G -> plane0 bits {0,3,4}=25, plane1 {2,4}=20, plane2 {1,2,3}=14.
    for first_word in (25, 20, 14):
        expected += struct.pack("<Q", first_word) + b"\x00" * 24
    expected += struct.pack("<8Q", 0, 0, 0, 0, 0, 0, 0, 0)  # milestones (block start)
    # Prefix sums over counts {$:1,A:1,C:1,G:1,N:0,T:1} -> 7 u64.
    expected += struct.pack("<7Q", 0, 1, 2, 3, 4, 4, 5)
    # Packed sampled SA: rows 0,8,16.. -> [SA row0]=[4]; 3 bits/elem -> word 4.
    expected += struct.pack("<Q", 4)
    # k-mer table, k=1: (start,end) for dense symbols A,C,G,T.
    expected += struct.pack("<B", 1)
    expected += struct.pack("<8Q", 1, 1, 2, 2, 3, 3, 4, 4)
    # Sequence index: count, then (start, header_len, header bytes).
    expected += struct.pack("<Q", 1)
    expected += struct.pack("<QQ", 0, len(b"golden")) + b"golden"

    assert path_bytes == bytes(expected), (
        f"first mismatch at offset "
        f"{next(i for i, (a, b) in enumerate(zip(path_bytes, bytes(expected))) if a != b) if path_bytes != bytes(expected) and len(path_bytes) == len(expected) else (len(path_bytes), len(expected))}"
    )


def test_strict_mode_catches_corruption(rng, tmp_path):
    """Debug/sanitizer mode (SURVEY.md section 5): corrupt artifacts and
    out-of-range wire batches fail LOUDLY instead of clamping."""
    import jax.numpy as jnp

    from awry_tpu import build_from_records
    from awry_tpu.io.artifact import load_artifact, save_artifact
    from awry_tpu.ops import FmQueryEngine

    seq = random_seq(Alphabet.NUCLEOTIDE, rng, 500)
    index = build_from_records([("s", seq)], FmBuildArgs(lookup_table_kmer_len=2))

    p = str(tmp_path / "ok.npz")
    save_artifact(index, p)
    load_artifact(p, strict=True)  # clean artifact passes

    bad = dataclasses_replace_sa(index)
    pbad = str(tmp_path / "bad.npz")
    save_artifact(bad, pbad)
    load_artifact(pbad)  # default (lenient) load still works
    with pytest.raises(ValueError, match="sampled_sa"):
        load_artifact(pbad, strict=True)
    with pytest.raises(ValueError, match="sampled_sa"):
        FmQueryEngine(bad, strict=True)

    # Wire batch with out-of-range symbol indices (bypassing encode_queries).
    # The nibble wire (uint8) is the widest packed format that can carry an
    # out-of-range symbol; 0xFF there decodes to nibble 15 >= cardinality.
    # (The 2-bit crumb wire is correct by construction - every crumb decodes
    # to a dense symbol - so strict mode rightly accepts any crumb bytes.)
    eng = FmQueryEngine(index, strict=True)
    qsyms, qlens = eng.encode_queries([seq[:8]])
    evil_nibble = jnp.asarray(np.full((1, 8), 0xFF, dtype=np.uint8))
    with pytest.raises(ValueError, match="symbol index"):
        eng.count_batch_dispatch((evil_nibble, qlens))
    if np.asarray(qsyms).dtype == np.int8:  # crumb wire selected for this seq
        evil_crumb = jnp.asarray(np.full_like(np.asarray(qsyms), -1))
        eng.count_batch_dispatch((evil_crumb, qlens))  # accepted: no bad decode
    with pytest.raises(ValueError, match="query length"):
        eng.count_batch_dispatch((qsyms, jnp.asarray(np.array([999], dtype=np.int32))))
    # Clean dispatch passes strict checks and counts correctly.
    counts = np.asarray(eng.count_batch_dispatch((qsyms, qlens)))
    assert counts[0] >= 1


def dataclasses_replace_sa(index):
    import dataclasses

    bad_sa = index.sampled_sa.copy()
    bad_sa[0] = index.bwt_len + 5
    return dataclasses.replace(index, sampled_sa=bad_sa)


def test_stream_fastq_matches_slurp(rng, tmp_path):
    """The streaming FASTQ reader produces byte-identical SequenceData to the
    in-memory parse — across chunk-straddling records, CRLF, blank lines,
    '@'/'+' as quality bytes, and a file with no trailing newline."""
    from awry_tpu.io.sequence_io import concat_records, parse_fastq, stream_fastq

    recs = []
    lines = []
    for i in range(23):
        ln = int(rng.integers(1, 400))
        seq = random_seq(Alphabet.NUCLEOTIDE, rng, ln)
        recs.append((f"read/{i} extra", seq))
        # Quality line starting with '@' or '+' (legal FASTQ, parser trap).
        qual = bytes([rng.choice([0x40, 0x2B])]) + bytes(
            rng.integers(33, 74, size=ln - 1, dtype=np.uint8)
        ) if ln > 1 else b"I"
        lines += [f"@read/{i} extra".encode(), seq, b"+" + (b"opt" if i % 3 else b""), qual]
        if i % 5 == 0:
            lines.append(b"")  # blank line between records
    payload = b"\r\n".join(lines)  # CRLF, no trailing newline
    p = str(tmp_path / "reads.fastq")
    with open(p, "wb") as f:
        f.write(payload)
    slurped = concat_records(parse_fastq(payload), Alphabet.NUCLEOTIDE)
    for chunk in (13, 97, 4096, 1 << 20):
        streamed = stream_fastq(p, Alphabet.NUCLEOTIDE, chunk_bytes=chunk)
        np.testing.assert_array_equal(streamed.text, slurped.text, err_msg=str(chunk))
        np.testing.assert_array_equal(streamed.start_positions, slurped.start_positions)
        assert streamed.headers == slurped.headers

    with open(str(tmp_path / "bad.fastq"), "wb") as f:
        f.write(b"@r1\nACGT\nnotplus\nIIII\n")
    with pytest.raises(ValueError, match="separator"):
        stream_fastq(str(tmp_path / "bad.fastq"), Alphabet.NUCLEOTIDE, chunk_bytes=8)
    with open(str(tmp_path / "trunc.fastq"), "wb") as f:
        f.write(b"@r1\nACGT\n+\nIIII\n@r2\nTT\n")
    with pytest.raises(ValueError, match="multiple of 4"):
        stream_fastq(str(tmp_path / "trunc.fastq"), Alphabet.NUCLEOTIDE, chunk_bytes=8)


def test_load_awry_truncation_and_corruption_fuzz(rng, tmp_path):
    """Loader hardening (round-3 verdict task 8): any structural damage —
    truncation at every section boundary, absurd header fields, short
    sequence records — must raise, never reinterpret garbage (the reference
    loader unsafe-reinterprets bytes, src/fm_index_file.rs:218-231).  The
    format has no checksums (matching the reference), so payload bit flips
    are only caught by strict value-level validation when they break an
    invariant."""
    from awry_tpu import Alphabet, FmBuildArgs, build_from_records
    from awry_tpu.io.awry_format import load_awry, save_awry

    seq = bytes(rng.choice(np.frombuffer(b"ACGT", dtype=np.uint8), size=701))
    index = build_from_records(
        [("rec_a", seq[:300]), ("rec_b", seq[300:])],
        FmBuildArgs(alphabet=Alphabet.NUCLEOTIDE, lookup_table_kmer_len=2),
    )
    p = str(tmp_path / "f.awry")
    save_awry(index, p)
    blob = open(p, "rb").read()

    # Sanity: intact file round-trips under strict.
    load_awry(p, strict=True).validate(strict=True)

    # Truncation at many offsets (every section boundary region + a sweep).
    for cut in [0, 5, 11, 20, 43, len(blob) // 3, len(blob) // 2, len(blob) - 1]:
        bad = str(tmp_path / f"cut{cut}.awry")
        with open(bad, "wb") as f:
            f.write(blob[:cut])
        with pytest.raises((ValueError, struct.error)):
            load_awry(bad)

    # Bad magic.
    with open(str(tmp_path / "m.awry"), "wb") as f:
        f.write(b"X" + blob[1:])
    with pytest.raises(ValueError, match="magic"):
        load_awry(str(tmp_path / "m.awry"))

    # Absurd header fields: bwt_len huge, sa_ratio 0, alphabet invalid,
    # kmer_len byte blown up to 201 (base**201 table cannot fit any file).
    import struct as _s

    def patch(off, fmt, val):
        b = bytearray(blob)
        _s.pack_into(fmt, b, off, val)
        q = str(tmp_path / f"p{off}.awry")
        with open(q, "wb") as f:
            f.write(bytes(b))
        return q

    hdr = len(b"AWRY-Index\n")
    with pytest.raises(ValueError):
        load_awry(patch(hdr + 16, "<Q", 1 << 60))  # bwt_len
    with pytest.raises(ValueError):
        load_awry(patch(hdr + 8, "<Q", 0))  # sa_ratio
    with pytest.raises(ValueError):
        load_awry(patch(hdr + 24, "<Q", 77))  # alphabet idx
    # kmer_len byte sits right after the packed SA section.
    from awry_tpu.utils.bitpack import packed_word_len

    koff = (
        hdr + 32 + index.num_blocks * (3 * 32 + 8 * 8)
        + (index.cardinality + 1) * 8
        + packed_word_len(index.bwt_len, index.sa_ratio) * 8
    )
    assert blob[koff] == index.kmer_len
    with pytest.raises(ValueError):
        load_awry(patch(koff, "<B", 201))

    # Trailing garbage: accepted loose (reference ignores it), rejected strict.
    tg = str(tmp_path / "t.awry")
    with open(tg, "wb") as f:
        f.write(blob + b"junk")
    load_awry(tg)
    with pytest.raises(ValueError, match="trailing"):
        load_awry(tg, strict=True)

    # Value-level corruption strict mode can see: make prefix_sums
    # non-monotone (two u64 fields right after the block section).
    ps_off = hdr + 32 + index.num_blocks * (3 * 32 + 8 * 8)
    b = bytearray(blob)
    _s.pack_into("<Q", b, ps_off + 8, int(index.bwt_len))  # prefix_sums[1] jumps high
    _s.pack_into("<Q", b, ps_off + 16, 1)  # prefix_sums[2] below it
    q = str(tmp_path / "ps.awry")
    with open(q, "wb") as f:
        f.write(bytes(b))
    with pytest.raises((ValueError, AssertionError)):
        load_awry(q, strict=True)
