"""Per-phase timing of the index build at a given scale (default 250 Mbp).

Usage: python scripts/profile_build.py [n_bases]
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    n = int(float(sys.argv[1])) if len(sys.argv) > 1 else 250_000_000
    rng = np.random.default_rng(0)
    letters = np.frombuffer(b"ACGT", dtype=np.uint8)
    text = rng.choice(letters, size=n).tobytes()

    from awry_tpu.alphabet import Alphabet, encode_ascii
    from awry_tpu.build.builder import (
        bwt_symbols_from_sa,
        compute_milestones,
        pack_bit_planes,
    )
    from awry_tpu.build.suffix_array import build_suffix_array

    def phase(name, fn):
        t0 = time.perf_counter()
        out = fn()
        print(f"{name:30s} {time.perf_counter()-t0:8.2f}s", flush=True)
        return out

    sa = phase("SA-IS", lambda: build_suffix_array(text))
    text_syms = phase("encode_ascii", lambda: encode_ascii(Alphabet.NUCLEOTIDE, text))
    bwt_syms = phase("bwt gather", lambda: bwt_symbols_from_sa(text_syms, sa))
    phase("pack_bit_planes", lambda: pack_bit_planes(bwt_syms, Alphabet.NUCLEOTIDE))
    phase("milestones", lambda: compute_milestones(bwt_syms, Alphabet.NUCLEOTIDE))

    mark_ratio = 1
    def marks():
        from awry_tpu.index import SYMBOLS_PER_BLOCK
        num_blocks = -(-sa.shape[0] // SYMBOLS_PER_BLOCK)
        marked = np.zeros(num_blocks * SYMBOLS_PER_BLOCK, dtype=np.uint8)
        marked[: sa.shape[0]] = (sa % mark_ratio) == 0
        np.packbits(marked, bitorder="little")
        sa[marked[: sa.shape[0]].astype(bool)].astype(np.uint64)
    phase("marks+text_sampled_sa", marks)

    def textpack():
        bits, spw = 4, 8
        n_words = -(-(len(text_syms) + 1) // spw)
        padded_syms = np.zeros(n_words * spw, dtype=np.uint32)
        padded_syms[: len(text_syms)] = text_syms
        text_packed = np.zeros(n_words, dtype=np.uint32)
        for j in range(spw):
            text_packed |= padded_syms[j::spw] << np.uint32(4 * j)
    phase("text_packed", textpack)


if __name__ == "__main__":
    main()
