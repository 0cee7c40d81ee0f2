"""Benchmark driver: count+locate queries/sec on one chip.

Config mirrors BASELINE.json config #1 (E. coli scale): ~4.6 Mbp nucleotide
text, 10k 30-mer queries drawn from the text, count + locate.  The reference
publishes no numbers and the image has no Rust toolchain to run AWRY itself
(BASELINE.md), so vs_baseline is computed against a documented estimate of
AWRY's 32-thread CPU throughput (see BASELINE.md "Measured baseline").

Prints exactly ONE JSON line to stdout.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

# Estimated AWRY 32-thread CPU count+locate throughput for this config
# (AvxWindowFMIndex-class engines: ~50-100 ns/rank, 2 ranks/symbol, 30-symbol
# queries, plus the locate LF-walk; see BASELINE.md).
AWRY_32T_ESTIMATE_QPS = 5.0e6

GENOME_BP = 4_600_000
NUM_QUERIES = 10_000
QUERY_LEN = 30
SA_RATIO = 8
KMER_LEN = 10


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def main() -> None:
    import jax

    from awry_tpu import Alphabet, FmBuildArgs, build_from_records
    from awry_tpu.ops import FmQueryEngine

    rng = np.random.default_rng(0)
    log(f"generating {GENOME_BP/1e6:.1f} Mbp synthetic genome...")
    seq = bytes(rng.choice(np.frombuffer(b"ACGT", dtype=np.uint8), size=GENOME_BP))

    t0 = time.perf_counter()
    index = build_from_records(
        [("bench_genome", seq)],
        FmBuildArgs(
            alphabet=Alphabet.NUCLEOTIDE,
            suffix_array_compression_ratio=SA_RATIO,
            lookup_table_kmer_len=KMER_LEN,
        ),
    )
    log(f"index built in {time.perf_counter()-t0:.1f}s "
        f"({index.memory_report()['total']/1e6:.1f} MB host)")

    starts = rng.integers(0, GENOME_BP - QUERY_LEN, size=NUM_QUERIES)
    queries = [seq[s : s + QUERY_LEN] for s in starts]

    engine = FmQueryEngine(index)
    log(f"platform: {jax.default_backend()}, devices: {jax.devices()}")

    # Warm up (compile) then measure.
    engine.count_batch(queries)
    engine.locate_batch(queries[:1024])

    best_qps = 0.0
    for trial in range(3):
        t0 = time.perf_counter()
        counts = engine.count_batch(queries)
        t_count = time.perf_counter() - t0

        t0 = time.perf_counter()
        locs = engine.locate_batch(queries)
        t_locate = time.perf_counter() - t0

        qps = NUM_QUERIES / (t_count + t_locate)
        best_qps = max(best_qps, qps)
        log(
            f"trial {trial}: count {NUM_QUERIES/t_count:,.0f} q/s, "
            f"locate {NUM_QUERIES/t_locate:,.0f} q/s, combined {qps:,.0f} q/s"
        )

    # Sanity: every query drawn from the text must occur at least once.
    assert (counts >= 1).all(), "benchmark correctness check failed"
    assert all(len(l) >= 1 for l in locs)

    print(
        json.dumps(
            {
                "metric": "count+locate queries/sec/chip, 4.6Mbp DNA, 30bp queries",
                "value": round(best_qps, 1),
                "unit": "queries/s",
                "vs_baseline": round(best_qps / AWRY_32T_ESTIMATE_QPS, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
