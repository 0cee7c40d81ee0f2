"""Benchmark driver: count+locate queries/sec on one chip.

Config mirrors BASELINE.json config #1 (E. coli scale): ~4.6 Mbp nucleotide
text, 30 bp queries drawn from the text, fused count + locate.  Sustained
throughput is measured by pipelining independent pre-encoded batches through
the device (JAX async dispatch overlaps host<->device transfers with
compute); latency per batch is reported on stderr.

The reference publishes no numbers and the image has no Rust toolchain to
run AWRY itself (BASELINE.md), so vs_baseline is computed against a
documented estimate of AWRY's 32-thread CPU throughput (BASELINE.md
"Measured baseline").

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
QUERIES_PER_BATCH = 131_072  # fills the power-of-two padding bucket exactly
NUM_BATCHES = 4
QUERY_LEN = 30
SA_RATIO = 8
KMER_LEN = 10
LOCATE_CAP = 2


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def main() -> None:
    import jax
    import jax.numpy as jnp

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

    engine = FmQueryEngine(index)
    log(f"platform: {jax.default_backend()}, devices: {jax.devices()}")

    batches = []
    batch_queries = []
    for _ in range(NUM_BATCHES):
        starts = rng.integers(0, GENOME_BP - QUERY_LEN, size=QUERIES_PER_BATCH)
        queries = [seq[s : s + QUERY_LEN] for s in starts]
        batches.append(engine.encode_queries(queries))
        batch_queries.append(queries)

    fn = engine._count_locate_fn
    dev = engine.device_index

    # Warm up (compile), then validate correctness on one batch.
    counts, text_pos = fn(dev, *batches[0], cap=LOCATE_CAP)
    jax.block_until_ready(counts)
    c0 = np.asarray(counts)[:QUERIES_PER_BATCH]
    assert (c0 >= 1).all(), "text-drawn query not found: correctness bug"

    best_qps = 0.0
    for trial in range(3):
        t0 = time.perf_counter()
        outs = [fn(dev, qs, ql, cap=LOCATE_CAP) for qs, ql in batches]
        jax.block_until_ready(outs)
        dt = time.perf_counter() - t0
        qps = NUM_BATCHES * QUERIES_PER_BATCH / dt
        best_qps = max(best_qps, qps)
        log(
            f"trial {trial}: {qps:,.0f} q/s sustained "
            f"({dt/NUM_BATCHES*1e3:.1f} ms/batch of {QUERIES_PER_BATCH})"
        )

    # Spot-check: every located position must actually spell its query.
    counts, text_pos = outs[0]
    counts0 = np.asarray(counts)[:QUERIES_PER_BATCH]
    local0 = np.asarray(text_pos)[:QUERIES_PER_BATCH]
    assert (counts0 >= 1).all(), "text-drawn query not found"
    for i in rng.integers(0, QUERIES_PER_BATCH, size=64):
        n_hits = min(int(counts0[i]), LOCATE_CAP)
        for j in range(n_hits):
            p = int(local0[i, j])
            assert seq[p : p + QUERY_LEN] == batch_queries[0][i], (i, j, p)
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
