"""Benchmark driver: count+locate queries/sec on one chip, per BASELINE config.

Measures the PRODUCT, not the kernel: every number flows through the public
``FmQueryEngine.count_locate_stream`` serving API (encode -> fused device
dispatch -> localization -> vectorized ragged assembly), pipelined depth-2 so
host assembly overlaps device compute.

Configs mirror BASELINE.json #1-#4 (synthetic texts at the same scales; the
image has no network access for real genome downloads, and no Rust toolchain
to run AWRY itself - vs_baseline is a documented estimate of AWRY's
32-thread CPU throughput, see BASELINE.md "Measured baseline").

Built indexes are cached under .bench_cache/ (gitignored) so repeated bench
runs skip the suffix-array build.

Prints exactly ONE JSON line to stdout: the headline metric (config #1,
comparable round over round) plus a "configs" array with every config's
numbers.  The same payload is written to bench_results.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

# Estimated AWRY 32-thread CPU count+locate throughput (AvxWindowFMIndex-class
# engines: ~50-100 ns per cache-missing rank, 2 ranks/symbol, ~20 post-seed
# symbols per 30 bp query, plus the locate LF-walk; imperfect 32-thread
# scaling, memory-bound; see BASELINE.md).
AWRY_32T_ESTIMATE_QPS = 5.0e6

CACHE_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".bench_cache")

CONFIGS = [
    # Mirrors BASELINE.json configs #1-#4 at the same scales (synthetic
    # texts; no network for real genomes, no Rust for AWRY itself), plus a
    # chr1-scale diagnostic config tracked since round 1 (BASELINE.md).
    # "mark" = locate_mark_ratio: text-order mark density bounding the device
    # LF-walk at mark-1 visits (4 B HBM per marked position; denser = faster
    # locate).  Small indexes afford mark=1 (zero-step walk).
    # Config #1 serves 512k-query batches: through this environment's
    # ~25 MB/s + ~20 ms/dispatch host<->device relay, smaller batches are
    # dominated by the fixed per-dispatch round trips (BASELINE.md); the
    # larger wire batch amortizes them exactly as a production server would.
    # chr20/chr1 serve 512k batches like config #1: the larger batch
    # amortizes the relay's fixed per-dispatch cost AND makes the random
    # SA/k-mer/fat reads dense enough for the sorted window sweep
    # (ops/sweep.py window_sweep_suits) - production servers batch at this
    # scale for the same reasons.
    dict(name="ecoli_4.6Mbp_dna", kind="dna", n=4_600_000, nq=524_288, qlen=30, k=10, mark=1),
    dict(name="chr20_64Mbp_dna", kind="dna", n=64_000_000, nq=524_288, qlen=30, k=13, mark=1),
    dict(name="swissprot_20Mres_amino", kind="amino", n=20_000_000, nq=262_144, qlen=12, k=5, mark=1),
    dict(name="chr1_250Mbp_dna", kind="dna", n=250_000_000, nq=524_288, qlen=30, k=13, mark=1),
    # GRCh38 at 512k: 131k requests over a 12M-block index are too sparse
    # for ANY window sweep (spans exceed the VMEM window cap); at 512k the
    # seed/rank/backstep sweeps engage.  (The final mark-rank SA read stays
    # a plain element gather: a 3.1 GB sa_sweep copy would not fit HBM.)
    dict(name="grch38_3.1Gbp_dna", kind="dna", n=3_100_000_000, nq=524_288, qlen=100, k=13, mark=4),
]

NUM_BATCHES = 4
TRIALS = 3
# Hits per query materialized by the fused path; queries with more hits take
# the exact overflow path INSIDE the measured time.  Text-drawn 30/100-mers
# at these scales are ~unique, so 2 is the realistic serving setting.
LOCATE_CAP = 2
SA_RATIO = 8


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def config_rng(cfg) -> np.random.Generator:
    """Deterministic PER-CONFIG stream: the text (and queries) for a config
    must not depend on which other configs ran before it, or a cached index
    silently mismatches the freshly drawn queries (the round-1 advisor's
    SA-cache lesson, relearned at bench level in round 2)."""
    import zlib

    return np.random.default_rng([0, zlib.crc32(cfg["name"].encode())])


def synth_text(cfg, rng) -> bytes:
    letters = b"ACGT" if cfg["kind"] == "dna" else b"ACDEFGHIKLMNPQRSTVWY"
    return bytes(rng.choice(np.frombuffer(letters, dtype=np.uint8), size=cfg["n"]))


def _text_digest(seq: bytes) -> str:
    import hashlib

    return hashlib.blake2b(seq, digest_size=16).hexdigest()


def build_or_load(cfg, seq: bytes):
    from awry_tpu import Alphabet, FmBuildArgs, build_from_records
    from awry_tpu.io.artifact import load_artifact, save_artifact

    os.makedirs(CACHE_DIR, exist_ok=True)
    cache = os.path.join(CACHE_DIR, cfg["name"] + ".npz")
    digest_file = cache + ".digest"
    digest = _text_digest(seq)
    if os.path.exists(cache):
        cached_digest = None
        if os.path.exists(digest_file):
            with open(digest_file) as f:
                cached_digest = f.read().strip()
        if cached_digest != digest:
            log(f"[{cfg['name']}] cached index text digest {cached_digest} != {digest}; rebuilding")
        else:
            t0 = time.perf_counter()
            index = load_artifact(cache)
            log(f"[{cfg['name']}] loaded cached index in {time.perf_counter()-t0:.1f}s")
            if (
                index.kmer_len == cfg["k"]
                and index.resolved_mark_ratio == cfg["mark"]
                and index.text_packed is not None
            ):
                return index, None
            log(f"[{cfg['name']}] cached kmer_len/mark_ratio/text "
                f"{index.kmer_len}/{index.resolved_mark_ratio}/"
                f"{index.text_packed is not None} != {cfg['k']}/{cfg['mark']}/True; rebuilding")
    alphabet = Alphabet.NUCLEOTIDE if cfg["kind"] == "dna" else Alphabet.AMINO
    t0 = time.perf_counter()
    index = build_from_records(
        [(cfg["name"], seq)],
        FmBuildArgs(
            alphabet=alphabet,
            suffix_array_compression_ratio=SA_RATIO,
            lookup_table_kmer_len=cfg["k"],
            build_kmer_table_on_device=cfg["k"] >= 12,
            locate_mark_ratio=cfg["mark"],
        ),
    )
    build_s = time.perf_counter() - t0
    log(f"[{cfg['name']}] built in {build_s:.1f}s ({index.memory_report()['total']/1e6:.0f} MB host)")
    save_artifact(index, cache, compress=False)  # multi-GB random text: zlib costs minutes
    with open(digest_file, "w") as f:
        f.write(digest)
    return index, build_s


def run_config(cfg):
    import jax

    from awry_tpu.ops import FmQueryEngine

    log(f"=== {cfg['name']}: {cfg['n']/1e6:.0f}M symbols, "
        f"{cfg['nq']} x {cfg['qlen']}-symbol queries, k={cfg['k']} ===")
    rng = config_rng(cfg)
    seq = synth_text(cfg, rng)
    index, build_s = build_or_load(cfg, seq)
    engine = FmQueryEngine(index)

    batches, batch_queries = [], []
    for _ in range(NUM_BATCHES):
        starts = rng.integers(0, cfg["n"] - cfg["qlen"], size=cfg["nq"])
        queries = [seq[s : s + cfg["qlen"]] for s in starts]
        qsyms, qlens = engine.encode_queries(queries)
        batches.append((qsyms, qlens, len(queries)))
        batch_queries.append((starts, queries))

    # Warm up (compile) + correctness gate on batch 0 through the public API.
    counts, seq_idx, local, offsets = next(
        engine.count_locate_stream([batches[0]], cap=LOCATE_CAP)
    )
    assert (counts >= 1).all(), "text-drawn query not found: correctness bug"
    starts0, queries0 = batch_queries[0]
    seq_starts = index.seq_starts
    for i in rng.integers(0, cfg["nq"], size=64):
        hits = local[offsets[i] : offsets[i + 1]]
        for p in hits.tolist():
            gp = int(seq_starts[0]) + p  # single-record text: local == global
            assert seq[gp : gp + cfg["qlen"]] == queries0[i], (i, p)
        assert int(starts0[i]) in [int(x) for x in hits], i

    best_qps, best_ms = 0.0, 0.0
    for trial in range(TRIALS):
        t0 = time.perf_counter()
        for _out in engine.count_locate_stream(batches, cap=LOCATE_CAP):
            pass
        dt = time.perf_counter() - t0
        qps = NUM_BATCHES * cfg["nq"] / dt
        if qps > best_qps:
            best_qps, best_ms = qps, dt / NUM_BATCHES * 1e3
        log(f"[{cfg['name']}] trial {trial}: {qps:,.0f} q/s sustained "
            f"({dt/NUM_BATCHES*1e3:.1f} ms/batch of {cfg['nq']})")

    # Secondary metric: device-compute-only sustained rate (results reduced
    # on device; isolates the chip from this environment's slow host relay —
    # on PCIe-local hardware the public API approaches this number).
    dev_qps = engine.device_sustained_qps(batches, cap=LOCATE_CAP, trials=TRIALS)
    log(f"[{cfg['name']}] device-compute-only: {dev_qps:,.0f} q/s sustained")

    result = {
        "config": cfg["name"],
        "queries_per_sec": round(best_qps, 1),
        "device_queries_per_sec": round(dev_qps, 1),
        "batch_ms": round(best_ms, 2),
        "num_queries": cfg["nq"],
        "query_len": cfg["qlen"],
        "kmer_len": cfg["k"],
        "locate_cap": LOCATE_CAP,
        "api": "count_locate_stream",
    }
    if build_s is not None:
        result["build_seconds"] = round(build_s, 1)
    return result


def main() -> None:
    import jax

    only = set(sys.argv[1:])
    log(f"platform: {jax.default_backend()}, devices: {jax.devices()}")

    results = []
    for cfg in CONFIGS:
        if only and cfg["name"] not in only:
            continue
        try:
            results.append(run_config(cfg))
        except Exception as e:  # noqa: BLE001
            log(f"[{cfg['name']}] FAILED: {type(e).__name__}: {e}")
            results.append({"config": cfg["name"], "error": f"{type(e).__name__}: {e}"})
        # Drop the config's engine/device buffers before the next (largest
        # config needs ~10 GB of the 16 GB HBM).
        import gc

        gc.collect()

    # Headline = the chr1 config: BASELINE.json's stated metric is
    # "count+locate queries/sec/chip on human chr1 index, 30bp queries"
    # (rounds 1 and early 2 reported config #1 / E. coli here; both remain
    # in the configs array for round-over-round comparison).
    headline = next(
        (r for r in results if r.get("config") == "chr1_250Mbp_dna" and "queries_per_sec" in r),
        None,
    )
    value = headline["queries_per_sec"] if headline else 0.0
    payload = {
        "metric": "count+locate queries/sec/chip, human-chr1-scale 250Mbp DNA index, 30bp queries",
        "value": value,
        "unit": "queries/s",
        "vs_baseline": round(value / AWRY_32T_ESTIMATE_QPS, 4),
        "api": "public count_locate_stream (encode + localize + ragged assembly included)",
        "configs": results,
    }
    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)), "bench_results.json"), "w") as f:
        json.dump(payload, f, indent=2)
    print(json.dumps(payload))


if __name__ == "__main__":
    main()
