"""Benchmark driver: count+locate queries/sec on one chip, per BASELINE config.

Measures the PRODUCT, not the kernel: every number flows through the public
``FmQueryEngine.count_locate_stream`` serving API (encode -> fused device
dispatch -> localization -> vectorized ragged assembly), pipelined depth-2 so
host assembly overlaps device compute.

Configs mirror BASELINE.json #1-#4 (synthetic texts at the same scales; the
image has no network access for real genome downloads, and no Rust toolchain
to run AWRY itself - vs_baseline is a documented estimate of AWRY's
32-thread CPU throughput, see BASELINE.md "Measured baseline"), plus a
repetitive-text config exercising the wide-lane / re-dispatch machinery.

Robustness contract (round-2 verdict task 1):
  * The HEADLINE config (chr1: BASELINE.json's stated metric) runs FIRST.
  * bench_results.json is rewritten after EVERY config, so a timeout still
    leaves a parseable partial result with the headline populated.
  * SIGTERM/SIGINT print the current payload JSON line before exiting, so a
    driver `timeout` kill still captures parseable stdout.
  * Each config explicitly releases its device buffers (engine.release())
    before the next one builds - gc.collect() alone demonstrably left the
    previous config's HBM live (round-2 RESOURCE_EXHAUSTED).

Built indexes are cached under .bench_cache/ (gitignored) so repeated bench
runs skip the suffix-array build.

Prints exactly ONE JSON line to stdout: a COMPACT headline-only record
(metric/value/unit/vs_baseline, <300 bytes) — the driver's stdout capture
truncates long lines, and rounds 3-4 recorded rc=124/parsed=null because
the SIGTERM flush printed the full >2.3 KB multi-config payload.  The full
matrix (every config's numbers) lives in bench_results.json.
"""

from __future__ import annotations

import gc
import json
import os
import signal
import sys
import time

# Persistent compilation cache BEFORE jax loads anywhere: through the
# remote-compile relay every fused serving program costs 20-60 s to build;
# the cache (validated against the axon backend: 4.2 s -> 0.95 s across
# processes) lets a fresh driver run reuse every program compiled by
# rehearsals under the same config matrix.
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"),
)

import numpy as np

# AWRY 32-thread CPU count+locate throughput: the vs_baseline denominator.
# Measured when BASELINE_CPU.json exists (scripts/dump_cpu_ref.py runs the
# reference's hot path — AVX2 windowed rank, full backward search,
# row-sampled locate walk — reimplemented at instruction level on this
# host's cores and scaled to 32 threads); estimate otherwise (~50-100 ns
# per cache-missing rank, 2 ranks/symbol, 30 symbols + locate walk per
# query; see BASELINE.md).
AWRY_32T_ESTIMATE_QPS = 5.0e6


def _baseline_qps() -> tuple[float, str]:
    try:
        with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "BASELINE_CPU.json")) as f:
            m = json.load(f)
        per_thread = m["queries_per_sec"] / m["threads"]
        return per_thread * 32, (
            f"measured {m['queries_per_sec']:.0f} q/s on {m['threads']} host "
            "threads (scripts/dump_cpu_ref.py), scaled to the 32-thread target"
        )
    except (OSError, ValueError, KeyError, ZeroDivisionError):
        return AWRY_32T_ESTIMATE_QPS, "estimate (BASELINE.md); BASELINE_CPU.json absent"

CACHE_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".bench_cache")

CONFIGS = [
    # Mirrors BASELINE.json configs #1-#4 at the same scales (synthetic
    # texts; no network for real genomes, no Rust for AWRY itself).
    # "mark" = locate_mark_ratio: text-order mark density bounding the device
    # LF-walk at mark-1 visits (4 B HBM per marked position; denser = faster
    # locate).  Small indexes afford mark=1 (zero-step walk).
    # All DNA configs serve 512k-query batches (Swiss-Prot 262k): through
    # this environment's ~25 MB/s + ~20 ms/dispatch host<->device relay,
    # smaller batches are dominated by the fixed per-dispatch round trips,
    # AND the random SA/k-mer/fat-row reads need request density for the
    # sorted window sweep (ops/sweep.py) - production servers batch at this
    # scale for the same reasons.
    #
    # HEADLINE FIRST: chr1 is BASELINE.json's stated metric ("count+locate
    # q/s/chip on human chr1 index, 30 bp queries"); running it first means
    # a driver timeout still records the headline.
    # k=13 classic: the round-3 k=14 slot experiment measured HONESTLY
    # (after the round-4 coverage fix made its redis flag truthful) loses on
    # device compute (7.3M vs 8.6M q/s) AND quadruples the shipped
    # footprint (10.9 GB vs ~3 GB: ~11 min of relay upload per engine
    # construction) - classic k=13 wins on both axes.
    dict(name="chr1_250Mbp_dna", kind="dna", n=250_000_000, nq=524_288, qlen=30, k=13, mark=1),
    dict(name="ecoli_4.6Mbp_dna", kind="dna", n=4_600_000, nq=524_288, qlen=30, k=10, mark=1),
    dict(name="chr20_64Mbp_dna", kind="dna", n=64_000_000, nq=524_288, qlen=30, k=13, mark=1),
    dict(name="swissprot_20Mres_amino", kind="amino", n=20_000_000, nq=262_144, qlen=12, k=5, mark=1),
    # GRCh38: 512k batches - 131k requests over a 12M-block index are too
    # sparse for the window sweep (spans exceed the VMEM window cap); at
    # 512k the seed/rank/backstep sweeps engage.  (The final mark-rank SA
    # read stays a plain element gather: a 3.1 GB sa_sweep copy would not
    # fit HBM.)
    # Repetitive-text config (round-2 verdict task 6): ~35% of the text is
    # mutated copies of a small repeat family (Alu-like), so text-drawn
    # 30-mers have a heavy-tailed hit distribution (~159 hits/query) - wide
    # lanes, re-dispatch and the over-cap walk all run INSIDE the measured
    # time (uniform-random text never fires them).  Rates are recorded in
    # the result.  Exact full locate moves ~333 MB of positions per 512k
    # batch; through this rig's ~26 MB/s relay that transfer IS the batch
    # time (locations_per_sec is the honest rate; device q/s isolates the
    # chip) - so it runs with a trimmed batch/trial budget, after every
    # uniform-text config.
    dict(name="chr1rep_250Mbp_dna", kind="dna_repetitive", n=250_000_000, nq=524_288,
         qlen=30, k=13, mark=1, batches=2, trials=2,
         note="exact full locate: ~159 hits/query; e2e bound by the "
              "~26 MB/s host relay moving ~333 MB of positions per batch "
              "(locations_per_sec and device q/s isolate the engine)"),
    # GRCh38 runs AFTER every 250 Mbp-class config: its cold build (3.1 Gbp
    # SA-IS, ~25 min) is the single longest phase in the matrix, and a
    # driver timeout inside it must not cost the cheaper rows.  "heavy"
    # configs additionally skip the cold build entirely once the heavy
    # deadline passes (a cached index always serves).
    dict(name="grch38_3.1Gbp_dna", kind="dna", n=3_100_000_000, nq=524_288, qlen=100,
         k=13, mark=4, heavy=True),
    # Pan-genome (BASELINE.json config #5): >10 Gbp federated across 4
    # partitions (PartitionedFmIndex, exact overlap-tail semantics), all
    # four served from ONE chip here (deployments place partitions on their
    # own hosts/chips; the per-chip number below therefore divides by the
    # partition count relative to a one-partition-per-chip layout).
    # Runs LAST and only from cached partitions under a driver deadline —
    # the ~45-min federation build needs AWRY_BENCH_BUILD_PANGENOME=1.
    dict(name="pangenome_10.3Gbp_federated", kind="pangenome", n=10_320_000_000,
         records=40, nq=524_288, qlen=30, k=11, mark=32, max_query_len=32,
         partition_cap=2_600_000_000),
]

NUM_BATCHES = 4
TRIALS = 3
# Hits per query materialized by the fused path; queries with more hits take
# the exact overflow path INSIDE the measured time.
LOCATE_CAP = 2
SA_RATIO = 8

HEADLINE_CONFIG = "chr1_250Mbp_dna"
HEADLINE_METRIC = (
    "count+locate queries/sec/chip, human-chr1-scale 250Mbp DNA index, 30bp queries"
)

_RESULTS_PATH = os.path.join(os.path.dirname(os.path.abspath(__file__)), "bench_results.json")
_payload: dict | None = None
_relay: dict | None = None  # this session's measured link speed (_relay_probe)


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def _make_payload(results: list[dict], partial: bool) -> dict:
    headline = next(
        (r for r in results if r.get("config") == HEADLINE_CONFIG and "queries_per_sec" in r),
        None,
    )
    value = headline["queries_per_sec"] if headline else 0.0
    base_qps, base_src = _baseline_qps()
    payload = {
        "metric": HEADLINE_METRIC,
        "value": value,
        "unit": "queries/s",
        "vs_baseline": round(value / base_qps, 4),
        "baseline_qps": round(base_qps, 1),
        "baseline_source": base_src,
        "api": "public count_locate_stream (encode + localize + ragged assembly included)",
        "configs": results,
    }
    if _relay is not None:
        payload.update(_relay)
    if partial:
        payload["partial"] = True
    return payload


def _merge_previous(results: list[dict]) -> list[dict]:
    """Carry forward configs the current run has not (re)measured: an
    interrupted run must never erase the last full matrix (round-3 verdict
    task 7 — commit 30e517c had to hand-restore exactly this).  Rows kept
    from the previous file are tagged "carried_from_previous_run".  A row
    this run only SKIPPED (deadline guard, missing cache) likewise yields to
    a previous measured row — a skip is an absence of data, not data."""
    try:
        with open(_RESULTS_PATH) as f:
            prev = {r.get("config"): r for r in json.load(f).get("configs", [])}
    except (OSError, ValueError):
        return results
    merged, done = [], set()
    for r in results:
        name = r.get("config")
        done.add(name)
        p = prev.get(name)
        if "skipped" in r and p is not None and ("queries_per_sec" in p or "error" in p):
            p = dict(p)
            p["carried_from_previous_run"] = True
            p["skip_note"] = r["skipped"]
            merged.append(p)
        else:
            merged.append(r)
    for name, row in prev.items():
        if name not in done and ("queries_per_sec" in row or "error" in row):
            row = dict(row)
            row["carried_from_previous_run"] = True
            merged.append(row)
    return merged


def _checkpoint(results: list[dict], partial: bool = True) -> None:
    """Rewrite bench_results.json NOW (after every config): a driver timeout
    must still leave a parsed headline on disk."""
    global _payload
    _payload = _make_payload(_merge_previous(results), partial)
    tmp = _RESULTS_PATH + ".tmp"
    with open(tmp, "w") as f:
        json.dump(_payload, f, indent=2)
        f.write("\n")
    os.replace(tmp, _RESULTS_PATH)


def _compact_line(payload: dict) -> str:
    """The ONE stdout JSON line: headline fields only, guaranteed small.
    The driver's tail capture truncates long stdout lines — printing the
    full multi-config payload on SIGTERM is exactly what made BENCH_r03/r04
    record parsed=null while the real matrix sat in bench_results.json."""
    keys = ("metric", "value", "unit", "vs_baseline", "baseline_qps", "partial")
    return json.dumps({k: payload[k] for k in keys if k in payload})


def _emit_and_exit(signum, frame):  # noqa: ARG001
    """SIGTERM (driver timeout) / SIGINT: flush the compact headline line as
    the one stdout JSON line, then exit cleanly."""
    if _payload is not None:
        print(_compact_line(_payload), flush=True)
    os._exit(0)  # noqa: SLF001  (jax runtime threads can hang sys.exit)


def config_rng(cfg) -> np.random.Generator:
    """Deterministic PER-CONFIG stream: the text (and queries) for a config
    must not depend on which other configs ran before it, or a cached index
    silently mismatches the freshly drawn queries (the round-1 advisor's
    SA-cache lesson, relearned at bench level in round 2)."""
    import zlib

    return np.random.default_rng([0, zlib.crc32(cfg["name"].encode())])


def synth_text(cfg, rng) -> bytes:
    if cfg["kind"] == "dna_repetitive":
        return synth_repetitive_dna(cfg["n"], rng)
    letters = b"ACGT" if cfg["kind"] == "dna" else b"ACDEFGHIKLMNPQRSTVWY"
    return bytes(rng.choice(np.frombuffer(letters, dtype=np.uint8), size=cfg["n"]))


def synth_repetitive_dna(n: int, rng) -> bytes:
    """Genome-like repeat structure: a random backbone with ~35% of positions
    overwritten by point-mutated (10%) copies of a 4-element x 300 bp repeat
    family.  Text-drawn 30-mers then hit 1..hundreds of sites (0.9^60 x
    ~290k instances ~ tens of cross-copy exact matches), exercising wide
    lanes, redis re-dispatch and cap overflow inside the measured loop."""
    text = rng.choice(np.frombuffer(b"ACGT", dtype=np.uint8), size=n)
    rep_len, coverage, n_family, mut = 300, 0.35, 4, 0.10
    m = int(n * coverage / rep_len)
    family = rng.choice(np.frombuffer(b"ACGT", dtype=np.uint8), size=(n_family, rep_len))
    inst = family[rng.integers(0, n_family, size=m)]  # [m, rep_len]
    mut_mask = rng.random((m, rep_len)) < mut
    inst = np.where(mut_mask, rng.choice(np.frombuffer(b"ACGT", dtype=np.uint8), size=(m, rep_len)), inst)
    starts = rng.integers(0, n - rep_len, size=m)
    # Scatter whole instances; overlaps just overwrite (like real nested repeats).
    idx = starts[:, None] + np.arange(rep_len)[None, :]
    text[idx.reshape(-1)] = inst.reshape(-1)
    return bytes(text)


def _text_digest(seq: bytes) -> str:
    import hashlib

    return hashlib.blake2b(seq, digest_size=16).hexdigest()


_META_KEYS = ("n", "kind", "k", "mark")  # build-relevant config fields


def _write_cache_meta(cfg) -> None:
    meta_path = os.path.join(CACHE_DIR, cfg["name"] + ".npz.meta.json")
    with open(meta_path, "w") as f:
        json.dump({k: cfg[k] for k in _META_KEYS}, f)


def cache_valid_quick(cfg) -> bool:
    """Cheap cache-validity check for the heavy-build deadline guard: no
    text generation, no multi-GB artifact load.  The .npz + text-digest
    sidecar must exist and the params sidecar must match the config's
    build-relevant fields (a present-but-stale cache previously passed the
    bare os.path.exists guard and started the ~25-min cold SA-IS build past
    the deadline — advisor finding).  ``build_or_load`` remains the
    authoritative check (it has the text and the artifact); a pre-sidecar
    cache (rounds <=4) is treated as valid, preserving old behavior."""
    cache = os.path.join(CACHE_DIR, cfg["name"] + ".npz")
    if not (os.path.exists(cache) and os.path.exists(cache + ".digest")):
        return False
    try:
        with open(cache + ".meta.json") as f:
            meta = json.load(f)
    except (OSError, ValueError):
        return True
    return all(meta.get(k) == cfg[k] for k in _META_KEYS)


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
                _write_cache_meta(cfg)  # upgrade pre-sidecar caches in place
                return index, None
            log(f"[{cfg['name']}] cached kmer_len/mark_ratio/text "
                f"{index.kmer_len}/{index.resolved_mark_ratio}/"
                f"{index.text_packed is not None} != {cfg['k']}/{cfg['mark']}/True; rebuilding")
    alphabet = Alphabet.NUCLEOTIDE if cfg["kind"].startswith("dna") else Alphabet.AMINO
    import logging

    logging.basicConfig(stream=sys.stderr)
    logging.getLogger("awry_tpu.build").setLevel(logging.INFO)
    t0 = time.perf_counter()
    index = build_from_records(
        [(cfg["name"], seq)],
        FmBuildArgs(
            alphabet=alphabet,
            suffix_array_compression_ratio=SA_RATIO,
            lookup_table_kmer_len=cfg["k"],
            # Counting construction (build/kmer_count.py): the k=14 chr1
            # table in ~15 s host-side vs 449 s of device range updates.
            build_kmer_table_on_device=False,
            locate_mark_ratio=cfg["mark"],
            # SA sidecar: a build interrupted after SA-IS (driver timeout,
            # OOM in a later phase) resumes without redoing the ~10-min sort.
            suffix_array_output_src=cache + ".sa.npy",
            remove_intermediate_suffix_array_file=True,
        ),
    )
    build_s = time.perf_counter() - t0
    log(f"[{cfg['name']}] built in {build_s:.1f}s ({index.memory_report()['total']/1e6:.0f} MB host)")
    save_artifact(index, cache, compress=False)  # multi-GB random text: zlib costs minutes
    with open(digest_file, "w") as f:
        f.write(digest)
    _write_cache_meta(cfg)
    return index, build_s


def _pangenome_record(cfg, i: int) -> bytes:
    """Record i of the pan-genome corpus, independently regenerable (the
    10 GB corpus is never rebuilt just to draw queries: each record has its
    own deterministic stream)."""
    import zlib

    rng = np.random.default_rng([0, zlib.crc32(cfg["name"].encode()), i])
    n_rec = cfg["n"] // cfg["records"]
    return bytes(rng.choice(np.frombuffer(b"ACGT", dtype=np.uint8), size=n_rec))


def _pangenome_params_digest(cfg) -> str:
    import hashlib

    key = json.dumps({k: cfg[k] for k in sorted(cfg)}, sort_keys=True) + "|corpus-v1"
    return hashlib.blake2b(key.encode(), digest_size=16).hexdigest()


def run_pangenome(cfg, deadline: float | None):
    """Config #5: federated count+locate over a >10 Gbp corpus on one chip."""
    import time as _time

    from awry_tpu import Alphabet, FmBuildArgs
    from awry_tpu.ops.engine import FmQueryEngine
    from awry_tpu.parallel.partitioned import PartitionedFmIndex

    cache_dir = os.path.join(CACHE_DIR, cfg["name"])
    digest_file = os.path.join(cache_dir, "params.digest")
    digest = _pangenome_params_digest(cfg)
    cached = (
        os.path.isdir(cache_dir)
        and os.path.exists(digest_file)
        and open(digest_file).read().strip() == digest
    )
    build_s = None
    if not cached:
        if os.environ.get("AWRY_BENCH_BUILD_PANGENOME") != "1":
            return {
                "config": cfg["name"],
                "skipped": "no cached federation; set AWRY_BENCH_BUILD_PANGENOME=1 "
                           "to build (~45 min, 4x 2.6 Gbp partitions)",
            }
        log(f"[{cfg['name']}] building {cfg['n']/1e9:.1f} Gbp federation "
            f"({cfg['records']} records, cap {cfg['partition_cap']/1e9:.2f} Gbp)")
        t0 = _time.perf_counter()
        records = [(f"rec_{i}", _pangenome_record(cfg, i)) for i in range(cfg["records"])]
        pfm = PartitionedFmIndex.build_from_records(
            records,
            FmBuildArgs(
                alphabet=Alphabet.NUCLEOTIDE,
                suffix_array_compression_ratio=SA_RATIO,
                lookup_table_kmer_len=cfg["k"],
                locate_mark_ratio=cfg["mark"],
            ),
            max_partition_symbols=cfg["partition_cap"],
            max_query_len=cfg["max_query_len"],
            num_workers=int(os.environ.get("AWRY_PANGENOME_WORKERS", "1")),
            consume_input=True,
        )
        del records
        pfm.save(cache_dir)
        with open(digest_file, "w") as f:
            f.write(digest)
        build_s = _time.perf_counter() - t0
        log(f"[{cfg['name']}] built + saved in {build_s:.0f}s")
    else:
        if deadline is not None and time.perf_counter() > deadline:
            return {
                "config": cfg["name"],
                "skipped": "driver deadline reached before the pan-genome config",
            }
        t0 = _time.perf_counter()
        pfm = PartitionedFmIndex.load(cache_dir)
        log(f"[{cfg['name']}] loaded {len(pfm.partitions)}-partition federation "
            f"in {_time.perf_counter()-t0:.0f}s")

    # Attach single-copy LEAN engines (no sweep doubling, no slim search
    # copy, no row-sampled SA: 4 partitions x 2.6 Gbp must share one chip's
    # ~16 GB HBM - the full per-partition footprint RESOURCE_EXHAUSTs;
    # per-host deployments would enable the fat layouts).
    for part in pfm.partitions:
        part.engine = FmQueryEngine(part.index, use_sweep=False, lean=True)

    rng = config_rng(cfg)
    src_recs = {int(i): _pangenome_record(cfg, int(i)) for i in rng.integers(0, cfg["records"], size=4)}
    n_rec = cfg["n"] // cfg["records"]
    batches = []
    for _ in range(2):
        recs = rng.choice(np.asarray(sorted(src_recs)), size=cfg["nq"])
        offs = rng.integers(0, n_rec - cfg["qlen"], size=cfg["nq"])
        batches.append(([src_recs[int(r)][o : o + cfg["qlen"]] for r, o in zip(recs, offs)],
                        recs, offs))

    # Warmup + oracle gate on batch 0.
    queries0, recs0, offs0 = batches[0]
    counts, rec_idx, loc, offsets = pfm.count_locate_arrays(queries0, cap=LOCATE_CAP)
    assert (counts >= 1).all(), "drawn pan-genome query not found: correctness bug"
    gstart = {r: int(pfm.seq_starts[r]) for r in src_recs}
    for i in rng.integers(0, cfg["nq"], size=32):
        span = slice(offsets[i], offsets[i + 1])
        pairs = list(zip(rec_idx[span].tolist(), loc[span].tolist()))
        assert (int(recs0[i]), int(offs0[i])) in pairs, i
        for r, p in pairs:
            if r in src_recs:
                assert src_recs[r][p : p + cfg["qlen"]] == queries0[i], (i, r, p)

    best_qps = 0.0
    for trial in range(TRIALS):
        t0 = time.perf_counter()
        for queries, _, _ in batches:
            pfm.count_locate_arrays(queries, cap=LOCATE_CAP)
        dt = time.perf_counter() - t0
        qps = len(batches) * cfg["nq"] / dt
        best_qps = max(best_qps, qps)
        log(f"[{cfg['name']}] trial {trial}: {qps:,.0f} q/s sustained "
            f"({len(pfm.partitions)} partitions on one chip)")

    result = {
        "config": cfg["name"],
        "queries_per_sec": round(best_qps, 1),
        "partitions": len(pfm.partitions),
        "total_gbp": round(cfg["n"] / 1e9, 2),
        "num_queries": cfg["nq"],
        "query_len": cfg["qlen"],
        "kmer_len": cfg["k"],
        "locate_cap": LOCATE_CAP,
        "api": "PartitionedFmIndex.count_locate_arrays",
        "note": "4 partitions federated on ONE chip; per-host deployments serve "
                "one partition per chip (multiply by partition count)",
        "oracle": "counts>=1 on 1M drawn queries batch + 32 position spot-checks",
    }
    if build_s is not None:
        result["build_seconds"] = round(build_s, 1)
    for part in pfm.partitions:
        if part.engine:
            part.engine.release()
    return result


def run_config(cfg, checkpoint_cb=None):
    from awry_tpu.ops import FmQueryEngine

    log(f"=== {cfg['name']}: {cfg['n']/1e6:.0f}M symbols, "
        f"{cfg['nq']} x {cfg['qlen']}-symbol queries, k={cfg['k']} ===")
    rng = config_rng(cfg)
    seq = synth_text(cfg, rng)
    index, build_s = build_or_load(cfg, seq)
    import logging

    logging.basicConfig(stream=sys.stderr)
    logging.getLogger("awry_tpu.ship").setLevel(logging.INFO)
    t_eng = time.perf_counter()
    engine = FmQueryEngine(index)
    log(f"[{cfg['name']}] engine constructed in {time.perf_counter()-t_eng:.1f}s")
    try:
        return _run_config_inner(cfg, rng, seq, index, engine, build_s, checkpoint_cb)
    finally:
        # Free this config's HBM before the next one builds (round-2 OOM).
        engine.release()
        del engine, index
        gc.collect()


def _run_config_inner(cfg, rng, seq, index, engine, build_s, checkpoint_cb=None):
    num_batches = cfg.get("batches", NUM_BATCHES)
    trials = cfg.get("trials", TRIALS)
    batches, batch_queries = [], []
    for _ in range(num_batches):
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

    for k in engine.stats:
        engine.stats[k] = 0
    best_qps, best_ms, best_hps, total_hits = 0.0, 0.0, 0.0, 0
    for trial in range(trials):
        t0 = time.perf_counter()
        total_hits = 0
        for _counts, _si, _loc, offs in engine.count_locate_stream(batches, cap=LOCATE_CAP):
            total_hits += int(offs[-1])
        dt = time.perf_counter() - t0
        qps = num_batches * cfg["nq"] / dt
        if qps > best_qps:
            best_qps, best_ms = qps, dt / num_batches * 1e3
        # Locations/sec: the fairer rate on repetitive texts, where exact
        # full locate returns ~100+ hits/query (chr1rep: ~159) and the
        # position volume, not the query count, is the work.
        best_hps = max(best_hps, total_hits / dt)
        log(f"[{cfg['name']}] trial {trial}: {qps:,.0f} q/s sustained "
            f"({dt/num_batches*1e3:.1f} ms/batch of {cfg['nq']}, "
            f"{total_hits/num_batches/cfg['nq']:.1f} hits/q)")

    stats = dict(engine.stats)

    if checkpoint_cb is not None:
        # Flush the e2e headline NOW: a driver timeout during the (slower)
        # device-compute probe below must not cost the recorded number.
        checkpoint_cb({
            "config": cfg["name"],
            "queries_per_sec": round(best_qps, 1),
            "num_queries": cfg["nq"],
            "query_len": cfg["qlen"],
            "kmer_len": cfg["k"],
            "locate_cap": LOCATE_CAP,
            "api": "count_locate_stream",
            "partial_config": "device probe pending",
        })

    # Secondary metric: device-compute-only sustained rate (results reduced
    # on device; isolates the chip from this environment's slow host relay —
    # on PCIe-local hardware the public API approaches this number).
    dev_qps = engine.device_sustained_qps(batches, cap=LOCATE_CAP, trials=TRIALS)
    log(f"[{cfg['name']}] device-compute-only: {dev_qps:,.0f} q/s sustained")

    hpq = total_hits / (num_batches * cfg["nq"])
    result = {"config": cfg["name"]}
    if hpq > 2:
        # Multi-hit configs (chr1rep: ~159 hits/query): the position volume,
        # not the query count, is the work — locations/sec is the headline
        # rate, promoted FIRST so q/s is not misread as a regression.
        result["primary_metric"] = "locations_per_sec"
        result["locations_per_sec"] = round(best_hps, 1)
    result.update({
        "queries_per_sec": round(best_qps, 1),
        "device_queries_per_sec": round(dev_qps, 1),
        "batch_ms": round(best_ms, 2),
        "num_queries": cfg["nq"],
        "query_len": cfg["qlen"],
        "kmer_len": cfg["k"],
        "locate_cap": LOCATE_CAP,
        "api": "count_locate_stream",
        "hits_per_query": round(hpq, 2),
        "locations_per_sec": round(best_hps, 1),
    })
    if stats["queries"]:
        q = stats["queries"]
        result["serving_shape"] = {
            "fast_path_batches": stats["fast_path_batches"],
            "batches": stats["batches"],
            "wide_lane_rate": round(stats["wide_lanes"] / q, 6),
            "redis_rate": round(stats["redis_lanes"] / q, 6),
            "multi_hit_rate": round(stats["multi_hit_queries"] / q, 6),
        }
        log(f"[{cfg['name']}] serving shape: {result['serving_shape']}")
    if build_s is not None:
        result["build_seconds"] = round(build_s, 1)
    if "note" in cfg:
        result["note"] = cfg["note"]
    return result


def main() -> None:
    import threading

    signal.signal(signal.SIGTERM, _emit_and_exit)
    signal.signal(signal.SIGINT, _emit_and_exit)

    only = set(sys.argv[1:])
    if only:
        # Single-config invocations (cache building / debugging) must not
        # clobber the full-matrix results file.
        global _RESULTS_PATH
        _RESULTS_PATH = _RESULTS_PATH.replace(".json", ".partial.json")

    # ALL bench work runs in a daemon thread; the MAIN thread stays in an
    # interruptible join loop.  Python signal handlers only run between main-
    # thread bytecodes — a driver SIGTERM landing while the main thread was
    # blocked inside a native call (a multi-GB device transfer, an SA-IS
    # build) was silently fatal: no handler, no stdout JSON, a 0.0 headline
    # (exactly round 2's "parsed": null).
    worker = threading.Thread(target=_run_all, args=(only,), daemon=True)
    worker.start()
    while worker.is_alive():
        worker.join(timeout=0.2)
    if _payload is not None:
        print(_compact_line(_payload), flush=True)


def _relay_probe() -> dict:
    """Measure this session's host<->device link (MB/s both directions, 6 MB
    payload ~ one serving batch's wire).  The e2e numbers are relay-bound in
    this environment (BASELINE.md roofline note) and the link speed varies
    2-50 MB/s between driver sessions; recording it with every run makes the
    e2e-vs-device gap attributable instead of anecdotal.

    Best of 3 full-size trials per direction: the process's FIRST transfer
    each way pays a multi-second tunnel setup, and a small (256 KB) warmup
    demonstrably did NOT establish the d2h path (the committed round-4
    matrix recorded a bogus 0.1 MB/s d2h — advisor finding).  Trial 1 is
    the warmup; best-of discards it unless it was genuinely fastest."""
    import jax

    x = np.zeros(6 * 1024 * 1024, dtype=np.uint8)
    h2d = d2h = 0.0
    for _ in range(3):
        t0 = time.perf_counter()
        d = jax.device_put(x)
        d.block_until_ready()
        h2d = max(h2d, 6 / (time.perf_counter() - t0))
        t0 = time.perf_counter()
        np.asarray(d)
        d2h = max(d2h, 6 / (time.perf_counter() - t0))
        d.delete()
    return {"relay_h2d_mb_s": round(h2d, 1), "relay_d2h_mb_s": round(d2h, 1)}


def _run_all(only) -> None:
    import jax

    try:
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:  # noqa: BLE001
        pass
    log(f"platform: {jax.default_backend()}, devices: {jax.devices()}")
    global _relay
    try:
        _relay = _relay_probe()
        log(f"relay: {_relay}")
    except Exception as e:  # noqa: BLE001
        log(f"relay probe failed: {e}")

    results = []
    _checkpoint(results)  # a valid (empty-headline) payload exists from t=0
    t_start = time.perf_counter()
    # The pan-genome config only STARTS if enough driver budget remains
    # (loading + uploading a 13 GB federation through the relay takes
    # minutes; a timeout mid-config wastes what a skip would have kept).
    pan_deadline = t_start + float(os.environ.get("AWRY_BENCH_PAN_DEADLINE_S", "2700"))
    # Heavy configs (multi-Gbp cold builds, ~25 min of SA-IS) only START a
    # cold build while this much driver budget is believed to remain; with a
    # valid cache they always run.  A skip carries the previous measured row.
    heavy_deadline = t_start + float(os.environ.get("AWRY_BENCH_HEAVY_DEADLINE_S", "1200"))
    for cfg in CONFIGS:
        if only and cfg["name"] not in only:
            continue
        def flush_partial(row, _results=results):
            _checkpoint(_results + [row])

        try:
            if (
                cfg.get("heavy")
                and not only
                and not cache_valid_quick(cfg)
                and time.perf_counter() > heavy_deadline
            ):
                results.append({
                    "config": cfg["name"],
                    "skipped": "no cached index and the heavy-build deadline passed "
                               "(cold 3.1 Gbp SA-IS build ~25 min; previous row carried)",
                })
            elif cfg["kind"] == "pangenome":
                results.append(run_pangenome(cfg, None if only else pan_deadline))
            else:
                results.append(run_config(cfg, checkpoint_cb=flush_partial))
        except Exception as e:  # noqa: BLE001
            log(f"[{cfg['name']}] FAILED: {type(e).__name__}: {e}")
            results.append({"config": cfg["name"], "error": f"{type(e).__name__}: {e}"})
        _checkpoint(results)

    _checkpoint(results, partial=False)


if __name__ == "__main__":
    main()
