"""A/B on the real chip: chr1-scale k=14 seed + CLASSIC verify path.

Round 3 compared k=13 classic vs k=14 SLOT (the latter mismeasured, then
honestly lost).  Untested combination: k=14 seed feeding the classic
switch-step path (s=16) — one fewer paired rank sweep after the seed than
k=13 (seed covers 14 of the 16 pre-verify symbols), same wide/verify
machinery.  Expected ~+15-20%% device q/s for +1.6 GB k-mer upload.

Usage: python scripts/ab_k14_classic.py
"""

import gc
import os
import sys
import time
import zlib

import numpy as np

sys.path.insert(0, ".")

import awry_tpu.host_engine as he
from awry_tpu import FmBuildArgs, build_from_records
from awry_tpu.io.artifact import load_artifact, save_artifact
from awry_tpu.ops import FmQueryEngine

N, NQ, QLEN = 250_000_000, 524_288, 30


def log(*a):
    print(*a, flush=True)


def text_and_rng():
    rng = np.random.default_rng([0, zlib.crc32(b"chr1_250Mbp_dna")])
    return bytes(rng.choice(np.frombuffer(b"ACGT", dtype=np.uint8), size=N)), rng


def get_index(k):
    path = f".bench_cache/ab1_k{k}.npz"
    text, rng = text_and_rng()
    if os.path.exists(path):
        idx = load_artifact(path)
        if idx.kmer_len == k:
            log(f"[k{k}] cached")
            return idx, text, rng
    if k == 13:
        idx = load_artifact(".bench_cache/chr1_250Mbp_dna.npz")
        assert idx.kmer_len == 13
        return idx, text, rng
    t0 = time.time()
    idx = build_from_records([("s", text)], FmBuildArgs(
        lookup_table_kmer_len=k, locate_mark_ratio=1,
        suffix_array_output_src=".bench_cache/ab1.sa.npy",
    ))
    log(f"[k{k}] built {time.time()-t0:.0f}s")
    save_artifact(idx, path, compress=False)
    return idx, text, rng


def run(k, force_classic):
    import awry_tpu.ops.device_index as di

    old = di.SLOT_WIDTH_MAX
    di.SLOT_WIDTH_MAX = 0.0 if force_classic else old
    try:
        idx, text, rng = get_index(k)
        t0 = time.time()
        eng = FmQueryEngine(idx, use_sweep=True)
        log(f"[k{k} classic={force_classic}] engine {time.time()-t0:.0f}s "
            f"slots={eng._verify_slots} s={getattr(eng, '_verify_s', None)}")
        starts = rng.integers(0, N - QLEN, size=NQ)
        queries = [text[s : s + QLEN] for s in starts]
        batches = [eng.encode_queries(queries) + (NQ,)]
        counts, si, lo, of = eng.count_locate_arrays(queries[:2048], cap=2)
        for i in rng.integers(0, 2048, size=20):
            assert int(counts[i]) == he.count(idx, queries[i]), i
            assert sorted(lo[of[i]:of[i+1]].tolist()) == sorted(
                p for _, p in he.locate(idx, queries[i])), i
        qps = eng.device_sustained_qps(batches, cap=2, trials=3)
        log(f"[k{k} classic={force_classic}] device qps: {qps:,.0f} "
            f"(redis_rate {eng.stats['redis_lanes']/max(1,eng.stats['queries']):.4f})")
        eng.release()
        del eng, idx
        gc.collect()
        import jax

        jax.clear_caches()
        return qps
    finally:
        di.SLOT_WIDTH_MAX = old


def main():
    ks = [int(a) for a in sys.argv[1:]] or [14, 13]
    rs = {k: run(k, True) for k in ks}
    base = rs[ks[-1]]
    for k in ks:
        log(f"=== k{k} classic {rs[k]:,.0f} ({rs[k]/base:.2f}x vs k{ks[-1]}) ===")


if __name__ == "__main__":
    main()
