"""Round-3 serving A/B on the real chip: paired-sweep classic vs slot mode.

For each scale: build/load index variants, measure device-sustained fused
count+locate q/s through the SAME serving programs bench.py uses, print a
table.  Run while the tunnel is free (single-client).

Usage: python scripts/ab_round3.py [chr20|chr1|all]
"""

import gc
import sys
import time
import zlib

import numpy as np

sys.path.insert(0, ".")

from awry_tpu import FmBuildArgs, build_from_records
from awry_tpu.io.artifact import load_artifact, save_artifact
import awry_tpu.host_engine as he
from awry_tpu.ops import FmQueryEngine


def log(*a):
    print(*a, flush=True)


def text_for(name, n):
    rng = np.random.default_rng([0, zlib.crc32(name.encode())])
    return bytes(rng.choice(np.frombuffer(b"ACGT", dtype=np.uint8), size=n)), rng


def get_index(name, n, k, cache_tag):
    import os
    path = f".bench_cache/ab_{cache_tag}.npz"
    text, rng = text_for(name, n)
    if os.path.exists(path):
        idx = load_artifact(path)
        if idx.kmer_len == k:
            log(f"[{cache_tag}] cached")
            return idx, text, rng
    t0 = time.time()
    idx = build_from_records([("s", text)], FmBuildArgs(
        lookup_table_kmer_len=k, locate_mark_ratio=1,
        build_kmer_table_on_device=k >= 12,
        suffix_array_output_src=f".bench_cache/ab_{name}.sa.npy",
        remove_intermediate_suffix_array_file=False,
    ))
    log(f"[{cache_tag}] built {time.time()-t0:.0f}s")
    save_artifact(idx, path, compress=False)
    return idx, text, rng


def run(name, n, variants, nq=524_288, qlen=30):
    results = []
    for tag, k, force_slots in variants:
        import awry_tpu.ops.device_index as di
        di.SLOT_WIDTH_MAX = 1.6 if force_slots else 0.0
        index, text, rng = get_index(name, n, k, f"{name}_k{k}")
        t0 = time.time()
        eng = FmQueryEngine(index, use_sweep=True)
        log(f"[{tag}] engine {time.time()-t0:.0f}s slots={eng._verify_slots} s={eng._verify_s}")
        starts = rng.integers(0, n - qlen, size=nq)
        queries = [text[s : s + qlen] for s in starts]
        batches = [eng.encode_queries(queries) + (nq,)]
        counts, si, lo, of = eng.count_locate_arrays(queries[:2048], cap=2)
        for i in rng.integers(0, 2048, size=25):
            assert int(counts[i]) == he.count(index, queries[i]), i
            assert sorted(lo[of[i]:of[i+1]].tolist()) == sorted(
                p for _, p in he.locate(index, queries[i])), i
        qps = eng.device_sustained_qps(batches, cap=2, trials=3)
        log(f"[{tag}] device qps: {qps:,.0f}")
        results.append((tag, qps))
        eng.release()
        del eng, index
        gc.collect()
        import jax
        jax.clear_caches()
    log(f"=== {name} ===")
    for tag, qps in results:
        log(f"  {tag:28s} {qps:>12,.0f} q/s")


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which in ("chr20", "all"):
        run("ab20", 64_000_000, [
            ("classic-paired k13", 13, False),
            ("slots k13", 13, True),
            ("slots k14", 14, True),
        ])
    if which in ("chr1", "all"):
        run("ab1", 250_000_000, [
            ("classic-paired k13", 13, False),
            ("slots k14", 14, True),
        ])


if __name__ == "__main__":
    main()
