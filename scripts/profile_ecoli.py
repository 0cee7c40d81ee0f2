"""Phase breakdown of the headline (E. coli, VMEM-regime) bench workload.

Reproduces bench.py's config #1 exactly (same rng stream, 512k text-drawn
30 bp queries, cap=2) and times every phase of the verify serving path on
the real chip: the fused program, its search/walk/compare constituents,
and the host finish.  Guides the VMEM-regime device-throughput work
(device-compute probe: ~7.3M q/s = ~72 ms per 512k batch; the raw rank
cost model says this should be far lower).

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/profile_ecoli.py
"""

from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp


def _reduced(fn, kw):
    """Wrap fn so every output leaf is reduced to one scalar ON DEVICE -
    the relay link (~25 MB/s) would otherwise dominate the timing with the
    forced leaf's transfer.  kw are closed over (static), not traced."""

    @jax.jit
    def red(*args):
        leaves = jax.tree_util.tree_leaves(fn(*args, **kw))
        tot = jnp.float32(0)
        for l in leaves:
            tot = tot + jnp.sum(l.astype(jnp.float32))
        return tot

    return red


def timeit(label, fn, *args, iters=5, **kw):
    rfn = _reduced(fn, kw)
    jax.block_until_ready(rfn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = rfn(*args)
    s = float(jax.block_until_ready(out))
    dt = (time.perf_counter() - t0) / iters * 1e3
    print(f"{label:58s} {dt:9.2f} ms   (chk {s:.0f})", flush=True)
    return dt


def main():
    from awry_tpu.io.artifact import load_artifact
    from awry_tpu.ops.engine import FmQueryEngine

    print("loading cached ecoli index...", flush=True)
    index = load_artifact("/root/repo/.bench_cache/ecoli_4.6Mbp_dna.npz")
    engine = FmQueryEngine(index)
    dev = engine.device_index
    print(
        f"verify_enabled={engine._verify_enabled} s={getattr(engine, '_verify_s', None)} "
        f"mark_ratio={dev.mark_ratio} kmer_len={dev.kmer_len} "
        f"sweep={'yes' if dev.blocks_sweep is not None else 'no'}",
        flush=True,
    )

    rng = np.random.default_rng(0)
    n, nq, qlen = 4_600_000, 524_288, 30
    letters = np.frombuffer(b"ACGT", dtype=np.uint8)
    seq = bytes(rng.choice(letters, size=n))
    starts = rng.integers(0, n - qlen, size=nq)
    queries = [seq[s : s + qlen] for s in starts]

    t0 = time.perf_counter()
    qsyms, qlens = engine.encode_queries(queries)
    jax.block_until_ready(qsyms)
    print(f"encode+upload 512k x 30bp: {(time.perf_counter()-t0)*1e3:.1f} ms", flush=True)

    s = engine._verify_s
    timeit("verify_fn fused (device only)", engine._verify_fn, dev, qsyms, qlens, s=s)

    out = engine._verify_fn(dev, qsyms, qlens, s=s)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    engine._flat_verify_finish(nq, qsyms, qlens, 2, out)
    print(f"_flat_verify_finish (host, incl transfers): {(time.perf_counter()-t0)*1e3:.1f} ms", flush=True)

    # --- constituents (unpacked wire to mirror the fused program's start) ---
    from awry_tpu.ops.locate import lf_walk
    from awry_tpu.ops.search import search_ranges, unpack_crumbs, unpack_nibbles
    from awry_tpu.ops.verify import compare_text_suffixes

    if np.asarray(qsyms).dtype == np.int8:
        unpack = jax.jit(lambda q: unpack_crumbs(q, engine._crumb_inv))
    else:
        unpack = jax.jit(unpack_nibbles)
    qsyms_u = unpack(qsyms)
    jax.block_until_ready(qsyms_u)
    timeit("wire unpack alone", unpack, qsyms)

    sr = jax.jit(lambda d, a, b: search_ranges(d, a, b, num_steps=s))
    timeit(f"search_ranges to s={s} (seed k={dev.kmer_len} + {s-dev.kmer_len} steps)", sr, dev, qsyms_u, qlens)
    sr_full = jax.jit(lambda d, a, b: search_ranges(d, a, b))
    timeit("search_ranges FULL depth (classic count)", sr_full, dev, qsyms_u, qlens)

    st, en = sr(dev, qsyms_u, qlens)
    rows = jnp.where((st <= en) & (qlens > s), st, jnp.uint32(0))
    jax.block_until_ready(rows)
    walk = jax.jit(lf_walk)
    timeit("lf_walk (marked walk / direct gather)", walk, dev, rows)

    p = walk(dev, rows)
    e = p + jnp.uint32(s - 1)
    cmp_fn = jax.jit(lambda d, ee, qq, ll: compare_text_suffixes(d, ee, qq, ll, s))
    timeit("compare_text_suffixes", cmp_fn, dev, e, qsyms_u, qlens)

    # Raw primitive rates at this scale for context.
    from awry_tpu.ops.rank import update_range

    upd = jax.jit(lambda d, a, b, c: update_range(d, a, b, c))
    sym = jnp.full((nq,), 2, dtype=jnp.int32)
    timeit("ONE update_range (2 ranks) over 512k lanes", upd, dev, st, en, sym)

    # Seed gather alone: [B, 2] rows from the 4^k-entry table.
    addr = jnp.asarray(rng.integers(0, 4 ** dev.kmer_len, size=nq, dtype=np.int64).astype(np.int32))
    gat = jax.jit(lambda t, a: t[a])
    timeit("kmer seed gather [512k, 2]", gat, dev.kmer_table, addr)


if __name__ == "__main__":
    main()
