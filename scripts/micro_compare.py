"""Isolate compare_text_suffixes_t cost on the real E. coli index.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/micro_compare.py
"""

from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp


def timeit(label, fn, *args, iters=5):
    @jax.jit
    def red(*a):
        leaves = jax.tree_util.tree_leaves(fn(*a))
        tot = jnp.float32(0)
        for l in leaves:
            tot = tot + jnp.sum(l.astype(jnp.float32))
        return tot

    jax.block_until_ready(red(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = red(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters * 1e3
    print(f"{label:58s} {dt:9.2f} ms", flush=True)
    return dt


def main():
    from awry_tpu.io.artifact import load_artifact
    from awry_tpu.ops.engine import FmQueryEngine
    from awry_tpu.ops.verify import TEXT_PAD_WORDS, compare_text_suffixes_t

    index = load_artifact("/root/repo/.bench_cache/ecoli_4.6Mbp_dna.npz")
    engine = FmQueryEngine(index)
    dev = engine.device_index
    s = engine._verify_s
    B, L = 524_288, 32
    rng = np.random.default_rng(1)
    e = jnp.asarray(rng.integers(100, 4_500_000, size=B, dtype=np.int64).astype(np.uint32))
    qt = jnp.asarray(rng.integers(1, 6, size=(L, B), dtype=np.int64).astype(np.int32))
    qlens = jnp.asarray(np.full(B, 30, dtype=np.int32))

    bits, spw, lg = 4, 8, 3
    jlo = s // spw
    jhi = (L - 1) // spw + 1

    def g_only(e):
        wb = (e >> lg) + jnp.uint32(TEXT_PAD_WORDS)
        a = wb - jnp.uint32(jhi)
        return dev.text_rows8[(a >> 2).astype(jnp.int32)].T

    def g_selects(e):
        wb = (e >> lg) + jnp.uint32(TEXT_PAD_WORDS)
        a = wb - jnp.uint32(jhi)
        rows_t = dev.text_rows8[(a >> 2).astype(jnp.int32)].T
        o = (a & jnp.uint32(3)).astype(jnp.int32)
        outs = []
        for j in range(jlo, jhi + 1):
            idx = o + (jhi - j)
            out = rows_t[0]
            for t in range(1, 8):
                out = jnp.where(idx == t, rows_t[t], out)
            outs.append(out)
        return outs

    def full(e, qt, ql):
        return compare_text_suffixes_t(dev, e, qt, ql, s)

    timeit("gather text_rows8 [512k, 8].T", g_only, e)
    timeit("gather + 5x 8-way selects", g_selects, e)
    timeit("full compare_text_suffixes_t", full, e, qt, qlens)

    # int8 qt variant: does the qt dtype matter?
    qt8 = qt.astype(jnp.int8)
    timeit("full compare (qt int8)", full, e, qt8, qlens)


if __name__ == "__main__":
    main()


def composition():
    """Bisect the search+walk+compare composition jump (stage D anomaly)."""
    from awry_tpu.io.artifact import load_artifact
    from awry_tpu.ops.engine import FmQueryEngine
    from awry_tpu.ops.locate import lf_walk
    from awry_tpu.ops.search import counts_from_ranges, search_ranges_t, unpack_crumbs_t
    from awry_tpu.ops.verify import TEXT_PAD_WORDS, compare_text_suffixes_t

    index = load_artifact("/root/repo/.bench_cache/ecoli_4.6Mbp_dna.npz")
    engine = FmQueryEngine(index)
    dev = engine.device_index
    s = engine._verify_s
    rng = np.random.default_rng(0)
    n, nq, qlen = 4_600_000, 524_288, 30
    letters = np.frombuffer(b"ACGT", dtype=np.uint8)
    seq = bytes(rng.choice(letters, size=n))
    starts = rng.integers(0, n - qlen, size=nq)
    queries = [seq[ss : ss + qlen] for ss in starts]
    qsyms_w, qlens = engine.encode_queries(queries)
    qt = jax.jit(lambda q: unpack_crumbs_t(q, engine._crumb_inv))(qsyms_w)
    jax.block_until_ready(qt)

    L = qt.shape[0]
    bits, spw, lg = 4, 8, 3
    jlo, jhi = s // spw, (L - 1) // spw + 1

    def base(qt, ql):
        st, en = search_ranges_t(dev, qt, ql, num_steps=s, no_sentinel=True)
        width = counts_from_ranges(st, en)
        candidate = (width == 1) & (ql > s)
        rows_main = jnp.where(candidate, st, jnp.uint32(0))
        p = lf_walk(dev, rows_main)
        e = p + jnp.uint32(s - 1)
        return e, candidate

    def d0(qt, ql):
        e, _ = base(qt, ql)
        return e

    def d1(qt, ql):
        e, _ = base(qt, ql)
        wb = (e >> lg) + jnp.uint32(TEXT_PAD_WORDS)
        a = wb - jnp.uint32(jhi)
        return dev.text_rows8[(a >> 2).astype(jnp.int32)].T

    def d2(qt, ql):
        e, _ = base(qt, ql)
        wb = (e >> lg) + jnp.uint32(TEXT_PAD_WORDS)
        a = wb - jnp.uint32(jhi)
        rows_t = dev.text_rows8[(a >> 2).astype(jnp.int32)].T
        o = (a & jnp.uint32(3)).astype(jnp.int32)
        outs = []
        for j in range(jlo, jhi + 1):
            idx = o + (jhi - j)
            out = rows_t[0]
            for t in range(1, 8):
                out = jnp.where(idx == t, rows_t[t], out)
            outs.append(out)
        return outs

    def d3(qt, ql):
        e, _ = base(qt, ql)
        return compare_text_suffixes_t(dev, e, qt, ql, s)

    timeit("D0 search+walk -> e", d0, qt, qlens)
    timeit("D1 + rows8 gather", d1, qt, qlens)
    timeit("D2 + selects", d2, qt, qlens)
    timeit("D3 + full compare", d3, qt, qlens)


composition()
