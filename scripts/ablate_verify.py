"""Ablation harness for the fused verify program (E. coli, 512k batches).

Measures sustained device q/s (int() fetch closes the pipeline; the only
reliable timing primitive through the relay) for variants of
count_locate_verify_t with pieces disabled, to attribute device time.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/ablate_verify.py
"""

from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp


def sustained(label, fn, batches, trials=3):
    @jax.jit
    def red(qw, ql):
        leaves = jax.tree_util.tree_leaves(fn(qw, ql))
        tot = jnp.uint32(0)
        for l in leaves:
            tot = tot + jnp.sum(l.astype(jnp.uint32))
        return tot

    def one_pass():
        # Dispatch ALL batches first (async), then fetch: matches the
        # engine's device_sustained_qps pipelining; an inline int() per
        # batch serializes dispatches behind result RTTs.
        digests = [red(qw, ql) for qw, ql in batches]
        return sum(int(d) for d in digests)

    one_pass()
    total = sum(qw.shape[0] for qw, _ in batches)
    best = 0.0
    for _ in range(trials):
        t0 = time.perf_counter()
        one_pass()
        best = max(best, total / (time.perf_counter() - t0))
    ms = len(batches[0][0]) and (total / best / len(batches)) * 1e3
    print(f"{label:58s} {best/1e6:7.2f} Mq/s  ({ms:6.1f} ms/batch)", flush=True)
    return best


def main():
    from awry_tpu.io.artifact import load_artifact
    from awry_tpu.ops.engine import FmQueryEngine
    from awry_tpu.ops.locate import lf_walk
    from awry_tpu.ops.search import (
        counts_from_ranges,
        search_ranges_t,
        unpack_crumbs_t,
    )
    from awry_tpu.ops.verify import (
        compare_text_suffixes_t,
        count_locate_verify_t,
    )

    index = load_artifact("/root/repo/.bench_cache/ecoli_4.6Mbp_dna.npz")
    engine = FmQueryEngine(index)
    dev = engine.device_index
    s = engine._verify_s
    crumb_inv = engine._crumb_inv

    rng = np.random.default_rng(0)
    n, nq, qlen = 4_600_000, 524_288, 30
    letters = np.frombuffer(b"ACGT", dtype=np.uint8)
    seq = bytes(rng.choice(letters, size=n))
    batches = []
    for _ in range(4):
        starts = rng.integers(0, n - qlen, size=nq)
        queries = [seq[ss : ss + qlen] for ss in starts]
        qsyms_w, qlens = engine.encode_queries(queries)
        batches.append((qsyms_w, qlens))
    jax.block_until_ready(batches[-1][0])

    def unp(qw):
        return unpack_crumbs_t(qw, crumb_inv)

    # Full fused program (what serving dispatches).
    sustained("full count_locate_verify_t", lambda qw, ql: count_locate_verify_t(
        dev, unp(qw), ql, s, no_sentinel=True)[0], batches)

    # Search to s only.
    sustained("search to s only", lambda qw, ql: search_ranges_t(
        dev, unp(qw), ql, num_steps=s, no_sentinel=True), batches)

    # Search + walk of main candidates (no wide machinery, no compare).
    def search_walk(qw, ql):
        qt = unp(qw)
        st, en = search_ranges_t(dev, qt, ql, num_steps=s, no_sentinel=True)
        width = counts_from_ranges(st, en)
        cand = (width == 1) & (ql > s)
        return lf_walk(dev, jnp.where(cand, st, jnp.uint32(0)))

    sustained("search + walk(main)", search_walk, batches)

    # Search + walk + compare of main lanes only.
    def swc(qw, ql):
        qt = unp(qw)
        st, en = search_ranges_t(dev, qt, ql, num_steps=s, no_sentinel=True)
        width = counts_from_ranges(st, en)
        cand = (width == 1) & (ql > s)
        p = lf_walk(dev, jnp.where(cand, st, jnp.uint32(0)))
        e = p + jnp.uint32(s - 1)
        ok = compare_text_suffixes_t(dev, e, qt, ql, s)
        return cand & ok

    sustained("search + walk + compare (main only)", swc, batches)

    # Search at s-1 / s+1 for the per-step marginal at this batch shape.
    sustained(f"search to s-1={s-1}", lambda qw, ql: search_ranges_t(
        dev, unp(qw), ql, num_steps=s - 1, no_sentinel=True), batches)
    sustained("seed only (k)", lambda qw, ql: search_ranges_t(
        dev, unp(qw), ql, num_steps=dev.kmer_len, no_sentinel=True), batches)


if __name__ == "__main__":
    main()
