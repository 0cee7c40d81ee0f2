"""Stage-by-stage truncation profile of count_locate_verify_t (E. coli).

Times jitted prefixes of the fused verify program to locate overhead that
the constituent-op profile (profile_ecoli.py) can't explain.  All outputs
are reduced on device (relay isolation); stages are qt-native (the wire
unpack emits transposed [L, B] matrices).

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/profile_verify_stages.py
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
    from awry_tpu.ops.locate import lf_walk
    from awry_tpu.ops.search import (
        counts_from_ranges,
        search_ranges_t,
        unpack_crumbs_t,
    )
    from awry_tpu.ops.verify import (
        WIDE_CAP,
        compare_text_suffixes_t,
        count_locate_verify_t,
        wide_groups,
    )

    index = load_artifact("/root/repo/.bench_cache/ecoli_4.6Mbp_dna.npz")
    engine = FmQueryEngine(index)
    dev = engine.device_index
    s = engine._verify_s
    print(f"s={s} rows8={'yes' if dev.text_rows8 is not None else 'no'}", flush=True)

    rng = np.random.default_rng(0)
    n, nq, qlen = 4_600_000, 524_288, 30
    letters = np.frombuffer(b"ACGT", dtype=np.uint8)
    seq = bytes(rng.choice(letters, size=n))
    starts = rng.integers(0, n - qlen, size=nq)
    queries = [seq[ss : ss + qlen] for ss in starts]
    qsyms_w, qlens = engine.encode_queries(queries)
    qt = jax.jit(lambda q: unpack_crumbs_t(q, engine._crumb_inv))(qsyms_w)
    jax.block_until_ready(qt)

    def stage_search(qt, ql):
        return search_ranges_t(dev, qt, ql, num_steps=s, no_sentinel=True)

    def stage_seed_only(qt, ql):
        return search_ranges_t(dev, qt, ql, num_steps=dev.kmer_len, no_sentinel=True)

    def stage_wide_setup(qt, ql):
        starts, ends = stage_search(qt, ql)
        width = counts_from_ranges(starts, ends)
        long_enough = ql > s
        candidate = (width == 1) & long_enough
        wide = (width >= 2) & long_enough
        B = starts.shape[0]
        G = wide_groups(B)
        fitsable = wide & (width <= WIDE_CAP)
        csum = jnp.cumsum(fitsable.astype(jnp.int32))
        lane_of_group = jnp.searchsorted(
            csum, jnp.arange(1, G + 1, dtype=jnp.int32), side="left"
        ).astype(jnp.int32)
        return starts, ends, candidate, lane_of_group

    def stage_walk(qt, ql):
        starts, ends, candidate, lane_of_group = stage_wide_setup(qt, ql)
        B = starts.shape[0]
        G = wide_groups(B)
        width = counts_from_ranges(starts, ends)
        valid_g = lane_of_group < B
        lane_safe = jnp.where(valid_g, lane_of_group, 0)
        g_start = starts[lane_safe]
        g_width = jnp.where(valid_g, width[lane_safe], jnp.uint32(0))
        jslot = jnp.arange(WIDE_CAP, dtype=jnp.uint32)
        slot_valid = jslot[None, :] < g_width[:, None]
        slot_rows = jnp.where(slot_valid, g_start[:, None] + jslot[None, :], jnp.uint32(0))
        rows_main = jnp.where(candidate, starts, jnp.uint32(0))
        p_all = lf_walk(dev, jnp.concatenate([rows_main, slot_rows.reshape(-1)]))
        return p_all

    def stage_compare_only_main(qt, ql):
        starts, ends, candidate, _ = stage_wide_setup(qt, ql)
        rows_main = jnp.where(candidate, starts, jnp.uint32(0))
        p = lf_walk(dev, rows_main)
        e = p + jnp.uint32(s - 1)
        return compare_text_suffixes_t(dev, e, qt, ql, s)

    def stage_full(qt, ql):
        return count_locate_verify_t(dev, qt, ql, s, no_sentinel=True)[0]

    def full_from_wire(qw, ql):
        return count_locate_verify_t(
            dev, unpack_crumbs_t(qw, engine._crumb_inv), ql, s, no_sentinel=True
        )[0]

    timeit("0 seed only (k steps)", stage_seed_only, qt, qlens)
    timeit("A search_ranges_t(s)", stage_search, qt, qlens)
    timeit("B + wide setup (cumsum/searchsorted)", stage_wide_setup, qt, qlens)
    timeit("C + walk (main+slots)", stage_walk, qt, qlens)
    timeit("D search+setup+walk(main)+compare(main only)", stage_compare_only_main, qt, qlens)
    timeit("E full count_locate_verify_t", stage_full, qt, qlens)
    timeit("F full from crumb wire", full_from_wire, qsyms_w, qlens)


if __name__ == "__main__":
    main()
