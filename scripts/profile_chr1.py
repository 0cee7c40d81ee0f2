"""Per-phase profile of the chr1-scale serving path on the real chip.

Loads the cached bench index and times: sort/kernel/unsort of one sweep
step, one full update step, the count phase, the walk, and the fused
count+locate at different caps.  Guides the sweep-engine tuning.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/profile_chr1.py
"""

from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp


def _force(out):
    """block_until_ready can return early through the axon relay; reading a
    scalar is the only trustworthy completion barrier."""
    leaves = jax.tree_util.tree_leaves(out)
    return float(np.asarray(leaves[0]).ravel()[0])


def timeit(label, fn, *args, iters=5):
    _force(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    s = _force(out)
    dt = (time.perf_counter() - t0) / iters * 1e3
    print(f"{label:55s} {dt:9.2f} ms   (chk {s:.0f})", flush=True)
    return dt


def main():
    from awry_tpu.io.artifact import load_artifact
    from awry_tpu.ops import to_device
    from awry_tpu.ops.engine import FmQueryEngine, encode_query_batch
    from awry_tpu.ops.sweep import backstep_mark_sweep, occurrence_sweep

    print("loading cached chr1 index...", flush=True)
    index = load_artifact("/root/repo/.bench_cache/chr1_250Mbp_dna.npz")
    dev = to_device(index, build_sweep=True)
    print("device index ready; blocks_sweep:", None if dev.blocks_sweep is None else dev.blocks_sweep.shape, flush=True)

    rng = np.random.default_rng(0)
    B = 131072
    R = 2 * B

    pos = jnp.asarray(rng.integers(0, index.bwt_len, size=R).astype(np.uint32))
    sym = jnp.asarray(rng.integers(1, 6, size=R).astype(np.int32))

    # sweep pieces
    timeit("occurrence_sweep 262k (sort+kernel+unsort)", jax.jit(lambda d, p, s: occurrence_sweep(d, p, s)[0]), dev, pos, sym)
    timeit("sort_key_val 262k", jax.jit(lambda p: jax.lax.sort_key_val(p, jnp.arange(R, dtype=jnp.int32))[0]), pos)
    from awry_tpu.ops.rank import occurrence as plain_occ

    timeit("plain gather occurrence 262k", jax.jit(plain_occ), dev, pos, sym)

    rows = jnp.asarray(rng.integers(0, index.bwt_len, size=B).astype(np.uint32))
    timeit("backstep_mark_sweep 131k", jax.jit(lambda d, r: backstep_mark_sweep(d, r)[0]), dev, rows)

    # full lf_walk via sweep (8 visits)
    from awry_tpu.ops.locate import lf_walk

    timeit("lf_walk sweep 131k rows", jax.jit(lf_walk), dev, rows)
    timeit("lf_walk sweep 1M rows (cap=8 shape)",
           jax.jit(lf_walk), dev,
           jnp.asarray(rng.integers(0, index.bwt_len, size=8 * B).astype(np.uint32)))

    # count phase (search_ranges) with sweep
    seq_q = None
    engine = FmQueryEngine(dev)
    queries = []
    # synthesize queries from the index by locating nothing - just random ACGT
    letters = np.frombuffer(b"ACGT", dtype=np.uint8)
    queries = [bytes(rng.choice(letters, size=30)) for _ in range(B)]
    qsyms, qlens = engine.encode_queries(queries)

    timeit("count (search_ranges sweep) 131k x 30bp", lambda a, b: engine._count_fn(dev, a, b), qsyms, qlens)
    for cap in (1, 2, 8):
        timeit(f"fused count+locate cap={cap}",
               lambda a, b, c=cap: engine._count_locate_fn(dev, a, b, cap=c), qsyms, qlens)

    # plain engine for comparison
    dev_plain = to_device(index)
    eng_plain = FmQueryEngine(dev_plain)
    timeit("count PLAIN gather 131k x 30bp", lambda a, b: eng_plain._count_fn(dev_plain, a, b), qsyms, qlens)
    timeit("fused PLAIN count+locate cap=2",
           lambda a, b: eng_plain._count_locate_fn(dev_plain, a, b, cap=2), qsyms, qlens)


if __name__ == "__main__":
    main()
