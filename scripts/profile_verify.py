"""Phase breakdown of the chr1 bench workload (seed-walk-verify path).

Reproduces bench.py's chr1 config exactly (same rng(0) text, text-drawn
30 bp queries, cap=2) and times every phase of the serving path on the
real chip: full stream, fused verify kernel, search-to-s, walk, text
compare, and the sweep building blocks (sort / kernel / unsort / scatter
alternative).  Guides the round-2 throughput work.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/profile_verify.py
"""

from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp


def _force(out):
    leaves = jax.tree_util.tree_leaves(out)
    return float(np.asarray(leaves[0]).ravel()[0])


def timeit(label, fn, *args, iters=3, **kw):
    _force(fn(*args, **kw))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args, **kw)
    s = _force(out)
    dt = (time.perf_counter() - t0) / iters * 1e3
    print(f"{label:58s} {dt:9.2f} ms   (chk {s:.0f})", flush=True)
    return dt


def main():
    from awry_tpu.io.artifact import load_artifact
    from awry_tpu.ops.engine import FmQueryEngine

    print("loading cached chr1 index...", flush=True)
    index = load_artifact("/root/repo/.bench_cache/chr1_250Mbp_dna.npz")
    engine = FmQueryEngine(index)
    dev = engine.device_index
    print(f"verify_enabled={engine._verify_enabled} s={getattr(engine, '_verify_s', None)} "
          f"mark_ratio={dev.mark_ratio} kmer_len={dev.kmer_len}", flush=True)

    # Reproduce bench text + queries: rng(0), chr1-only run.
    rng = np.random.default_rng(0)
    n, nq, qlen = 250_000_000, 131_072, 30
    letters = np.frombuffer(b"ACGT", dtype=np.uint8)
    print("synthesizing text...", flush=True)
    seq = bytes(rng.choice(letters, size=n))
    starts = rng.integers(0, n - qlen, size=nq)
    queries = [seq[s : s + qlen] for s in starts]

    t0 = time.perf_counter()
    qsyms, qlens = engine.encode_queries(queries)
    jax.block_until_ready(qsyms)
    print(f"encode+upload 131k x 30bp: {(time.perf_counter()-t0)*1e3:.1f} ms", flush=True)

    # --- end-to-end stream (the bench number) ---
    batches = [(qsyms, qlens, nq)] * 4
    for trial in range(2):
        t0 = time.perf_counter()
        for _ in engine.count_locate_stream(batches, cap=2):
            pass
        dt = time.perf_counter() - t0
        print(f"stream 4x131k trial {trial}: {nq*4/dt:,.0f} q/s  ({dt/4*1e3:.1f} ms/batch)", flush=True)

    # --- fused verify kernel only (device) ---
    s = engine._verify_s
    timeit("verify_fn fused (device only)", engine._verify_fn, dev, qsyms, qlens, s=s)

    # host finish (assembly) on top of a ready result
    out = engine._verify_fn(dev, qsyms, qlens, s=s)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    counts, flat_pos, offsets = engine._flat_verify_finish(nq, qsyms, qlens, 2, out)
    print(f"_flat_verify_finish (host, incl transfers): {(time.perf_counter()-t0)*1e3:.1f} ms",
          flush=True)

    # finish-phase breakdown (packed-bundle verify output)
    from awry_tpu.ops.verify import unpack_verify_bundle, wide_groups

    out = engine._verify_fn(dev, qsyms, qlens, s=s)
    jax.block_until_ready(out)
    B = out[1].shape[0]
    t0 = time.perf_counter()
    bundle = np.asarray(out[0])
    print(f"  finish: bundle transfer ({bundle.nbytes/1e3:.0f} KB): "
          f"{(time.perf_counter()-t0)*1e3:.1f} ms", flush=True)
    _p, c_h, r_h, lg_h, _ps, _os = unpack_verify_bundle(bundle, B, wide_groups(B))
    r_h = r_h[:nq]
    print(f"  redis={int(r_h.sum())}, wide_settled={int((lg_h < nq).sum())}", flush=True)
    idxs = np.nonzero(r_h)[0]
    if len(idxs):
        b = 1 << int(np.ceil(np.log2(max(16, len(idxs)))))
        pad_idx = np.zeros(b, dtype=np.int32)
        pad_idx[: len(idxs)] = idxs
        sel = jnp.asarray(pad_idx)
        t0 = time.perf_counter()
        sub_out = engine._count_locate_fn(dev, jnp.asarray(qsyms)[sel],
                                          jnp.asarray(qlens)[sel], cap=2)
        jax.block_until_ready(sub_out)
        print(f"  finish: sub-batch classic dispatch (b={b}): "
              f"{(time.perf_counter()-t0)*1e3:.1f} ms", flush=True)
    t0 = time.perf_counter()
    engine._localize(flat_pos)
    print(f"_localize (host): {(time.perf_counter()-t0)*1e3:.1f} ms", flush=True)

    # --- phases inside verify ---
    from awry_tpu.ops.search import search_ranges, unpack_nibbles
    from awry_tpu.ops.locate import lf_walk
    from awry_tpu.ops.verify import compare_text_suffixes

    qsyms_u = jax.jit(unpack_nibbles)(qsyms)
    jax.block_until_ready(qsyms_u)

    sr = jax.jit(lambda d, a, b: search_ranges(d, a, b, num_steps=s))
    timeit(f"search_ranges to s={s} (seed + {s-13} sweep steps)", sr, dev, qsyms_u, qlens)
    sr_full = jax.jit(lambda d, a, b: search_ranges(d, a, b))
    timeit("search_ranges FULL depth (classic count)", sr_full, dev, qsyms_u, qlens)

    st, en = sr(dev, qsyms_u, qlens)
    rows = jnp.where((st <= en) & (qlens > s), st, jnp.uint32(0))
    jax.block_until_ready(rows)
    timeit("lf_walk 131k candidates", jax.jit(lf_walk), dev, rows)

    p = jax.jit(lf_walk)(dev, rows)
    e = p + jnp.uint32(s - 1)
    timeit("compare_text_suffixes", jax.jit(compare_text_suffixes, static_argnames=("s",)),
           dev, e, qsyms_u, qlens, s=s)

    # --- sweep building blocks at both sizes ---
    from awry_tpu.ops.sweep import occurrence_sweep

    for R in (131_072, 262_144):
        pos = jnp.asarray(rng.integers(0, index.bwt_len, size=R).astype(np.uint32))
        sym = jnp.asarray(rng.integers(1, 6, size=R).astype(np.int32))
        val = jnp.arange(R, dtype=jnp.int32)
        timeit(f"occurrence_sweep {R//1024}k (sort+kernel+2 unsorts)",
               jax.jit(lambda d, p_, s_: occurrence_sweep(d, p_, s_)[0]), dev, pos, sym)
        timeit(f"sort_key_val {R//1024}k",
               jax.jit(lambda p_, v_: jax.lax.sort_key_val(p_, v_)[1]), pos, val)
        perm = jax.lax.sort_key_val(pos, val)[1]
        timeit(f"scatter-unsort {R//1024}k (out[perm]=x)",
               jax.jit(lambda pm, x: jnp.zeros_like(x).at[pm].set(x)), perm, pos)
        timeit(f"gather-by-perm {R//1024}k (x[perm])",
               jax.jit(lambda pm, x: x[pm]), perm, pos)
        timeit(f"4-operand sort {R//1024}k",
               jax.jit(lambda p_, a, b, c: jax.lax.sort((p_, a, b, c), num_keys=1)[1]),
               pos, val, val, val)


if __name__ == "__main__":
    main()
