"""Device-time phase profile of the chr1 verify path, robust to host load.

Dispatches each compiled phase N times back-to-back (async) and divides the
wall time of the whole pipeline by N: device execution serializes on the
device queue, so per-iteration device time is accurate even when the host
CPU is contended (unlike per-dispatch timing, which adds relay latency).

Run: python scripts/profile_phases.py [config_cache.npz] [batch]
"""

from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

N_ITERS = 20


def devtime(label, fn, *args, **kw):
    out = fn(*args, **kw)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(N_ITERS):
        out = fn(*args, **kw)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / N_ITERS * 1e3
    print(f"{label:58s} {dt:9.2f} ms", flush=True)
    return dt


def main():
    from awry_tpu.io.artifact import load_artifact
    from awry_tpu.ops.engine import FmQueryEngine

    cache = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.bench_cache/chr1_250Mbp_dna.npz"
    nq = int(sys.argv[2]) if len(sys.argv) > 2 else 131_072
    qlen = 30
    print(f"loading {cache} ...", flush=True)
    index = load_artifact(cache)
    engine = FmQueryEngine(index)
    dev = engine.device_index
    s = engine._verify_s
    print(f"s={s} mark_ratio={dev.mark_ratio} kmer_len={dev.kmer_len} "
          f"blocks={dev.blocks_sweep.shape if dev.blocks_sweep is not None else None}",
          flush=True)

    rng = np.random.default_rng(1)
    # Queries drawn from the index's own text are unnecessary for timing;
    # random queries exercise the same phase structure (verify candidates
    # simply fail the compare).  Use realistic symbol distribution.
    qsyms = rng.integers(1, 5, size=(nq, qlen)).astype(np.uint8)
    qsyms = np.where(qsyms >= 4, 5, qsyms)  # map to {1,2,3,5} = ACGT
    packed = (qsyms[:, 0::2] | (qsyms[:, 1::2] << 4)).astype(np.uint8)
    qw = jnp.asarray(packed)
    qlens = jnp.full((nq,), qlen, dtype=jnp.int32)
    jax.block_until_ready(qw)

    t_total = devtime("verify_fn fused", engine._verify_fn, dev, qw, qlens, s=s)

    from awry_tpu.ops.locate import lf_walk
    from awry_tpu.ops.search import search_ranges, unpack_nibbles
    from awry_tpu.ops.sweep import backstep_mark_sweep, occurrence_sweep
    from awry_tpu.ops.verify import compare_text_suffixes, wide_groups

    qsyms_u = jax.jit(unpack_nibbles)(qw)
    jax.block_until_ready(qsyms_u)

    sr = jax.jit(lambda d, a, b: search_ranges(d, a, b, num_steps=s))
    t_search = devtime(f"  search_ranges to s={s}", sr, dev, qsyms_u, qlens)

    # seed only (num_steps=13 -> just the kmer gather)
    sr_seed = jax.jit(lambda d, a, b: search_ranges(d, a, b, num_steps=dev.kmer_len))
    devtime("    seed only (kmer gather)", sr_seed, dev, qsyms_u, qlens)

    st, en = sr(dev, qsyms_u, qlens)
    rows_main = jnp.where((st <= en) & (qlens > s), st, jnp.uint32(0))
    G = wide_groups(nq)
    rows_all = jnp.concatenate([rows_main, jnp.zeros((G * 4,), jnp.uint32)])
    jax.block_until_ready(rows_all)
    t_walk = devtime(f"  lf_walk {rows_all.shape[0]//1024}k rows", jax.jit(lf_walk), dev, rows_all)

    p = jax.jit(lf_walk)(dev, rows_all)
    e_all = p + jnp.uint32(s - 1)
    q_all = jnp.concatenate([qsyms_u, jnp.zeros((G * 4, qlen), qsyms_u.dtype)])
    l_all = jnp.concatenate([qlens, jnp.zeros((G * 4,), qlens.dtype)])
    jax.block_until_ready((e_all, q_all, l_all))
    t_cmp = devtime("  compare_text_suffixes", jax.jit(compare_text_suffixes, static_argnames=("s",)),
                    dev, e_all, q_all, l_all, s=s)

    # sweep building blocks, async-amortized
    R = 2 * nq
    pos = jnp.asarray(rng.integers(0, index.bwt_len, size=R).astype(np.uint32))
    sym = jnp.asarray(rng.integers(1, 6, size=R).astype(np.int32))
    val = jnp.arange(R, dtype=jnp.int32)
    devtime(f"  occurrence_sweep {R//1024}k", jax.jit(lambda d, p_, s_: occurrence_sweep(d, p_, s_)[0]), dev, pos, sym)
    devtime(f"  backstep_mark_sweep {R//1024}k", jax.jit(lambda d, p_: backstep_mark_sweep(d, p_)[0]), dev, pos)
    devtime(f"  sort_key_val {R//1024}k", jax.jit(lambda p_, v_: jax.lax.sort_key_val(p_, v_)[1]), pos, val)
    devtime(f"  kmer gather {R//1024}k", jax.jit(lambda d, a: d.kmer_table[a]), dev,
            jnp.asarray(rng.integers(0, dev.kmer_table.shape[0], size=R).astype(np.int32)))
    devtime(f"  text word gather {R//1024}k x6", jax.jit(lambda d, a: d.text_packed[a[:, None] - jnp.arange(6, dtype=jnp.int32)[None, :]]),
            dev, jnp.asarray(rng.integers(64, dev.text_packed.shape[0] - 8, size=R).astype(np.int32)))

    print(f"\nphases sum: search {t_search:.1f} + walk {t_walk:.1f} + compare {t_cmp:.1f} "
          f"= {t_search + t_walk + t_cmp:.1f} vs fused {t_total:.1f} ms", flush=True)


if __name__ == "__main__":
    main()
