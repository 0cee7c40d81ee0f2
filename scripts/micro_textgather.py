"""Micro-bench: text-window gather variants for compare_text_suffixes.

The profiled vmap(dynamic_slice) costs 160 ms / 131k lanes on chr1 —
40x below the measured element-gather rate.  Compare against flat
advanced-index gathers to pick the production form.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/micro_textgather.py
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp


def timeit(label, fn, *args, iters=5):
    out = fn(*args)
    jax.block_until_ready(out)
    float(np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    s = float(np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0])
    dt = (time.perf_counter() - t0) / iters * 1e3
    print(f"{label:52s} {dt:9.2f} ms  (chk {s:.0f})", flush=True)
    return dt


def main():
    rng = np.random.default_rng(0)
    NW = 31_250_000 + 64  # chr1-scale packed text (u32 words) + pad
    B, K = 131_072, 5
    text = jnp.asarray(rng.integers(0, 2**32, size=NW, dtype=np.uint32))
    start = jnp.asarray(rng.integers(0, NW - K, size=B).astype(np.int32))
    jax.block_until_ready((text, start))
    print(f"table {text.nbytes/1e6:.0f} MB, B={B}, K={K}", flush=True)

    timeit("vmap(dynamic_slice) [current]",
           jax.jit(lambda t, st: jax.vmap(
               lambda s_: jax.lax.dynamic_slice(t, (s_,), (K,)))(st)),
           text, start)

    timeit("flat [B,K] advanced-index gather",
           jax.jit(lambda t, st: t[st[:, None] + jnp.arange(K, dtype=jnp.int32)[None, :]]),
           text, start)

    timeit("K separate [B] gathers",
           jax.jit(lambda t, st: jnp.stack([t[st + j] for j in range(K)], axis=1)),
           text, start)

    timeit("jnp.take flat",
           jax.jit(lambda t, st: jnp.take(
               t, st[:, None] + jnp.arange(K, dtype=jnp.int32)[None, :], axis=0)),
           text, start)

    # lane-major variant: indices shaped [K, B] (batch in lane dim)
    timeit("K-major [K,B] gather",
           jax.jit(lambda t, st: t[st[None, :] + jnp.arange(K, dtype=jnp.int32)[:, None]]),
           text, start)

    # sorted: sort starts, gather, unsort
    def sorted_gather(t, st):
        order = jnp.argsort(st)
        g = t[st[order][:, None] + jnp.arange(K, dtype=jnp.int32)[None, :]]
        inv = jnp.zeros_like(order).at[order].set(jnp.arange(B, dtype=order.dtype))
        return g[inv]
    timeit("sorted+gather+unsort", jax.jit(sorted_gather), text, start)


if __name__ == "__main__":
    main()
