"""On-chip microbenchmarks for the HBM random-row-access regime.

The round-1 finding (BASELINE.md): backward search over a multi-GB index is
bound by random 128 B row fetches - XLA gather ~12.4M rows/s, DMA-pipelined
Pallas ~15.2M rows/s, both latency/issue-bound at <2% of HBM bandwidth.

This script measures the candidate escape hatches on the real chip:
  1. baseline XLA gather (unsorted / sorted indices)
  2. dma_gather_rows (round-1 Pallas kernel)
  3. sort_key_val cost at serving batch sizes (pre-pass for any sweep plan)
  4. in-kernel VMEM gather (jnp.take inside a Pallas kernel) - the primitive
     the tile-sweep design needs
  5. tile-sweep prototype: stream blocks HBM->VMEM in big tiles (sequential,
     bandwidth-bound), gather each tile's (sorted) requests from VMEM

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/micro_gather.py
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

W = 32  # uint32 words per row (nucleotide fused row = 128 B)


def bench(label, fn, *args, iters=20, unit_count=None, unit="rows"):
    """Time a jitted fn with a device-side repeat loop (one dispatch)."""
    f = jax.jit(fn)
    out = jax.block_until_ready(f(*args))
    t0 = time.perf_counter()
    out = f(*args)
    s = float(np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0])
    t1 = time.perf_counter()
    dt = (t1 - t0) / iters
    rate = (unit_count / dt) if unit_count else 0.0
    print(f"{label:55s} {dt*1e3:9.3f} ms/iter   {rate/1e6:10.2f} M{unit}/s   (chk {s:.0f})")
    return dt


def repeat_loop(body, iters):
    """body(idx_shift:uint32 scalar) -> uint32 checksum; runs `iters` times
    with a data dependency so XLA cannot CSE the iterations."""

    def run(*args):
        def step(_, acc):
            return body(acc, *args)

        return jax.lax.fori_loop(0, iters, step, jnp.uint32(1))

    return run


def main():
    print("devices:", jax.devices())
    rng = np.random.default_rng(0)
    ITERS = 20

    for nb in (1_000_000, 4_000_000):  # 128 MB (chr1-ish) and 512 MB tables
        print(f"\n=== table: {nb} rows x {W} u32 = {nb*W*4/1e6:.0f} MB ===")
        blocks = jnp.asarray(rng.integers(0, 2**32, size=(nb, W), dtype=np.uint64).astype(np.uint32))
        for B in (262_144,):
            idx_np = rng.integers(0, nb, size=B).astype(np.int32)
            idx = jnp.asarray(idx_np)
            idx_sorted = jnp.asarray(np.sort(idx_np))

            def xla_gather(acc, idxa):
                eff = (idxa + (acc & jnp.uint32(1)).astype(jnp.int32)) % nb
                return blocks[eff].sum(dtype=jnp.uint32).astype(jnp.uint32) & jnp.uint32(0xFFFF)

            bench(f"XLA gather unsorted B={B}", repeat_loop(xla_gather, ITERS), idx,
                  iters=ITERS, unit_count=B)
            bench(f"XLA gather sorted   B={B}", repeat_loop(xla_gather, ITERS), idx_sorted,
                  iters=ITERS, unit_count=B)

            # sort cost (key=block id, val=lane id) at serving batch size
            vals = jnp.arange(B, dtype=jnp.int32)

            def sort_kv(acc, idxa):
                k, v = jax.lax.sort_key_val(idxa + (acc & jnp.int32(1)).astype(jnp.int32), vals)
                return (k[0] + v[B // 2]).astype(jnp.uint32)

            bench(f"sort_key_val B={B}", repeat_loop(sort_kv, ITERS), idx,
                  iters=ITERS, unit_count=B, unit="elems")

            # searchsorted for tile boundaries (512-row tiles)
            tile_bounds = jnp.arange(0, nb + 512, 512, dtype=jnp.int32)

            def ssorted(acc, idxa):
                st = jnp.searchsorted(idxa + (acc & jnp.int32(1)).astype(jnp.int32), tile_bounds)
                return st.sum(dtype=jnp.int32).astype(jnp.uint32)

            bench(f"searchsorted {len(tile_bounds)} bounds", repeat_loop(ssorted, ITERS),
                  idx_sorted, iters=ITERS, unit_count=B, unit="elems")

        # round-1 Pallas DMA gather
        from awry_tpu.ops.gather_pallas import dma_gather_rows

        def dma_g(acc, idxa):
            eff = (idxa + (acc & jnp.uint32(1)).astype(jnp.int32)) % nb
            return dma_gather_rows(blocks, eff).sum(dtype=jnp.uint32) & jnp.uint32(0xFFFF)

        bench("dma_gather_rows unsorted", repeat_loop(dma_g, 5), idx, iters=5, unit_count=B)
        bench("dma_gather_rows sorted", repeat_loop(dma_g, 5), idx_sorted, iters=5, unit_count=B)

        del blocks

    # --- in-kernel VMEM gather: does jnp.take lower in Mosaic, how fast ---
    print("\n=== in-kernel VMEM gather (tile-resident) ===")
    TR = 2048  # tile rows
    tile = jnp.asarray(rng.integers(0, 2**32, size=(TR, W), dtype=np.uint64).astype(np.uint32))
    lidx = jnp.asarray(rng.integers(0, TR, size=(262_144,)).astype(np.int32))

    def take_kernel(idx_ref, tile_ref, out_ref):
        t = tile_ref[:]
        out_ref[:] = jnp.take(t, idx_ref[:], axis=0)

    def vmem_take(acc, li):
        eff = (li + (acc & jnp.uint32(1)).astype(jnp.int32)) % TR
        out = pl.pallas_call(
            take_kernel,
            out_shape=jax.ShapeDtypeStruct((li.shape[0], W), jnp.uint32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM), pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(eff, tile)
        return out.sum(dtype=jnp.uint32) & jnp.uint32(0xFFFF)

    try:
        bench("pallas jnp.take from VMEM tile (256k idx)", repeat_loop(vmem_take, ITERS),
              lidx, iters=ITERS, unit_count=262_144)
    except Exception as e:  # noqa: BLE001
        print("pallas jnp.take FAILED:", type(e).__name__, str(e)[:500])

    # XLA-level take from a small (VMEM-cacheable) table for reference
    def xla_small_take(acc, li):
        eff = (li + (acc & jnp.uint32(1)).astype(jnp.int32)) % TR
        return tile[eff].sum(dtype=jnp.uint32) & jnp.uint32(0xFFFF)

    bench("XLA take from 256 KB table (256k idx)", repeat_loop(xla_small_take, ITERS),
          lidx, iters=ITERS, unit_count=262_144)


if __name__ == "__main__":
    main()
