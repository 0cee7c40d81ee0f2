"""Part 2: in-kernel VMEM gather + sweep building blocks (see micro_gather.py).

Answers, on the real chip:
  A. does jnp.take / take_along_axis lower inside a Pallas TPU kernel, and at
     what rows/s from a VMEM-resident tile?
  B. XLA gather with degenerate (all-equal) indices - is the HBM gather
     issue-bound or locality-sensitive?
  C. XLA scan-over-tiles sweep prototype (no Pallas): dynamic_slice a tile,
     take its requests, scan all tiles.
  D. one-hot int8 MXU matmul gather fallback (exact: nibble-planes).

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/micro_gather2.py
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

W = 32


def bench(label, fn, *args, iters=20, unit_count=None, unit="rows"):
    try:
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
    except Exception as e:  # noqa: BLE001
        print(f"{label:55s} FAILED: {type(e).__name__} {str(e)[:300]}")
        return None


def repeat_loop(body, iters):
    def run(*args):
        def step(_, acc):
            return body(acc, *args)

        return jax.lax.fori_loop(0, iters, step, jnp.uint32(1))

    return run


def main():
    print("devices:", jax.devices())
    rng = np.random.default_rng(0)
    ITERS = 20

    # ---------- A. in-kernel VMEM gather ----------
    TR = 2048
    B = 65536
    tile = jnp.asarray(rng.integers(0, 2**32, size=(TR, W), dtype=np.uint64).astype(np.uint32))
    lidx = jnp.asarray(rng.integers(0, TR, size=(B,)).astype(np.int32))

    def mk_pallas(kernel_fn):
        def call(acc, li):
            eff = (li + (acc & jnp.uint32(1)).astype(jnp.int32)) % TR
            out = pl.pallas_call(
                kernel_fn,
                out_shape=jax.ShapeDtypeStruct((B, W), jnp.uint32),
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                          pl.BlockSpec(memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            )(eff, tile)
            return out.sum(dtype=jnp.uint32) & jnp.uint32(0xFFFF)

        return call

    def take_kernel(idx_ref, tile_ref, out_ref):
        out_ref[:] = jnp.take(tile_ref[:], idx_ref[:], axis=0)

    def taa_kernel(idx_ref, tile_ref, out_ref):
        idx2 = jnp.broadcast_to(idx_ref[:][:, None], (B, W))
        out_ref[:] = jnp.take_along_axis(tile_ref[:], idx2, axis=0)

    bench("pallas jnp.take VMEM tile (64k idx, 2k rows)", repeat_loop(mk_pallas(take_kernel), ITERS),
          lidx, iters=ITERS, unit_count=B)
    bench("pallas take_along_axis VMEM tile", repeat_loop(mk_pallas(taa_kernel), ITERS),
          lidx, iters=ITERS, unit_count=B)

    # correctness check of whichever compiles (plain run, vs numpy)
    for name, k in (("take", take_kernel), ("taa", taa_kernel)):
        try:
            out = pl.pallas_call(
                k,
                out_shape=jax.ShapeDtypeStruct((B, W), jnp.uint32),
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM), pl.BlockSpec(memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            )(lidx, tile)
            ok = np.array_equal(np.asarray(out), np.asarray(tile)[np.asarray(lidx)])
            print(f"   {name} correctness: {ok}")
        except Exception as e:  # noqa: BLE001
            print(f"   {name} correctness: compile failed ({str(e)[:120]})")

    # XLA-level take from the same small table, for reference
    def xla_small_take(acc, li):
        eff = (li + (acc & jnp.uint32(1)).astype(jnp.int32)) % TR
        return tile[eff].sum(dtype=jnp.uint32) & jnp.uint32(0xFFFF)

    bench("XLA take from 256 KB table (64k idx)", repeat_loop(xla_small_take, ITERS),
          lidx, iters=ITERS, unit_count=B)

    # ---------- B. degenerate-index HBM gather ----------
    nb = 1_000_000
    blocks = jnp.asarray(rng.integers(0, 2**32, size=(nb, W), dtype=np.uint64).astype(np.uint32))
    BB = 262_144
    zeros_idx = jnp.zeros((BB,), dtype=jnp.int32)
    rnd_idx = jnp.asarray(rng.integers(0, nb, size=BB).astype(np.int32))
    narrow_idx = jnp.asarray(rng.integers(0, 2048, size=BB).astype(np.int32))

    def xla_gather(acc, idxa):
        eff = (idxa + (acc & jnp.uint32(1)).astype(jnp.int32)) % nb
        return blocks[eff].sum(dtype=jnp.uint32).astype(jnp.uint32) & jnp.uint32(0xFFFF)

    bench("XLA gather 128MB all-zero idx", repeat_loop(xla_gather, ITERS), zeros_idx,
          iters=ITERS, unit_count=BB)
    bench("XLA gather 128MB idx in [0,2048)", repeat_loop(xla_gather, ITERS), narrow_idx,
          iters=ITERS, unit_count=BB)
    bench("XLA gather 128MB random idx", repeat_loop(xla_gather, ITERS), rnd_idx,
          iters=ITERS, unit_count=BB)

    # ---------- C. XLA scan-over-tiles sweep prototype ----------
    # sorted requests; per tile: dynamic_slice [TRS, W] + take CMAX requests.
    TRS = 4096
    NT = nb // TRS  # 244 tiles (+ tail ignored in prototype)
    CMAX = 4 * (BB // NT)
    srt = np.sort(np.asarray(rnd_idx))
    bounds = np.searchsorted(srt, np.arange(NT + 1) * TRS).astype(np.int32)
    padded_req = np.zeros(NT * CMAX, dtype=np.int32)  # per-tile padded request lists
    per_tile_n = np.minimum(np.diff(bounds), CMAX)
    for t in range(NT):  # host-side prep; device prep measured separately
        padded_req[t * CMAX : t * CMAX + per_tile_n[t]] = srt[bounds[t] : bounds[t] + per_tile_n[t]]
    padded_req_d = jnp.asarray(padded_req.reshape(NT, CMAX))

    def sweep_scan(acc, reqs):
        def body(carry, tile_reqs):
            t, a = carry
            tile_blocks = jax.lax.dynamic_slice(blocks, (t * TRS, 0), (TRS, W))
            local = (tile_reqs - t * TRS + (a & jnp.int32(1))) % TRS
            rows = jnp.take(tile_blocks, local, axis=0)
            return (t + 1, a + rows.sum(dtype=jnp.uint32).astype(jnp.int32)), None

        (t, a), _ = jax.lax.scan(body, (jnp.int32(0), acc.astype(jnp.int32)), reqs)
        return a.astype(jnp.uint32) & jnp.uint32(0xFFFF)

    bench(f"XLA scan-sweep 128MB ({NT} tiles x {CMAX} reqs)", repeat_loop(sweep_scan, 5),
          padded_req_d, iters=5, unit_count=NT * CMAX)

    # ---------- D. one-hot int8 MXU gather (exact, nibble planes) ----------
    C8 = 256  # requests per matmul
    tile8 = tile.astype(jnp.uint32)
    nib = jnp.stack([(tile8 >> (4 * i)) & jnp.uint32(0xF) for i in range(8)], axis=-1)
    nib8 = nib.reshape(TR, W * 8).astype(jnp.int8)  # [TR, 256]
    oh_idx = jnp.asarray(rng.integers(0, TR, size=(B // 256, C8)).astype(np.int32))

    def onehot_gather(acc, ohi):
        def body(carry, idx_row):
            iota = jax.lax.broadcasted_iota(jnp.int32, (C8, TR), 1)
            oh = (iota == idx_row[:, None]).astype(jnp.int8)
            prod = jax.lax.dot_general(
                oh, nib8, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
            )
            return carry + prod.sum(dtype=jnp.int32), None

        a, _ = jax.lax.scan(body, acc.astype(jnp.int32), ohi)
        return a.astype(jnp.uint32) & jnp.uint32(0xFFFF)

    bench(f"one-hot int8 MXU gather ({B//256}x{C8} reqs, {TR} rows)",
          repeat_loop(onehot_gather, 5), oh_idx, iters=5, unit_count=B)


if __name__ == "__main__":
    main()
