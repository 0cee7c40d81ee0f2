"""Part 3: Pallas-native in-VMEM row selection candidates.

micro_gather2 found: XLA HBM gather is issue-bound (~25M rows/s, locality
insensitive); XLA's in-VMEM take is only ~46M rows/s; an XLA-level one-hot
MXU gather is mis-scheduled (~5 TOPS).  The sweep design therefore needs a
fast Pallas-native "select C rows from a VMEM tile" primitive.  Candidates:

  A. take_along_axis with matching shapes (Mosaic dynamic-gather wants
     input/indices/output shapes equal - probe what it accepts)
  B. in-kernel one-hot int8 MXU matmul over byte-planes (exact gather)
  C. element-wise u32 gather at XLA level (permutation application cost)
  D. lax.sort at 512k (sweep pre-pass scaling)

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/micro_gather3.py
"""

from __future__ import annotations

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

WB = 128  # bytes per row


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
        print(f"{label:58s} {dt*1e3:9.3f} ms/iter   {rate/1e6:10.2f} M{unit}/s   (chk {s:.0f})")
        return dt
    except Exception as e:  # noqa: BLE001
        print(f"{label:58s} FAILED: {type(e).__name__} {str(e)[:200]}")
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
    TR = 2048

    tile_u32 = jnp.asarray(rng.integers(0, 2**32, size=(TR, WB // 4), dtype=np.uint64).astype(np.uint32))
    tile_u8 = jax.lax.bitcast_convert_type(tile_u32, jnp.uint8).reshape(TR, WB)
    tile_s8 = jax.lax.bitcast_convert_type(tile_u8, jnp.int8)
    idx_tr = jnp.asarray(rng.integers(0, TR, size=(TR,)).astype(np.int32))

    # ---- A. take_along_axis, matching shapes ----
    def taa_match_kernel(idx_ref, tile_ref, out_ref):
        idx2 = jnp.broadcast_to(idx_ref[:][:, None], (TR, WB // 4))
        out_ref[:] = jnp.take_along_axis(tile_ref[:], idx2, axis=0)

    def call_taa(acc, li):
        eff = (li + (acc & jnp.uint32(1)).astype(jnp.int32)) % TR
        out = pl.pallas_call(
            taa_match_kernel,
            out_shape=jax.ShapeDtypeStruct((TR, WB // 4), jnp.uint32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM), pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(eff, tile_u32)
        return out.sum(dtype=jnp.uint32) & jnp.uint32(0xFFFF)

    r = bench(f"pallas take_along_axis [TR={TR},{WB//4}] matched", repeat_loop(call_taa, ITERS),
              idx_tr, iters=ITERS, unit_count=TR)
    if r is not None:
        out = pl.pallas_call(
            taa_match_kernel,
            out_shape=jax.ShapeDtypeStruct((TR, WB // 4), jnp.uint32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM), pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(idx_tr, tile_u32)
        print("   correctness:", np.array_equal(np.asarray(out), np.asarray(tile_u32)[np.asarray(idx_tr)]))

    # A2: many-chunk variant - loop take_along_axis over 8 chunks inside one kernel
    def taa_loop_kernel(idx_ref, tile_ref, out_ref):
        for c in range(8):
            idx2 = jnp.broadcast_to(idx_ref[c][:, None], (TR, WB // 4))
            out_ref[c] = jnp.take_along_axis(tile_ref[:], idx2, axis=0)

    idx_8tr = jnp.asarray(rng.integers(0, TR, size=(8, TR)).astype(np.int32))

    def call_taa8(acc, li):
        eff = (li + (acc & jnp.uint32(1)).astype(jnp.int32)) % TR
        out = pl.pallas_call(
            taa_loop_kernel,
            out_shape=jax.ShapeDtypeStruct((8, TR, WB // 4), jnp.uint32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM), pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(eff, tile_u32)
        return out.sum(dtype=jnp.uint32) & jnp.uint32(0xFFFF)

    bench("pallas take_along_axis x8 chunks (16k rows)", repeat_loop(call_taa8, ITERS),
          idx_8tr, iters=ITERS, unit_count=8 * TR)

    # ---- B. in-kernel one-hot int8 MXU gather over byte rows ----
    C = 512

    def onehot_kernel(idx_ref, tile_ref, out_ref):
        # one chunk of C requests per sub-iteration; 4 chunks per kernel call
        for c in range(4):
            idxc = idx_ref[c]  # [C]
            iota = jax.lax.broadcasted_iota(jnp.int32, (C, TR), 1)
            oh = (iota == idxc[:, None]).astype(jnp.int8)
            prod = jax.lax.dot_general(
                oh, tile_ref[:], (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
            )  # [C, WB] each value = s8 byte of the selected row
            out_ref[c] = prod

    idx_4c = jnp.asarray(rng.integers(0, TR, size=(4, C)).astype(np.int32))

    def call_oh(acc, li):
        eff = (li + (acc & jnp.uint32(1)).astype(jnp.int32)) % TR
        out = pl.pallas_call(
            onehot_kernel,
            out_shape=jax.ShapeDtypeStruct((4, C, WB), jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM), pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(eff, tile_s8)
        return out.sum(dtype=jnp.int32).astype(jnp.uint32) & jnp.uint32(0xFFFF)

    r = bench(f"pallas one-hot s8 MXU gather 4x{C} reqs, TR={TR}", repeat_loop(call_oh, ITERS),
              idx_4c, iters=ITERS, unit_count=4 * C)
    if r is not None:
        out = pl.pallas_call(
            onehot_kernel,
            out_shape=jax.ShapeDtypeStruct((4, C, WB), jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM), pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(idx_4c, tile_s8)
        got = np.asarray(out)[0] & 0xFF
        exp = np.asarray(tile_u8)[np.asarray(idx_4c)[0]].astype(np.int64)
        print("   correctness:", np.array_equal(got, exp))

    # ---- C. element-wise u32 gather (XLA) ----
    for BE in (262_144,):
        table_e = jnp.asarray(rng.integers(0, 2**32, size=BE, dtype=np.uint64).astype(np.uint32))
        idx_e = jnp.asarray(rng.permutation(BE).astype(np.int32))

        def egather(acc, ie):
            eff = (ie + (acc & jnp.uint32(1)).astype(jnp.int32)) % BE
            return table_e[eff].sum(dtype=jnp.uint32) & jnp.uint32(0xFFFF)

        bench(f"XLA element u32 gather B={BE}", repeat_loop(egather, ITERS), idx_e,
              iters=ITERS, unit_count=BE, unit="elems")

    # ---- D. sort scaling ----
    for BS in (524_288, 1_048_576):
        keys = jnp.asarray(rng.integers(0, 2**22, size=BS).astype(np.uint32))
        vals = jnp.arange(BS, dtype=jnp.int32)

        def sort_kv(acc, ka):
            k, v = jax.lax.sort_key_val(ka + (acc & jnp.uint32(1)), vals)
            return (k[0] + v[BS // 2].astype(jnp.uint32)) & jnp.uint32(0xFFFF)

        bench(f"sort_key_val B={BS}", repeat_loop(sort_kv, 10), keys, iters=10,
              unit_count=BS, unit="elems")


if __name__ == "__main__":
    main()
