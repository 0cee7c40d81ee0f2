"""Scaling-efficiency harness: count q/s vs device count, Mode A and Mode B.

Measures the sharded engine at 1/2/4/8 devices.  On this rig the devices are
VIRTUAL (CPU backend, xla_force_host_platform_device_count=8, all sharing the
same physical cores) so the numbers validate the HARNESS and the collective
paths, not real scaling; on a real pod slice the same script runs unchanged
with JAX_PLATFORMS=tpu.  Results land in scaling_results.json.

Run: python scripts/scaling_bench.py [n_symbols] [batch]
"""

from __future__ import annotations

import json
import os
import sys
import time

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax

# Force CPU BEFORE any backend query: probing jax.default_backend() first
# would initialize the (single-client) tunneled TPU and can deadlock against
# a concurrent TPU process.  Set AWRY_SCALING_TPU=1 to run on real chips.
if os.environ.get("AWRY_SCALING_TPU") != "1":
    jax.config.update("jax_platforms", "cpu")

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from awry_tpu import Alphabet, FmBuildArgs, build_from_records
from awry_tpu.parallel import ShardedFmEngine, make_mesh


def measure(engine, batches, trials=3):
    # warm up / compile
    engine.count_batch(batches[0])
    best = 0.0
    for _ in range(trials):
        t0 = time.perf_counter()
        for b in batches:
            engine.count_batch(b)
        dt = time.perf_counter() - t0
        best = max(best, sum(len(b) for b in batches) / dt)
    return best


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    bsz = int(sys.argv[2]) if len(sys.argv) > 2 else 16_384
    rng = np.random.default_rng(0)
    seq = bytes(rng.choice(np.frombuffer(b"ACGT", dtype=np.uint8), size=n))
    index = build_from_records([("scale", seq)], FmBuildArgs(
        alphabet=Alphabet.NUCLEOTIDE, lookup_table_kmer_len=8))

    starts = rng.integers(0, n - 30, size=bsz * 4)
    queries = [seq[s : s + 30] for s in starts]
    batches = [queries[i * bsz : (i + 1) * bsz] for i in range(4)]

    total = len(jax.devices())
    results = {"backend": jax.default_backend(), "devices_total": total,
               "virtual": jax.default_backend() == "cpu", "modeA": [], "modeB": []}
    counts = [c for c in (1, 2, 4, 8) if c <= total]
    base = None
    for nd in counts:
        mesh = make_mesh(nd, shard_size=1)
        qps = measure(ShardedFmEngine(index, mesh), batches)
        base = base or qps
        eff = qps / (base * nd)
        results["modeA"].append({"devices": nd, "qps": round(qps), "efficiency": round(eff, 3)})
        print(f"Mode A (replicated)   {nd} dev: {qps:,.0f} q/s  eff={eff:.2f}", flush=True)
    baseb = None
    for nd in counts:
        if nd < 2:
            continue
        mesh = make_mesh(nd, shard_size=2)
        qps = measure(ShardedFmEngine(index, mesh, shard_size=2), batches)
        baseb = baseb or qps
        eff = qps / (baseb * (nd // 2))
        results["modeB"].append({"devices": nd, "shard_size": 2, "qps": round(qps),
                                 "efficiency": round(eff, 3)})
        print(f"Mode B (range-shard)  {nd} dev: {qps:,.0f} q/s  eff={eff:.2f}", flush=True)

    results["collectives"] = collective_cost(index, batches[0])
    results["modeA_dispatch"] = mode_a_dispatch_isolation(index, batches[0], counts)
    results["mesh_serving"] = mesh_serving(index, batches, counts)

    out = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                       "scaling_results.json")
    with open(out, "w") as f:
        json.dump(results, f, indent=2)
    print(json.dumps(results))


def mode_a_dispatch_isolation(index, batch, counts):
    """Mode A overhead isolation (round-3 verdict weak #5): split the
    per-batch wall time into FIXED dispatch cost (host encode + shard_map
    dispatch + result gather — measured as the wall time of a tiny batch,
    whose compute is negligible) and per-lane COMPUTE (the remainder).
    Real-hardware scaling then has a formula instead of a hope:

        eff(nd) = T_compute / (T_compute / nd + T_dispatch(nd)) / nd_base...
        qps(nd) ~= B / (T_dispatch(nd) + T_compute(1) / nd)

    On this rig's virtual devices T_compute(1) already uses all physical
    cores, so eff collapses by construction; the split itself is the
    portable artifact (T_dispatch grows only mildly with nd, so chips whose
    T_compute >> T_dispatch scale near-linearly)."""
    rows = []
    tiny = batch[:256]
    for nd in counts:
        mesh = make_mesh(nd, shard_size=1)
        engine = ShardedFmEngine(index, mesh)
        engine.count_batch(tiny)
        engine.count_batch(batch)  # compile both shapes
        t_tiny = min(_walltime(engine, tiny) for _ in range(5))
        t_full = min(_walltime(engine, batch) for _ in range(5))
        rows.append({
            "devices": nd,
            "batch": len(batch),
            "t_full_ms": round(t_full * 1e3, 2),
            "t_dispatch_ms": round(t_tiny * 1e3, 2),
            "t_compute_ms": round((t_full - t_tiny) * 1e3, 2),
            "dispatch_share": round(t_tiny / t_full, 3),
        })
        print(f"Mode A dispatch split {nd} dev: full {t_full*1e3:.1f} ms, "
              f"dispatch {t_tiny*1e3:.1f} ms ({t_tiny/t_full:.0%})", flush=True)
    return rows


def _walltime(engine, batch):
    t0 = time.perf_counter()
    engine.count_batch(batch)
    return time.perf_counter() - t0


def mesh_serving(index, batches, counts):
    """Mode A data-parallel SERVING through the full verify path (round-4
    verdict task 6): FmQueryEngine(mesh=...) driving count_locate_stream
    (seed-walk-verify, sorted sweep, ragged assembly) at each device count,
    with the per-device bundle-unpack overhead isolated — the host-side
    cost a real multi-chip deployment pays for splitting/rebasing each
    device's packed result bundle (unpack_verify_bundle_sharded).  On this
    rig's virtual mesh the qps numbers validate the path, not real scaling;
    the unpack_ms split is the portable software-overhead floor."""
    from jax.sharding import Mesh

    from awry_tpu.ops import FmQueryEngine
    from awry_tpu.ops.verify import (
        unpack_verify_bundle,
        unpack_verify_bundle_sharded,
        wide_groups,
    )

    rows = []
    for nd in counts:
        if nd > 1:
            mesh = Mesh(np.array(jax.devices()[:nd]).reshape(nd), ("data",))
            eng = FmQueryEngine(index, mesh=mesh)
        else:
            eng = FmQueryEngine(index)
        if not eng._verify_enabled:
            rows.append({"devices": nd, "skipped": "verify path not enabled"})
            continue
        enc = [eng.encode_queries(b) + (len(b),) for b in batches]
        list(eng.count_locate_stream(enc[:1], cap=2))  # warm/compile
        for k in eng.stats:
            eng.stats[k] = 0
        best = 0.0
        for _ in range(3):
            t0 = time.perf_counter()
            for _out in eng.count_locate_stream(enc, cap=2):
                pass
            dt = time.perf_counter() - t0
            best = max(best, sum(len(b) for b in batches) / dt)
        # Bundle-unpack overhead: the one host-side step whose cost grows
        # with device count (split + per-device unpack + wide-group lane
        # rebase + concat).
        qsyms, qlens, _n = enc[0]
        out = eng._verify_fn(eng.device_index, qsyms, qlens, s=eng._verify_s)
        bundle, bb = np.asarray(out[0]), out[1].shape[0]
        t0 = time.perf_counter()
        reps = 10
        for _ in range(reps):
            if eng._data_shards > 1:
                unpack_verify_bundle_sharded(bundle, bb, eng._data_shards)
            else:
                unpack_verify_bundle(bundle, bb, wide_groups(bb))
        unpack_ms = (time.perf_counter() - t0) / reps * 1e3
        rows.append({
            "devices": nd,
            "qps": round(best),
            "batch": len(batches[0]),
            "unpack_ms": round(unpack_ms, 3),
            "fast_path_batches": eng.stats["fast_path_batches"],
            "batches": eng.stats["batches"],
            "api": "count_locate_stream (verify path)",
        })
        print(f"Mesh serving          {nd} dev: {best:,.0f} q/s, "
              f"unpack {unpack_ms:.2f} ms", flush=True)
    return rows


def collective_cost(index, batch):
    """Isolate Mode B's collective cost per rank step (round-2 verdict weak
    #6): every LF step psums TWO uint32[B/d] rank vectors over the shard
    axis.  Measured two ways:

    * chained-psum microbench: K dependent psums over the same payload
      shape -> per-psum wall time on THIS mesh (virtual CPU devices here;
      run with AWRY_SCALING_TPU=1 on a pod slice for ICI numbers);
    * whole-engine A/B: Mode B count with psums intact vs the same program
      with lax.psum patched to identity at trace time (identical local
      compute, wrong results, zero collectives) -> collective share of the
      end-to-end step.

    Plus the analytic bytes/step (payload only - what an ICI-bandwidth
    model needs): 2 psums x 4 B x B lanes, all-reduced over `shard`.
    """
    import jax.numpy as jnp
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    from awry_tpu.parallel.mesh import SHARD_AXIS

    out = []
    total = len(jax.devices())
    for nd in (2, 4, 8):
        if nd > total:
            continue
        mesh = make_mesh(nd, shard_size=nd)
        b_local = max(1, len(batch) // nd)
        K = 32

        def chained(x):
            for _ in range(K):
                x = jax.lax.psum(x, SHARD_AXIS) + jnp.uint32(1)
            return x

        fn = jax.jit(shard_map(chained, mesh=mesh, in_specs=P("data"),
                               out_specs=P("data"), check_vma=False))
        x = np.zeros((max(nd, 4096),), dtype=np.uint32)
        fn(x).block_until_ready()
        t0 = time.perf_counter()
        for _ in range(10):
            fn(x).block_until_ready()
        per_psum_us = (time.perf_counter() - t0) / (10 * K) * 1e6

        # Whole-engine A/B: psum vs identity at trace time.
        eng = ShardedFmEngine(index, make_mesh(nd, shard_size=nd), shard_size=nd)
        t_with = _time_count(eng, batch)
        real_psum = jax.lax.psum
        try:
            jax.lax.psum = lambda x, axis, **kw: x  # traced into the program
            eng2 = ShardedFmEngine(index, make_mesh(nd, shard_size=nd), shard_size=nd)
            t_without = _time_count(eng2, batch)
        finally:
            jax.lax.psum = real_psum
        row = {
            "shards": nd,
            "psum_payload_bytes_per_step": 2 * 4 * len(batch),
            "per_psum_us_chained": round(per_psum_us, 1),
            "modeB_count_s_with_psum": round(t_with, 4),
            "modeB_count_s_no_psum": round(t_without, 4),
            "collective_share": round(max(0.0, 1 - t_without / t_with), 3),
        }
        out.append(row)
        print(f"collectives {nd} shards: {row}", flush=True)
    return out


def _time_count(engine, batch, trials=3):
    engine.count_batch(batch)
    best = float("inf")
    for _ in range(trials):
        t0 = time.perf_counter()
        engine.count_batch(batch)
        best = min(best, time.perf_counter() - t0)
    return best


if __name__ == "__main__":
    main()
