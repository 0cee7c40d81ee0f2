"""Stage-by-stage profile of the chr1 slot-verify serving path (round 3).

Times jitted prefixes of count_locate_slots_t on the real chip, all outputs
device-reduced (relay isolation):
  unpack      wire -> qt
  seed        search_ranges_t(num_steps=k): addr + kmer window_sweep
  seed_sort   the kmer sweep's sort alone (sorted_chunks on the addresses)
  fat         + slot-row fat sweep (window_sweep_cov over vw_sweep)
  fat_sort    the fat sweep's sort alone
  cmp         + text compares
  full        complete count_locate_slots_t bundle
Also sweeps the batch size (512k/1M/2M/4M) on the full program to measure
how much the per-batch table streaming amortizes.

Run: python scripts/profile_slot_r3.py [chr1|ecoli] [batch-sweep]
"""

from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from awry_tpu.io.artifact import load_artifact
from awry_tpu.ops.engine import FmQueryEngine
from awry_tpu.ops.search import search_ranges_t
from awry_tpu.ops.sweep import _auto_interpret, _sorted_chunks, pick_window_tiles
from awry_tpu.ops.verify import count_locate_slots_t

CFG = sys.argv[1] if len(sys.argv) > 1 else "chr1"
ART = {
    "chr1": "/root/repo/.bench_cache/chr1_250Mbp_dna.npz",
    "ecoli": "/root/repo/.bench_cache/ecoli_4.6Mbp_dna.npz",
}[CFG]
N = {"chr1": 250_000_000, "ecoli": 4_600_000}[CFG]
QLEN = 30


def timeit(label, fn, *args, iters=8):
    @jax.jit
    def red(*a):
        leaves = jax.tree_util.tree_leaves(fn(*a))
        tot = jnp.float32(0)
        for leaf in leaves:
            tot = tot + jnp.sum(leaf.astype(jnp.float32))
        return tot

    jax.block_until_ready(red(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = red(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters * 1e3
    print(f"{label:44s} {dt:9.2f} ms", flush=True)
    return dt


def make_batch(engine, seq, nq, rng):
    starts = rng.integers(0, N - QLEN, size=nq)
    queries = [seq[s : s + QLEN] for s in starts]
    qsyms, qlens = engine.encode_queries(queries)
    return jnp.asarray(qsyms), jnp.asarray(qlens)


def main():
    import zlib

    print(f"devices: {jax.devices()}", flush=True)
    index = load_artifact(ART)
    engine = FmQueryEngine(index, use_sweep=True)
    di = engine.device_index
    s = engine._verify_s
    print(
        f"{CFG}: k={index.kmer_len} s={s} slots={engine._verify_slots} "
        f"vw_row_words={di.vw_row_words}",
        flush=True,
    )
    assert engine._verify_slots, "slot regime expected for this profile"
    # Regenerate the config text stream exactly as bench.py does (queries
    # must hit the cached index or the fat path never fires).
    name = {"chr1": "chr1_250Mbp_dna", "ecoli": "ecoli_4.6Mbp_dna"}[CFG]
    rng = np.random.default_rng([0, zlib.crc32(name.encode())])
    letters = np.frombuffer(b"ACGT", dtype=np.uint8)
    seq = bytes(rng.choice(letters, size=N))

    nq = 524_288
    qt_wire, qlens = make_batch(engine, seq, nq, rng)

    from awry_tpu.ops.search import unpack_crumbs_t

    crumb_inv = engine._crumb_inv

    def unpack(idx, qw, ql):  # noqa: ARG001
        return unpack_crumbs_t(qw, crumb_inv)

    def stage_unpack(idx, qw, ql):
        return unpack(idx, qw, ql)

    def stage_seed(idx, qw, ql):
        qt = unpack(idx, qw, ql)
        return search_ranges_t(idx, qt, ql, num_steps=s, no_sentinel=True)

    def stage_full(idx, qw, ql):
        qt = unpack(idx, qw, ql)
        return count_locate_slots_t(idx, qt, ql, s, no_sentinel=True)

    # Sort-only probes: the kmer sweep sorts B requests; the fat sweep sorts
    # B*WIDE_CAP.  _sorted_chunks(pos, val, wt) = pad + one sort_key_val +
    # window/chunk bookkeeping.
    kt = pick_window_tiles(
        int(di.kmer_sweep.shape[0]) if di.kmer_sweep is not None else 1, nq, 2
    )

    def stage_seed_sort(idx, qw, ql):
        qt = unpack(idx, qw, ql)
        # address stream stand-in: hash the first crumb word (uniform u32)
        pos = qw[0].astype(jnp.uint32) if qw.ndim == 2 else qw.astype(jnp.uint32)
        pos = pos[:nq]
        val = jnp.arange(pos.shape[0], dtype=jnp.uint32)
        return _sorted_chunks(pos, val, kt)[:2]

    timeit("unpack (wire -> qt)", stage_unpack, di, qt_wire, qlens)
    timeit("seed (addr + kmer sweep)", stage_seed, di, qt_wire, qlens)
    timeit("sort 512k (sorted_chunks)", stage_seed_sort, di, qt_wire, qlens)
    timeit("FULL slot program", stage_full, di, qt_wire, qlens)

    if len(sys.argv) > 2 and sys.argv[2] == "batch-sweep":
        for nq2 in (1_048_576, 2_097_152, 4_194_304):
            try:
                qw2, ql2 = make_batch(engine, seq, nq2, rng)
                dt = timeit(f"FULL slot program  nq={nq2}", stage_full, di, qw2, ql2, iters=4)
                print(f"  -> device q/s at nq={nq2}: {nq2/dt*1e3:,.0f}", flush=True)
            except Exception as e:  # noqa: BLE001
                print(f"  nq={nq2} failed: {type(e).__name__}: {e}", flush=True)
                break


if __name__ == "__main__":
    main()
