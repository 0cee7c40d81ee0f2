"""Reproduce the bench chr1 correctness failure.

Loads the cached chr1 artifact, draws the bench's exact rng(0) queries,
runs count_locate through the verify path, and cross-checks failing lanes
against the classic path + direct text comparison.

Args: [cpu|tpu] [sweep|nosweep] [nq]
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

mode = sys.argv[1] if len(sys.argv) > 1 else "tpu"
sweep = (sys.argv[2] if len(sys.argv) > 2 else "sweep") == "sweep"
NQ = int(sys.argv[3]) if len(sys.argv) > 3 else 131_072

import jax

if mode == "cpu":
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp

from awry_tpu.io.artifact import load_artifact
from awry_tpu.ops.engine import FmQueryEngine

print(f"mode={mode} sweep={sweep} nq={NQ}", flush=True)
index = load_artifact("/root/repo/.bench_cache/chr1_250Mbp_dna.npz")
engine = FmQueryEngine(index, use_sweep=sweep)
print(f"verify={engine._verify_enabled} s={getattr(engine,'_verify_s',None)}", flush=True)

rng = np.random.default_rng(0)
n, qlen = 250_000_000, 30
letters = np.frombuffer(b"ACGT", dtype=np.uint8)
print("synthesizing text...", flush=True)
seq = bytes(rng.choice(letters, size=n))
starts = rng.integers(0, n - qlen, size=NQ)
queries = [seq[s : s + qlen] for s in starts]

t0 = time.perf_counter()
counts, seq_idx, local, offsets = engine.count_locate_arrays(queries, cap=2)
print(f"count_locate_arrays: {time.perf_counter()-t0:.1f}s", flush=True)

bad = np.nonzero(counts < 1)[0]
print(f"count<1 lanes: {len(bad)} / {NQ}", flush=True)
if len(bad):
    print("first bad lanes:", bad[:10].tolist(), flush=True)
    # Inspect the device-side internals for the first few bad lanes.
    qsyms, qlens = engine.encode_queries(queries)
    out = engine._verify_fn(engine.device_index, qsyms, qlens, s=engine._verify_s)
    from awry_tpu.ops.verify import unpack_verify_bundle, wide_groups

    B = out[1].shape[0]
    bundle = np.asarray(out[0])
    pos, c_b, redis, lane_g, pos_slot, ok_slot = unpack_verify_bundle(
        bundle, B, wide_groups(B)
    )
    st = np.asarray(out[1])[:NQ]
    en = np.asarray(out[2])[:NQ]
    for i in bad[:8].tolist():
        width = int(en[i]) - int(st[i]) + 1
        ingroup = np.nonzero(lane_g == i)[0]
        print(
            f"lane {i}: bundle_count={c_b[i]} redis={redis[i]} width@s={width} "
            f"start={st[i]} pos={pos[i]} planted_at={starts[i]} "
            f"group={ingroup.tolist()}",
            flush=True,
        )
        if len(ingroup):
            g = int(ingroup[0])
            print(f"  slots ok={ok_slot[g].tolist()} pos={pos_slot[g].tolist()}", flush=True)
        # classic truth
        cc = engine._count_fn(engine.device_index, qsyms[i : i + 16], qlens[i : i + 16])
        print(f"  classic count={int(np.asarray(cc)[0])}", flush=True)
