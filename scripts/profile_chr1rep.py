"""Phase-level profile of ONE chr1rep serving batch: where do 43 s/batch go?

Wraps the engine's walk / classic-subdispatch / bundle-transfer seams with
timers, runs one 512k batch through count_locate_arrays, prints the split.
"""

import sys
import time
import zlib

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from awry_tpu.io.artifact import load_artifact
from awry_tpu.ops import FmQueryEngine
import awry_tpu.ops.engine as eng_mod


def log(*a):
    print(*a, flush=True)


def main():
    t0 = time.time()
    index = load_artifact(".bench_cache/chr1rep_250Mbp_dna.npz")
    log(f"loaded {time.time()-t0:.0f}s")

    import bench

    cfg = [c for c in bench.CONFIGS if c["name"] == "chr1rep_250Mbp_dna"][0]
    rng = bench.config_rng(cfg)
    seq = bench.synth_text(cfg, rng)
    log(f"text {time.time()-t0:.0f}s")

    engine = FmQueryEngine(index)
    starts = rng.integers(0, cfg["n"] - cfg["qlen"], size=cfg["nq"])
    queries = [seq[s : s + cfg["qlen"]] for s in starts]
    qsyms, qlens = engine.encode_queries(queries)
    log(f"engine+encode {time.time()-t0:.0f}s")

    timers = {}

    def timed(name, fn):
        def wrap(*a, **kw):
            jax.block_until_ready(a[1] if len(a) > 1 else None) if False else None
            tt = time.perf_counter()
            out = fn(*a, **kw)
            jax.block_until_ready(out)
            timers[name] = timers.get(name, 0.0) + time.perf_counter() - tt
            timers[name + "_calls"] = timers.get(name + "_calls", 0) + 1
            return out
        return wrap

    engine._walk_fn = timed("walk_dispatch", engine._walk_fn)
    engine._count_locate_fn = timed("classic_subdispatch", engine._count_locate_fn)
    verify_fn = engine._verify_fn

    def timed_verify(*a, **kw):
        tt = time.perf_counter()
        out = verify_fn(*a, **kw)
        jax.block_until_ready(out[0])
        timers["verify_kernel+bundle_xfer"] = (
            timers.get("verify_kernel+bundle_xfer", 0.0) + time.perf_counter() - tt
        )
        return out

    engine._verify_fn = timed_verify

    # warm: run once (compiles)
    tw = time.perf_counter()
    out = engine.count_locate_arrays(queries, cap=2)
    log(f"warm batch total {time.perf_counter()-tw:.1f}s  timers={ {k: round(v,2) for k,v in timers.items()} }")
    log(f"total hits {int(out[3][-1])}, count>cap queries {(out[0] > 2).sum()}")
    timers.clear()

    t1 = time.perf_counter()
    out = engine.count_locate_arrays(queries, cap=2)
    total = time.perf_counter() - t1
    accounted = sum(v for k, v in timers.items() if not k.endswith("_calls"))
    log(f"hot batch total {total:.2f}s  accounted {accounted:.2f}s  "
        f"host-side remainder {total-accounted:.2f}s")
    for k, v in sorted(timers.items()):
        log(f"  {k}: {round(v, 3)}")


if __name__ == "__main__":
    main()
