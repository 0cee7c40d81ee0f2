import sys, time
sys.path.insert(0, ".")
import jax; jax.config.update("jax_platforms", "cpu")
import numpy as np
from awry_tpu.io.artifact import load_artifact, save_artifact
for name in sys.argv[1:]:
    p = f".bench_cache/{name}.npz"
    t0 = time.time()
    idx = load_artifact(p)
    if idx.bwt_len > (1 << 32):
        print(name, "wide; skipped"); continue
    changed = False
    for f in ("sampled_sa", "text_sampled_sa", "kmer_table"):
        a = getattr(idx, f)
        if a is not None and a.dtype == np.uint64:
            setattr(idx, f, a.astype(np.uint32)); changed = True
    if changed:
        save_artifact(idx, p, compress=False)
    print(name, "done" if changed else "already compact", f"{time.time()-t0:.0f}s", flush=True)
