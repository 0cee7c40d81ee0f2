"""Device-time of the fused verify program vs switch depth s (GRCh38 cache)."""
import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp

from awry_tpu.io.artifact import load_artifact
from awry_tpu.ops.engine import FmQueryEngine

cache = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.bench_cache/grch38_3.1Gbp_dna.npz"
nq = 131_072
qlen = int(sys.argv[2]) if len(sys.argv) > 2 else 100
print("loading...", flush=True)
index = load_artifact(cache)
engine = FmQueryEngine(index)
dev = engine.device_index
rng = np.random.default_rng(3)
# Text-drawn queries so the wide/redis population is realistic.
starts = rng.integers(0, index.bwt_len - qlen - 2, size=nq)
tp = index.text_packed  # 4-bit packed
# decode symbols from packed text
w = np.asarray(tp)
def sym_at(p):
    return (w[p // 8] >> (4 * (p % 8))) & 0xF
qsyms = np.zeros((nq, qlen), dtype=np.int8)
pos = starts[:, None] + np.arange(qlen)[None, :]
qsyms = ((w[pos // 8] >> (4 * (pos % 8))) & 0xF).astype(np.int8)
L = 128
full = np.zeros((nq, L), dtype=np.int8)
full[:, L - qlen:] = qsyms
dense_lut = np.array([-1, 0, 1, 2, -1, 3], dtype=np.int8)
d = np.maximum(dense_lut[full], 0).astype(np.uint8)
crumb = (d[:, 0::4] | (d[:, 1::4] << 2) | (d[:, 2::4] << 4) | (d[:, 3::4] << 6)).astype(np.uint8).view(np.int8)
qw = jnp.asarray(crumb)
qlens = jnp.full((nq,), qlen, dtype=jnp.int32)
jax.block_until_ready(qw)
N = 8
for s in (17, 18, 19, 21):
    out = engine._verify_fn(dev, qw, qlens, s=s)
    jax.block_until_ready(out)
    bundle = np.asarray(out[0])
    from awry_tpu.ops.verify import unpack_verify_bundle, wide_groups
    _, counts, redis, *_ = unpack_verify_bundle(bundle, nq, wide_groups(nq))
    t0 = time.perf_counter()
    for _ in range(N):
        out = engine._verify_fn(dev, qw, qlens, s=s)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / N * 1e3
    print(f"s={s}: fused {dt:8.2f} ms  redis={int(redis.sum())}  wide_settled~counts>1:{int((counts>1).sum())}", flush=True)
