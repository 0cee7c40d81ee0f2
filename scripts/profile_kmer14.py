import time, sys, numpy as np, jax
def log(*a): print(*a, flush=True)
log("backend:", jax.default_backend(), jax.devices())
t0=time.perf_counter()
from awry_tpu import Alphabet, FmBuildArgs, build_from_records
rng = np.random.default_rng(0)
seq = bytes(rng.choice(np.frombuffer(b"ACGT", dtype=np.uint8), size=4_600_000))
idx = build_from_records([("e", seq)], FmBuildArgs(alphabet=Alphabet.NUCLEOTIDE,
    suffix_array_compression_ratio=8, lookup_table_kmer_len=10,
    build_kmer_table_on_device=False, locate_mark_ratio=1))
log(f"small index built {time.perf_counter()-t0:.1f}s")
from awry_tpu.ops.device_index import to_device
from awry_tpu.ops import kmer as K
import jax.numpy as jnp
from awry_tpu.alphabet import dense_to_index_table
dev = to_device(idx, minimal=True)
base=4; k=14; total=base**k
chunk = K._level_chunk(base, total)
log("chunk:", chunk, "total:", total)
syms = jnp.asarray(dense_to_index_table(idx.alphabet).astype(np.int32))
t0=time.perf_counter()
s0,e0 = K._seed_level(dev, syms); jax.block_until_ready(e0)
log(f"seed level {time.perf_counter()-t0:.1f}s")
t0=time.perf_counter()
buf_a_s = jnp.zeros((total,), dtype=jnp.uint32).at[:base].set(s0)
buf_a_e = jnp.zeros((total,), dtype=jnp.uint32).at[:base].set(e0)
buf_b_s = jnp.zeros((total,), dtype=jnp.uint32)
buf_b_e = jnp.zeros((total,), dtype=jnp.uint32)
jax.block_until_ready(buf_b_e); log(f"alloc {time.perf_counter()-t0:.1f}s")
src_s,src_e,dst_s,dst_e = buf_a_s,buf_a_e,buf_b_s,buf_b_e
size=base
for level in range(1,k):
    t0=time.perf_counter()
    new_size=size*base
    nch=0
    for off in range(0,new_size,chunk):
        dst_s,dst_e = K._extend_step(dev,src_s,src_e,dst_s,dst_e,syms,jnp.int32(size),jnp.int32(off),chunk=chunk)
        nch+=1
    jax.block_until_ready(dst_e)
    log(f"level {level+1}: {nch} chunks {time.perf_counter()-t0:.2f}s")
    src_s,src_e,dst_s,dst_e = dst_s,dst_e,src_s,src_e
    size=new_size
t0=time.perf_counter()
starts=np.asarray(src_s); log(f"D2H starts {time.perf_counter()-t0:.1f}s ({starts.nbytes/1e6:.0f} MB)")
t0=time.perf_counter()
ends=np.asarray(src_e); log(f"D2H ends {time.perf_counter()-t0:.1f}s")
