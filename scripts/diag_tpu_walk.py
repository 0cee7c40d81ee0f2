"""Binary-search the chr1 TPU correctness failure across verify-path stages.

Stages checked against independent references ON THE CHIP:
  1. search_ranges (sweep) vs plain-gather engine ranges
  2. lf_walk at the fused size (B + G*WIDE_CAP) sweep vs plain marked walk
  3. compare_text_suffixes vs host text compare
  4. bundle decode vs recomputed flags

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/diag_tpu_walk.py [nq]
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from awry_tpu.io.artifact import load_artifact
from awry_tpu.ops.engine import FmQueryEngine

NQ = int(sys.argv[1]) if len(sys.argv) > 1 else 131_072

print("loading chr1...", flush=True)
index = load_artifact("/root/repo/.bench_cache/chr1_250Mbp_dna.npz")
eng = FmQueryEngine(index, use_sweep=True)
plain = FmQueryEngine(index, use_sweep=False, use_verify=False)
dev, pdev = eng.device_index, plain.device_index
s = eng._verify_s

rng = np.random.default_rng(0)
n, qlen = 250_000_000, 30
letters = np.frombuffer(b"ACGT", dtype=np.uint8)
print("synthesizing text...", flush=True)
seq = bytes(rng.choice(letters, size=n))
starts = rng.integers(0, n - qlen, size=NQ)
queries = [seq[s0 : s0 + qlen] for s0 in starts]
qsyms, qlens = eng.encode_queries(queries)

from awry_tpu.ops.search import search_ranges, unpack_nibbles
from awry_tpu.ops.locate import lf_walk, _marked_walk
from awry_tpu.ops.verify import (
    WIDE_CAP,
    compare_text_suffixes,
    count_locate_verify,
    unpack_verify_bundle,
    wide_groups,
)

qs_u = jax.jit(unpack_nibbles)(qsyms)

# --- stage 1: ranges ---
t0 = time.perf_counter()
st1, en1 = jax.jit(lambda d, a, b: search_ranges(d, a, b, num_steps=s))(dev, qs_u, qlens)
st2, en2 = jax.jit(lambda d, a, b: search_ranges(d, a, b, num_steps=s))(pdev, qs_u, qlens)
st1, en1, st2, en2 = map(np.asarray, (st1, en1, st2, en2))
bad = np.nonzero((st1 != st2) | (en1 != en2))[0]
print(f"stage1 ranges: {len(bad)} mismatches ({time.perf_counter()-t0:.0f}s)", flush=True)
if len(bad):
    for i in bad[:5]:
        print(f"  lane {i}: sweep=({st1[i]},{en1[i]}) plain=({st2[i]},{en2[i]})", flush=True)

# --- stage 2: walk at fused size ---
B = st1.shape[0]
G = wide_groups(B)
width = en1.astype(np.int64) - st1.astype(np.int64) + 1
lens = np.asarray(qlens)
cand = (width == 1) & (lens > s)
rows_main = np.where(cand, st1, 0).astype(np.uint32)
# wide slots exactly as the kernel builds them
wide = (width >= 2) & (lens > s)
gidx = np.cumsum(wide) - 1
fits = wide & (width <= WIDE_CAP) & (gidx < G)
lane_of_group = np.full(G, B, dtype=np.int64)
lane_of_group[gidx[fits]] = np.nonzero(fits)[0]
lane_safe = np.where(lane_of_group < B, lane_of_group, 0)
g_start = st1[lane_safe].astype(np.uint32)
g_width = np.where(lane_of_group < B, width[lane_safe], 0)
j = np.arange(WIDE_CAP)
slot_rows = np.where(j[None, :] < g_width[:, None], g_start[:, None] + j[None, :], 0).astype(np.uint32)
rows_all = np.concatenate([rows_main, slot_rows.reshape(-1)])
print(f"walk input: {rows_all.shape[0]} rows ({int(fits.sum())} wide-settled lanes)", flush=True)

t0 = time.perf_counter()
p_sweep = np.asarray(jax.jit(lf_walk)(dev, jnp.asarray(rows_all)))
p_plain = np.asarray(jax.jit(_marked_walk)(pdev, jnp.asarray(rows_all)))
bad2 = np.nonzero(p_sweep != p_plain)[0]
print(f"stage2 walk: {len(bad2)} mismatches ({time.perf_counter()-t0:.0f}s)", flush=True)
if len(bad2):
    for i in bad2[:5]:
        print(f"  row_idx {i} (row={rows_all[i]}): sweep={p_sweep[i]} plain={p_plain[i]}", flush=True)
    # Also: does the sweep walk at the PLAIN 131k size agree?
    p_sw_b = np.asarray(jax.jit(lf_walk)(dev, jnp.asarray(rows_all[:B])))
    p_pl_b = np.asarray(jax.jit(_marked_walk)(pdev, jnp.asarray(rows_all[:B])))
    print(f"  at B={B}: {int((p_sw_b != p_pl_b).sum())} mismatches", flush=True)

# --- stage 3: compare ---
p = p_plain[:B].astype(np.uint32)
rem = np.where(lens > s, lens - s, 0).astype(np.uint32)
e = p + np.uint32(s - 1)
ok_dev = np.asarray(
    jax.jit(compare_text_suffixes, static_argnames=("s",))(
        dev, jnp.asarray(e), qs_u, qlens, s=s
    )
)
# host truth for candidate lanes: full-query occurrence at pos p - rem
okh = np.zeros(B, dtype=bool)
idxs = np.nonzero(cand)[0]
for i in idxs[:50000]:
    gp = int(p[i]) - int(rem[i])
    okh[i] = seq[gp : gp + int(lens[i])] == queries[i] if 0 <= gp else False
chk = idxs[:50000]
bad3 = chk[ok_dev[chk] != okh[chk]]
print(f"stage3 compare: {len(bad3)} mismatches of {len(chk)} checked", flush=True)
if len(bad3):
    for i in bad3[:5]:
        gp = int(p[i]) - int(rem[i])
        print(f"  lane {i}: dev={ok_dev[i]} host={okh[i]} p={p[i]} gp={gp}", flush=True)

# --- stage 4: bundle ---
out = eng._verify_fn(dev, qsyms, qlens, s=s)
bundle = np.asarray(out[0])
posb, cb, rb, lg, ps_, os_ = unpack_verify_bundle(bundle, B, G)
want_counts = np.where(cand, (ok_dev & (p >= rem)).astype(np.int64), width)
# wide-settled lanes: recompute
settled = np.zeros(B, dtype=bool)
settled[lane_of_group[lane_of_group < B]] = True
bad4 = np.nonzero((~rb[:NQ]) & (cb[:NQ] != np.where(settled, cb, want_counts)[:NQ]))[0]
print(f"stage4 bundle counts: {len(bad4)} mismatches (vs stage1-3 recompute, "
      f"redis={int(rb[:NQ].sum())}, settled={int(settled.sum())})", flush=True)
zero = np.nonzero((cb[:NQ] == 0) & ~rb[:NQ])[0]
print(f"final: {len(zero)} lanes with count==0 (text-drawn => all should be >=1)", flush=True)
if len(zero):
    for i in zero[:8]:
        print(f"  lane {i}: cand={cand[i]} wide={wide[i]} width={width[i]} settled={settled[i]} "
              f"p={p[i]} ok_dev={ok_dev[i]} pos={posb[i]}", flush=True)
