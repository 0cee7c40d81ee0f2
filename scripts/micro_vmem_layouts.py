"""Layout micro-bench for the VMEM-regime hot gathers (E. coli scale).

Hypothesis from profile_ecoli.py: gathers that produce row-major [B, W]
outputs (then .T or column slices) pay big relayouts; gathering into
lane-major [W, B] directly (batch in lanes) should be much cheaper.

Each variant is timed as K chained iterations inside ONE jit (data
dependency between iterations defeats CSE), so the ~10 ms relay dispatch
overhead amortizes away and the per-iteration slope is the real cost.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/micro_vmem_layouts.py
"""

from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

NB = 18_000          # E. coli num_blocks (4.6 Mbp / 256)
ROW = 40             # fused_row_words nucleotide with marks
B = 1_048_576        # 2 * 512k lanes (update_range stacks both endpoints)
NT = 580_000         # packed-text words
K = 8                # chained iterations per jit


def chained(label, make_step, idx0, iters=3):
    """make_step(idx) -> (value_scalar, next_idx). Run K chained steps."""

    @jax.jit
    def run(idx):
        def body(_, carry):
            tot, idx = carry
            v, idx = make_step(idx)
            return tot + v, idx

        return jax.lax.fori_loop(0, K, body, (jnp.float32(0), idx))

    out = run(idx0)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = run(idx0)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters / K * 1e3
    print(f"{label:58s} {dt:9.3f} ms/iter", flush=True)
    return dt


def main():
    rng = np.random.default_rng(0)
    blocks = jnp.asarray(rng.integers(0, 2**32, size=(NB, ROW), dtype=np.uint64).astype(np.uint32))
    blocks_t = jnp.asarray(np.asarray(blocks).T.copy())  # [ROW, NB]
    text = jnp.asarray(rng.integers(0, 2**32, size=(NT,), dtype=np.uint64).astype(np.uint32))
    sa = jnp.asarray(rng.integers(0, 2**32, size=(NB * 256,), dtype=np.uint64).astype(np.uint32))

    idx0 = jnp.asarray(rng.integers(0, NB, size=(B,), dtype=np.int64).astype(np.int32))

    def perturb(v, n):
        # next idx depends on gathered data -> serializes iterations
        return (v.astype(jnp.uint32) % jnp.uint32(n)).astype(jnp.int32)

    # 1. row-major gather + transpose (current fetch_rows_t)
    def step_rowmajor(idx):
        rows_t = blocks[idx].T  # [ROW, B]
        s = rows_t.sum(dtype=jnp.uint32)
        return s.astype(jnp.float32), perturb(rows_t[0] + s, NB)

    # 2. lane-major gather from transposed table
    def step_lanemajor(idx):
        rows_t = blocks_t[:, idx]  # [ROW, B]
        s = rows_t.sum(dtype=jnp.uint32)
        return s.astype(jnp.float32), perturb(rows_t[0] + s, NB)

    # 3. row-major gather, NO transpose, row-major reduce
    def step_rowmajor_noT(idx):
        rows = blocks[idx]  # [B, ROW]
        s = rows.sum(dtype=jnp.uint32)
        return s.astype(jnp.float32), perturb(rows[:, 0] + s, NB)

    # 4. element gather (SA walk / text compare shape), output [B]
    idx_sa0 = jnp.asarray(rng.integers(0, NB * 256, size=(B // 2,), dtype=np.int64).astype(np.int32))

    def step_elem(idx):
        v = sa[idx]
        s = v.sum(dtype=jnp.uint32)
        return s.astype(jnp.float32), perturb(v + s, NB * 256)

    # 5. text window gather [B/2, K=4] row-major (current compare shape)
    idx_t0 = jnp.asarray(rng.integers(4, NT, size=(B // 2,), dtype=np.int64).astype(np.int32))
    cols = jnp.arange(4, dtype=jnp.int32)

    def step_text_rowmajor(idx):
        w = text[idx[:, None] - cols[None, :]]  # [B/2, 4]
        s = w.sum(dtype=jnp.uint32)
        return s.astype(jnp.float32), jnp.maximum(perturb(w[:, 0] + s, NT), 4)

    # 6. text window gather [4, B/2] lane-major
    def step_text_lanemajor(idx):
        w = text[idx[None, :] - cols[:, None]]  # [4, B/2]
        s = w.sum(dtype=jnp.uint32)
        return s.astype(jnp.float32), jnp.maximum(perturb(w[0] + s, NT), 4)

    # 7. lane-major gather only over the PLANE+MILESTONE words actually read
    #    by a nucleotide rank (first 30 of 40 words)
    def step_lanemajor_sub(idx):
        rows_t = blocks_t[:30, idx]
        s = rows_t.sum(dtype=jnp.uint32)
        return s.astype(jnp.float32), perturb(rows_t[0] + s, NB)

    chained("1 blocks[idx].T        [1M x 40w] (current)", step_rowmajor, idx0)
    chained("2 blocks_t[:, idx]     [40w x 1M] lane-major", step_lanemajor, idx0)
    chained("3 blocks[idx] no-T     [1M x 40w]", step_rowmajor_noT, idx0)
    chained("4 element gather       [512k] u32", step_elem, idx_sa0)
    chained("5 text win [512k, 4] row-major (current)", step_text_rowmajor, idx_t0)
    chained("6 text win [4, 512k] lane-major", step_text_lanemajor, idx_t0)
    chained("7 blocks_t[:30, idx]   [30w x 1M] lane-major sub", step_lanemajor_sub, idx0)


if __name__ == "__main__":
    main()
