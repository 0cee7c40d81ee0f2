"""Pallas fused-rank kernel vs the jnp reference rank (interpreter mode on
the CPU harness; compiled on real TPU)."""

import jax.numpy as jnp
import numpy as np
import pytest

import awry_tpu.host_engine as he
from awry_tpu import Alphabet, FmBuildArgs, build_from_records
from awry_tpu.ops import FmQueryEngine, to_device
from awry_tpu.ops.rank_pallas import pallas_count_batch_kernel, pallas_rank

from .conftest import random_seq
from .oracle import kmer_position_map

ALPHABETS = [Alphabet.NUCLEOTIDE, Alphabet.AMINO]


def _build(alphabet, rng, n=700, kmer_len=3):
    records = [("seq", random_seq(alphabet, rng, n))]
    return (
        build_from_records(records, FmBuildArgs(alphabet=alphabet, lookup_table_kmer_len=kmer_len)),
        records,
    )


@pytest.mark.parametrize("alphabet", ALPHABETS)
def test_pallas_rank_matches_host(alphabet, rng):
    index, _ = _build(alphabet, rng)
    dev = to_device(index)
    B = 256
    pos = rng.integers(0, index.bwt_len, size=B)
    sym = rng.integers(1, alphabet.cardinality, size=B)
    host = he.occurrence(index, pos, sym)
    got = pallas_rank(dev, jnp.asarray(pos, dtype=jnp.uint32), jnp.asarray(sym, dtype=jnp.int32))
    np.testing.assert_array_equal(np.asarray(got).astype(np.int64), host.astype(np.int64))


def test_pallas_rank_all_block_positions(rng):
    """Sweep every in-block position including lane boundaries (31/32/63...)."""
    index, _ = _build(Alphabet.NUCLEOTIDE, rng, n=600)
    dev = to_device(index)
    pos = np.arange(512)
    for sym in range(1, 6):
        host = he.occurrence(index, pos, np.full_like(pos, sym))
        got = pallas_rank(dev, jnp.asarray(pos, dtype=jnp.uint32), jnp.full(pos.shape, sym, jnp.int32))
        np.testing.assert_array_equal(np.asarray(got).astype(np.int64), host.astype(np.int64))


def test_pallas_count_end_to_end(rng):
    index, records = _build(Alphabet.NUCLEOTIDE, rng, n=500)
    engine = FmQueryEngine(index, use_pallas=True)
    text = records[0][1]
    kmap = kmer_position_map(text, 8)
    queries = list(kmap.keys())[:64]
    counts = engine.count_batch(queries)
    for q, c in zip(queries, counts):
        assert int(c) == len(kmap[q]), q


def test_dma_gather_rows(rng):
    """DMA-pipelined row gather (interpret mode) vs plain indexing."""
    import jax.numpy as jnp

    from awry_tpu.ops.gather_pallas import dma_gather_rows

    blocks = rng.integers(0, 2**32, size=(777, 128), dtype=np.uint32)
    idx = rng.integers(0, 777, size=1024).astype(np.int32)
    out = dma_gather_rows(jnp.asarray(blocks), jnp.asarray(idx), tile=256)
    np.testing.assert_array_equal(np.asarray(out), blocks[idx])
