"""Randomized differential fuzz: oracle vs host engine vs device engine vs
sharded engines, across alphabets, record shapes, ratios and query mixes.

Default intensity keeps the suite fast; set AWRY_FUZZ_ITERS for longer
campaigns (e.g. AWRY_FUZZ_ITERS=100 python -m pytest tests/test_fuzz.py).
"""

import os

import numpy as np
import pytest

import awry_tpu.host_engine as he
from awry_tpu import Alphabet, FmBuildArgs, build_from_records
from awry_tpu.ops import FmQueryEngine
from awry_tpu.parallel import ShardedFmEngine

from .conftest import random_seq
from .oracle import brute_count, brute_positions, localize

ITERS = int(os.environ.get("AWRY_FUZZ_ITERS", "6"))


def _random_case(rng):
    alphabet = Alphabet.NUCLEOTIDE if rng.random() < 0.7 else Alphabet.AMINO
    num_records = int(rng.integers(1, 5))
    records = []
    for i in range(num_records):
        n = int(rng.integers(5, 400))
        seq = bytearray(random_seq(alphabet, rng, n))
        # Sprinkle ambiguity runs and lowercase into some records.
        if n > 30 and rng.random() < 0.5:
            p = int(rng.integers(0, n - 5))
            amb = b"N" if alphabet is Alphabet.NUCLEOTIDE else b"X"
            seq[p : p + 3] = amb * 3
        records.append((f"r{i}", bytes(seq)))
    args = FmBuildArgs(
        alphabet=alphabet,
        suffix_array_compression_ratio=int(rng.choice([1, 2, 8, 13])),
        lookup_table_kmer_len=int(rng.choice([1, 2, 3])),
    )
    return records, args


def _random_queries(rng, text, alphabet, n=24):
    queries = []
    for _ in range(n):
        kind = rng.random()
        if kind < 0.6 and len(text) > 4:  # substring (present)
            ln = int(rng.integers(1, min(40, len(text))))
            s = int(rng.integers(0, len(text) - ln + 1))
            queries.append(text[s : s + ln])
        elif kind < 0.8:  # random letters (mostly absent)
            queries.append(random_seq(alphabet, rng, int(rng.integers(1, 20))))
        elif kind < 0.9:  # case/RNA mangled substring
            ln = int(rng.integers(2, min(20, len(text))))
            s = int(rng.integers(0, len(text) - ln + 1))
            q = text[s : s + ln].lower()
            if alphabet is Alphabet.NUCLEOTIDE:
                q = q.replace(b"t", b"u")
            queries.append(q)
        else:
            queries.append(b"")
    return queries


@pytest.mark.parametrize("trial", range(ITERS))
def test_differential_fuzz(trial):
    rng = np.random.default_rng(1000 + trial)
    records, args = _random_case(rng)
    index = build_from_records(records, args)
    delim = args.alphabet.delimiter
    text = delim.join(seq for _, seq in records)
    queries = _random_queries(rng, text, args.alphabet)

    engine = FmQueryEngine(index)
    sharded = ShardedFmEngine(index, shard_size=int(rng.choice([1, 2, 4])), locate_cap=int(rng.choice([1, 4, 8])))

    host_counts = [he.count(index, q) for q in queries]
    oracle_counts = [brute_count(text, q, args.alphabet) for q in queries]
    assert host_counts == oracle_counts

    np.testing.assert_array_equal(engine.count_batch(queries).astype(np.int64), host_counts)
    np.testing.assert_array_equal(sharded.count_batch(queries).astype(np.int64), host_counts)

    dev_locs = engine.locate_batch(queries)
    sh_locs = sharded.locate_batch(queries)
    for q, dl, sl in zip(queries, dev_locs, sh_locs):
        expected = sorted(localize(brute_positions(text, q, args.alphabet), index.seq_starts))
        assert sorted(dl) == expected, q
        assert sorted(sl) == expected, q
