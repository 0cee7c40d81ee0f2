"""CLI surface: build/count/locate/info subcommands."""

import json
import subprocess
import sys

import numpy as np

from .conftest import random_seq
from awry_tpu.alphabet import Alphabet


def _run(args, **kw):
    import os

    env = dict(os.environ)
    # Keep CLI subprocesses off any device runtime: the --host paths are
    # pure NumPy, and device registration (e.g. a TPU tunnel) can be slow
    # or exclusive.
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"
    return subprocess.run(
        [sys.executable, "-m", "awry_tpu", *args],
        capture_output=True, text=True, env=env, **kw,
    )


def test_cli_round_trip(rng, tmp_path):
    seq = random_seq(Alphabet.NUCLEOTIDE, rng, 300)
    fasta = tmp_path / "g.fasta"
    fasta.write_bytes(b">rec\n" + seq + b"\n")
    idx = str(tmp_path / "g.npz")

    r = _run(["build", str(fasta), "-o", idx, "--kmer-len", "3"])
    assert r.returncode == 0, r.stderr
    assert "built" in r.stderr

    q = seq[10:30].decode()
    r = _run(["count", idx, q, "ZZZZZZZZ", "--host"])
    assert r.returncode == 0, r.stderr
    lines = dict(l.split("\t") for l in r.stdout.strip().splitlines())
    assert lines[q] >= "1" and lines["ZZZZZZZZ"] == "0"

    r = _run(["locate", idx, q, "--host"])
    assert r.returncode == 0, r.stderr
    assert "rec" in r.stdout

    r = _run(["info", idx])
    meta = json.loads(r.stdout)
    assert meta["bwt_len"] == 301 and meta["records"] == 1
