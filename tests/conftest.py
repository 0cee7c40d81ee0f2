"""Test harness configuration.

Tests run on the CPU backend with 8 virtual devices so multi-chip sharding
paths (mesh + shard_map) are exercised without TPU hardware, per the
framework's test strategy (SURVEY.md section 4: simulate multi-host with
xla_force_host_platform_device_count before touching a real pod slice).
Must be set before jax is imported anywhere.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax

# The axon sitecustomize pre-registers the tunneled TPU backend before env
# vars can win; the config update below is authoritative.
jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest

from awry_tpu.alphabet import Alphabet


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)


def random_dna(rng, n: int) -> bytes:
    return bytes(rng.choice(np.frombuffer(b"ACGT", dtype=np.uint8), size=n))


def random_amino(rng, n: int) -> bytes:
    return bytes(rng.choice(np.frombuffer(b"ACDEFGHIKLMNPQRSTVWY", dtype=np.uint8), size=n))


def random_seq(alphabet: Alphabet, rng, n: int) -> bytes:
    return random_dna(rng, n) if alphabet is Alphabet.NUCLEOTIDE else random_amino(rng, n)


# Fast inner-loop subset (round-2 verdict task 10): `pytest -m smoke` runs in
# well under a minute, so every milestone can afford a pre-commit run.  The
# heavy modules (fuzz, spawned multi-process, Pallas-interpreter sweeps,
# partition federation) stay full-suite-only.
_SMOKE_MODULES = {
    "test_alphabet",
    "test_fm_index_api",
    "test_suffix_array",
    "test_io_formats",
    "test_kmer_device",
    "test_host_engine",
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        if item.module.__name__.rsplit(".", 1)[-1] in _SMOKE_MODULES:
            item.add_marker(pytest.mark.smoke)
