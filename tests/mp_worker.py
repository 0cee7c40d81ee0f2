"""Multi-process worker for tests/test_distributed.py.

Each spawned process joins the global JAX runtime over CPU devices, builds
the SAME small index from a fixed seed, runs the sharded engine on a global
query list, and asserts its local result slice against the host engine
(SURVEY.md section 4(d): simulate multi-host before touching a pod slice).

Usage: python tests/mp_worker.py <process_id> <num_processes> <port> <shard_size>
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"

import jax

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def main():
    pid, nproc, port, shard_size = (int(x) for x in sys.argv[1:5])
    from awry_tpu.parallel.distributed import init_distributed, make_global_mesh, process_local_queries

    init_distributed(f"localhost:{port}", nproc, pid)
    assert jax.process_count() == nproc, jax.process_count()
    assert len(jax.devices()) == nproc * 4

    import awry_tpu.host_engine as he
    from awry_tpu import Alphabet, FmBuildArgs, build_from_records
    from awry_tpu.parallel import ShardedFmEngine

    rng = np.random.default_rng(7)
    seq = bytes(rng.choice(np.frombuffer(b"ACGT", dtype=np.uint8), size=3000))
    index = build_from_records(
        [("mp", seq)], FmBuildArgs(lookup_table_kmer_len=4)
    )

    mesh = make_global_mesh(shard_size=shard_size)
    assert mesh.shape["data"] * mesh.shape["shard"] == nproc * 4
    engine = ShardedFmEngine(index, mesh, shard_size=shard_size)

    queries = [seq[i : i + 12] for i in range(0, 480, 3)] + [b"ACGTACGTACGT", b"TTTTTTTTTTTT"]
    counts = engine.count_batch(queries)
    local = process_local_queries(queries, mesh)
    expected = he.count_batch(index, local)
    np.testing.assert_array_equal(counts.astype(np.int64), expected.astype(np.int64))
    print(f"proc {pid} shard_size={shard_size}: {len(local)} local queries OK", flush=True)


if __name__ == "__main__":
    main()
