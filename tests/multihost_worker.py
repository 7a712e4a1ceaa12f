"""Multi-host worker: one process of a 2-process jax.distributed run.

Launched by tests/test_multihost.py (and usable standalone) to prove the
mesh pipeline runs across PROCESS boundaries — the DCN axis of SURVEY.md
§8 step 7.  The reference has no multi-host analog at all (single node,
filesystem transport — SURVEY.md §3.3); here the same shard_map counting
step that runs on one host's chips runs unchanged over a 2-process global
mesh: each process contributes 4 virtual CPU devices, input rows are
process-local and assembled into one global array, and the
all_to_all/psum collectives cross the process boundary.

Env: MH_NPROCS, MH_PID, MH_PORT.
Prints "MULTIHOST_OK <n_distinct>" on success.
"""

import os
import sys

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=4"
).strip()
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np  # noqa: E402
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")


def main():
    nprocs = int(os.environ["MH_NPROCS"])
    pid = int(os.environ["MH_PID"])
    port = int(os.environ["MH_PORT"])
    jax.distributed.initialize(
        coordinator_address=f"localhost:{port}",
        num_processes=nprocs,
        process_id=pid,
    )
    assert jax.process_count() == nprocs
    n_local = jax.local_device_count()
    n_global = jax.device_count()
    assert n_global == nprocs * n_local

    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
    from jax.experimental import multihost_utils

    from bcalm_tpu.io import packing
    from bcalm_tpu.parallel import pipeline

    k = 21
    block_reads = 32  # rows per device

    # identical reads in every process (same seed); each process feeds the
    # rows belonging to its local devices
    rng = np.random.RandomState(7)
    genome = rng.randint(0, 4, size=600)
    reads = []
    for _ in range(block_reads * n_global):
        i = rng.randint(0, 600 - 70)
        reads.append("".join("ACTG"[c] for c in genome[i : i + 70]))

    blocks = list(packing.iter_blocks(reads, k, block_reads=block_reads,
                                      max_len=70))
    assert len(blocks) == n_global
    words = np.concatenate([b.words for b in blocks])
    lengths = np.concatenate([b.lengths for b in blocks])

    mesh = Mesh(np.asarray(jax.devices()).reshape(n_global), (pipeline.AXIS,))
    sh_w = NamedSharding(mesh, P(pipeline.AXIS, None))
    sh_l = NamedSharding(mesh, P(pipeline.AXIS))
    # each process hands over only ITS rows; jax assembles the global array
    lo = pid * n_local * block_reads
    hi = (pid + 1) * n_local * block_reads
    g_words = jax.make_array_from_process_local_data(sh_w, words[lo:hi])
    g_lengths = jax.make_array_from_process_local_data(sh_l, lengths[lo:hi])

    cap = 4 * block_reads * (70 - k + 1) // n_global + 64
    fn = pipeline.distributed_count_fn(mesh, k, cap)
    unique, counts, n_unique, dropped = fn(g_words, g_lengths)
    assert int(dropped) == 0, "exchange overflow in multihost smoke"

    # n_unique is device-sharded; gather across processes for the total
    nu = multihost_utils.process_allgather(n_unique, tiled=True)
    total = int(np.sum(nu))

    # oracle: distinct canonical k-mers, python brute force
    from bcalm_tpu.oracle import brute

    want = len(brute.count_kmers(reads, k))
    assert total == want, f"distinct {total} != oracle {want}"
    if pid == 0:
        print(f"MULTIHOST_OK {total}", flush=True)


if __name__ == "__main__":
    main()
    sys.exit(0)
