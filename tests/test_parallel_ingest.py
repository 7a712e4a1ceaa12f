"""Parallel single-file ingest: equivalence + determinism
(io.parallel_ingest vs the serial native parser)."""
import gzip
import random

import numpy as np
import pytest

from bcalm_tpu.io import native as native_mod
from bcalm_tpu.io import parallel_ingest

pytestmark = pytest.mark.skipif(
    not (native_mod.available() and native_mod.mem_available()),
    reason="native ingest library unavailable")


def _write_fasta(path, reads, gz=False):
    op = gzip.open if gz else open
    with op(path, "wt") as f:
        for i, s in enumerate(reads):
            f.write(f">r{i} comment\n")
            # multi-line records exercise line reassembly
            for j in range(0, len(s), 37):
                f.write(s[j:j + 37] + "\n")


def _write_fastq(path, reads):
    with open(path, "w") as f:
        for i, s in enumerate(reads):
            f.write(f"@r{i}\n{s}\n+\n{'I' * len(s)}\n")


def _reads(seed, n=800):
    rng = random.Random(seed)
    out = []
    for _ in range(n):
        ln = rng.randint(25, 200)
        out.append("".join(rng.choice("ACGTN" if rng.random() < 0.05
                                      else "ACGT") for _ in range(ln)))
    return out


def _kmer_multiset(blocks, k):
    from collections import Counter

    c = Counter()
    for b in blocks:
        for row, n in zip(b.words, b.lengths):
            if n < k:
                continue
            bases = []
            for j in range(int(n)):
                w = row[j // 16]
                bases.append((int(w) >> (2 * (15 - j % 16))) & 3)
            for i in range(int(n) - k + 1):
                c[tuple(bases[i:i + k])] += 1
    return c


@pytest.mark.parametrize("fmt,gz", [("fasta", False), ("fasta", True),
                                    ("fastq", False)])
def test_parallel_matches_serial(tmp_path, fmt, gz):
    reads = _reads(3)
    k = 21
    path = str(tmp_path / f"reads.{fmt}{'.gz' if gz else ''}")
    if fmt == "fasta":
        _write_fasta(path, reads, gz=gz)
    else:
        _write_fastq(path, reads)
    serial = list(native_mod.iter_blocks_native(
        path, k, block_reads=64, max_len=128))
    par = list(parallel_ingest.iter_blocks_parallel(
        path, k, block_reads=64, max_len=128, n_workers=3,
        chunk_bytes=4096))
    assert _kmer_multiset(serial, k) == _kmer_multiset(par, k)


def test_parallel_deterministic(tmp_path):
    reads = _reads(7)
    path = str(tmp_path / "reads.fa")
    _write_fasta(path, reads)
    a = list(parallel_ingest.iter_blocks_parallel(
        path, 21, block_reads=64, max_len=128, n_workers=4,
        chunk_bytes=2048))
    b = list(parallel_ingest.iter_blocks_parallel(
        path, 21, block_reads=64, max_len=128, n_workers=4,
        chunk_bytes=2048))
    assert len(a) == len(b)
    for x, y in zip(a, b):
        assert np.array_equal(x.words, y.words)
        assert np.array_equal(x.lengths, y.lengths)
