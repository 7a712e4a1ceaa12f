"""Native C++ ingest vs pure-python packer: identical block streams."""

import gzip
import random

import numpy as np
import pytest

from bcalm_tpu.io import bank, native, packing


pytestmark = pytest.mark.skipif(
    not native.available(), reason="native ingest library unavailable"
)


def collect_python(seqs, k, block_reads, max_len):
    rows = []
    for b in packing.iter_blocks(seqs, k, block_reads=block_reads,
                                 max_len=max_len):
        for i in range(b.words.shape[0]):
            if b.lengths[i] > 0:
                rows.append((int(b.lengths[i]), b.words[i].tolist()))
    return rows


def collect_native(path, k, block_reads, max_len):
    rows = []
    for b in native.iter_blocks_native(str(path), k, block_reads=block_reads,
                                       max_len=max_len):
        for i in range(b.words.shape[0]):
            if b.lengths[i] > 0:
                rows.append((int(b.lengths[i]), b.words[i].tolist()))
    return rows


def test_fasta_equivalence(tmp_path):
    rng = random.Random(0)
    seqs = []
    for i in range(50):
        n = rng.randint(5, 400)
        s = "".join(rng.choice("ACGTN" if i % 7 == 0 else "ACGT")
                    for _ in range(n))
        seqs.append(s)
    fa = tmp_path / "reads.fa"
    with open(fa, "w") as f:
        for i, s in enumerate(seqs):
            f.write(f">r{i} comment here\n")
            # multi-line records
            for j in range(0, len(s), 60):
                f.write(s[j : j + 60] + "\n")
    k = 21
    assert collect_native(fa, k, 16, 128) == collect_python(seqs, k, 16, 128)


def test_fasta_gz_equivalence(tmp_path):
    rng = random.Random(1)
    seqs = ["".join(rng.choice("ACGT") for _ in range(rng.randint(30, 200)))
            for _ in range(30)]
    fa = tmp_path / "reads.fa.gz"
    with gzip.open(fa, "wt") as f:
        for i, s in enumerate(seqs):
            f.write(f">r{i}\n{s}\n")
    k = 13
    assert collect_native(fa, k, 8, 64) == collect_python(seqs, k, 8, 64)


def test_fastq_equivalence(tmp_path):
    rng = random.Random(2)
    seqs = ["".join(rng.choice("ACGTN") for _ in range(rng.randint(20, 150)))
            for _ in range(40)]
    fq = tmp_path / "reads.fastq"
    with open(fq, "w") as f:
        for i, s in enumerate(seqs):
            f.write(f"@r{i} desc\n{s}\n+\n{'@' * len(s)}\n")  # '@' in quals!
    k = 15
    assert collect_native(fq, k, 32, 96) == collect_python(seqs, k, 32, 96)


def test_long_genome_windows(tmp_path):
    rng = random.Random(3)
    genome = "".join(rng.choice("ACGT") for _ in range(5000))
    fa = tmp_path / "genome.fa"
    with open(fa, "w") as f:
        f.write(">chr1\n")
        for j in range(0, len(genome), 70):
            f.write(genome[j : j + 70] + "\n")
    k = 31
    got = collect_native(fa, k, 64, 256)
    expect = collect_python([genome], k, 64, 256)
    assert got == expect
    # k-mer content is a exact partition (no loss/duplication)
    total = sum(l - k + 1 for l, _ in got)
    assert total == len(genome) - k + 1


def test_engine_with_native_blocks(tmp_path):
    from bcalm_tpu import engine
    from bcalm_tpu.oracle import brute

    rng = random.Random(4)
    genome = "".join(rng.choice("ACGT") for _ in range(300))
    reads = [genome[i:i + 60] for i in range(0, 240, 7)]
    fa = tmp_path / "r.fa"
    with open(fa, "w") as f:
        for i, s in enumerate(reads):
            f.write(f">r{i}\n{s}\n")
    cfg = engine.EngineConfig(k=21, abundance_min=1, block_reads=16,
                              max_len=64)
    us = engine.build_from_blocks(
        native.iter_blocks_native(str(fa), 21, 16, 64), cfg
    )
    expect = brute.build(reads, 21, abundance_min=1)
    assert brute.canonical_unitig_set(us.seqs) == \
        brute.canonical_unitig_set([u.seq for u in expect.unitigs])
