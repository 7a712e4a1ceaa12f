"""Sampled k-mer-content oracle for genome-scale runs.

The full TP/FP/FN evaluator (scripts/unitig_evaluator.py) holds python
sets — fine to E. coli scale, hopeless at 3G occurrences.  This checker
is numpy end-to-end: it builds a 64-bit hash array of every canonical
k-mer in the unitigs file (sorted, ~8 B/k-mer), asserts the unitig
decomposition invariant (no k-mer appears twice across unitigs — the
"should not happen" check of the reference's unitigEvaluator.cpp:214),
then streams a SAMPLE of reads and verifies every sampled read k-mer is
present (FN check; FP at genome scale is covered by the invariant +
count equality of the engine's own tests).

usage: sampled_check.py <unitigs.fa> <reads.fa[.gz]> <k> [sample_reads]
exit 0 and prints "SAMPLED_OK ..." on success.
"""
import gzip
import sys

import numpy as np

C1 = np.uint64(0x9E3779B97F4A7C15)
C2 = np.uint64(0xC2B2AE3D27D4EB4F)

_LUT = np.full(256, 255, np.uint8)
for ch, code in (("A", 0), ("C", 1), ("T", 2), ("G", 3)):
    _LUT[ord(ch)] = code
    _LUT[ord(ch.lower())] = code


def seq_kmer_hashes(seq_bytes: bytes, k: int) -> np.ndarray:
    """(P,) uint64 canonical k-mer hashes of one sequence (invalid bases
    split; pieces < k contribute nothing)."""
    codes = _LUT[np.frombuffer(seq_bytes, np.uint8)]
    n = codes.shape[0]
    if n < k:
        return np.zeros(0, np.uint64)
    P = n - k + 1
    # forward hi/lo 128-bit packing (hi = first k-32 bases for k>32)
    split = max(0, k - 32)
    hi_f = np.zeros(P, np.uint64)
    lo_f = np.zeros(P, np.uint64)
    hi_r = np.zeros(P, np.uint64)
    lo_r = np.zeros(P, np.uint64)
    c64 = codes.astype(np.uint64)
    rc64 = (codes ^ 2).astype(np.uint64)
    for j in range(k):
        b = c64[j: j + P]
        rb = rc64[k - 1 - j: k - 1 - j + P]   # reverse complement order
        if j < split:
            hi_f = (hi_f << np.uint64(2)) | b
            hi_r = (hi_r << np.uint64(2)) | rb
        else:
            lo_f = (lo_f << np.uint64(2)) | b
            lo_r = (lo_r << np.uint64(2)) | rb
    use_rc = (hi_r < hi_f) | ((hi_r == hi_f) & (lo_r < lo_f))
    hi = np.where(use_rc, hi_r, hi_f)
    lo = np.where(use_rc, lo_r, lo_f)
    h = hi * C1 ^ lo * C2
    # mask out k-mers spanning an invalid base
    bad = codes == 255
    if bad.any():
        cs = np.cumsum(bad.astype(np.int64))
        span_bad = (cs[k - 1:] - np.concatenate([[0], cs[:P - 1]])) > 0
        h = h[~span_bad]
    return h


def iter_fasta(path):
    op = gzip.open if path.endswith(".gz") else open
    name = None
    chunks = []
    with op(path, "rb") as f:
        for line in f:
            if line.startswith(b">"):
                if name is not None:
                    yield b"".join(chunks)
                name = line
                chunks = []
            else:
                chunks.append(line.strip())
        if name is not None:
            yield b"".join(chunks)


def main():
    unitigs_path, reads_path, k = sys.argv[1], sys.argv[2], int(sys.argv[3])
    sample_reads = int(sys.argv[4]) if len(sys.argv) > 4 else 5000

    parts = []
    total = 0
    for seq in iter_fasta(unitigs_path):
        h = seq_kmer_hashes(seq, k)
        total += h.shape[0]
        parts.append(h)
    allh = np.concatenate(parts) if parts else np.zeros(0, np.uint64)
    del parts
    allh.sort(kind="stable")
    dup = int((allh[1:] == allh[:-1]).sum()) if allh.size > 1 else 0
    assert dup == 0, (
        f"unitig decomposition violated: {dup} repeated k-mers "
        f"(unitigEvaluator.cpp:214 'should not happen')")

    # sample reads uniformly by record index
    n_seen = 0
    sampled = 0
    missing = 0
    checked = 0
    # prime stride scans the whole file but hashes ~1/997 of records;
    # small files fall back to stride 1
    for stride in (997, 1):
        n_seen = sampled = missing = checked = 0
        for seq in iter_fasta(reads_path):
            n_seen += 1
            if n_seen % stride:
                continue
            h = seq_kmer_hashes(seq, k)
            if h.size == 0:
                continue
            pos = np.searchsorted(allh, h)
            pos = np.minimum(pos, allh.size - 1)
            miss = int((allh[pos] != h).sum())
            missing += miss
            checked += h.size
            sampled += 1
            if sampled >= sample_reads:
                break
        if sampled >= min(sample_reads, 100):
            break
    assert missing == 0, f"{missing}/{checked} sampled k-mers missing"
    print(f"SAMPLED_OK unitig_kmers={total} sampled_reads={sampled} "
          f"checked_kmers={checked} missing=0 repeated=0")


if __name__ == "__main__":
    main()
