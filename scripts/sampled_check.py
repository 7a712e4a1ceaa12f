"""Sampled k-mer-content oracle for genome-scale runs.

The full TP/FP/FN evaluator (scripts/unitig_evaluator.py) holds python
sets — fine to E. coli scale, hopeless at 3G occurrences.  This checker
is numpy end-to-end and checks BOTH directions:

1. decomposition invariant — no canonical k-mer appears twice across
   unitigs (the "should not happen" check of the reference's
   unitigEvaluator.cpp:214), via a sorted 64-bit hash array;
2. FN direction — stream a sample of reads; any sampled read k-mer
   absent from the unitigs is only legitimate if its TOTAL input count
   is below abundance_min (the solidity filter), which a full-input
   recheck pass verifies EXACTLY for the missing set;
3. FP direction — a uniform sample of unitig k-mers is counted in the
   same full-input pass; every one must occur >= abundance_min times in
   the reads (solid k-mers come from the input by construction).

Hashing is a canonical (reverse-complement-symmetric) rolling polynomial
mod 2^64 — O(n) per sequence, vectorized, so the full-input pass runs at
numpy memory speed even at billions of occurrences.

usage: sampled_check.py <unitigs.fa> <reads.fa[.gz]> <k> \
           [sample_reads] [abundance_min] [unitig_sample]
exit 0 and prints "SAMPLED_OK ..." on success.
"""
import gzip
import sys

import numpy as np

_B = np.uint64(0x9E3779B97F4A7C17)          # odd -> invertible mod 2^64
_BINV = np.uint64(pow(int(_B), -1, 1 << 64))
_LUT = np.full(256, 255, np.uint8)
for ch, code in (("A", 0), ("C", 1), ("T", 2), ("G", 3)):
    _LUT[ord(ch)] = code
    _LUT[ord(ch.lower())] = code


def _mix(h: np.ndarray) -> np.ndarray:
    """splitmix64 finalizer (equality use only needs collision
    avoidance; this guards the weak low bits of the 2^64 polynomial)."""
    h = h + np.uint64(0x9E3779B97F4A7C15)
    h = (h ^ (h >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    h = (h ^ (h >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return h ^ (h >> np.uint64(31))


def seq_kmer_hashes(seq_bytes: bytes, k: int) -> np.ndarray:
    """(P',) uint64 canonical k-mer hashes of one (possibly separator-
    joined) sequence.  Invalid bytes (incl. separators) mask out every
    window spanning them.  O(n) rolling polynomial, rc-symmetric:
    h = mix(poly(fwd) + poly(rc))."""
    codes = _LUT[np.frombuffer(seq_bytes, np.uint8)]
    n = codes.shape[0]
    if n < k:
        return np.zeros(0, np.uint64)
    P = n - k + 1
    c = codes.astype(np.uint64)
    bad = codes == 255
    c = np.where(bad, 0, c)          # poisoned windows are masked below
    # powers of B and B^-1 (uint64 wraparound cumprod)
    pows = np.ones(n, np.uint64)
    if n > 1:
        pows[1:] = _B
        pows = np.cumprod(pows)
    pinv = np.ones(n, np.uint64)
    if n > 1:
        pinv[1:] = _BINV
        pinv = np.cumprod(pinv)
    # fwd: hash(i) = sum_{j=i..i+k-1} c[j] B^{i+k-1-j}
    #             = (S[i+k-1] - S[i-1]) * B^{i+k-1},  S = cumsum(c*B^-j)
    s = np.cumsum(c * pinv)          # wraps mod 2^64 (uint64)
    s_prev = np.concatenate([np.zeros(1, np.uint64), s[:-1]])
    hf = (s[k - 1:] - s_prev[:P]) * pows[k - 1:]
    # rc: hash(i) = sum_t rc(c[i+k-1-t]) B^{k-1-t}
    #             = (S2[i+k-1] - S2[i-1]) * B^{-i},  S2 = cumsum(rc*B^j)
    rc = np.where(bad, np.uint64(0), c ^ np.uint64(2))
    s2 = np.cumsum(rc * pows)
    s2_prev = np.concatenate([np.zeros(1, np.uint64), s2[:-1]])
    hr = (s2[k - 1:] - s2_prev[:P]) * pinv[:P]
    # mix BEFORE the symmetric sum: the raw polynomials satisfy
    # Δpoly_fwd = -Δpoly_rc when the center base of an odd-k window is
    # complemented, so mix(hf+hr) collided on exactly those pairs
    h = _mix(_mix(hf) + _mix(hr))
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


def batched_hashes(path, k, stride=1, max_records=None,
                   batch_bases=4 << 20):
    """Yield uint64 hash arrays over '#'-joined record batches (the
    separator masks cross-record windows), amortizing python overhead."""
    buf = []
    size = 0
    n = 0
    taken = 0
    for seq in iter_fasta(path):
        n += 1
        if stride > 1 and n % stride:
            continue
        taken += 1
        buf.append(seq)
        size += len(seq) + 1
        if size >= batch_bases:
            yield seq_kmer_hashes(b"#".join(buf), k), taken
            buf, size = [], 0
        if max_records and taken >= max_records:
            break
    if buf:
        yield seq_kmer_hashes(b"#".join(buf), k), taken


def main():
    unitigs_path, reads_path, k = sys.argv[1], sys.argv[2], int(sys.argv[3])
    sample_reads = int(sys.argv[4]) if len(sys.argv) > 4 else 5000
    amin = int(sys.argv[5]) if len(sys.argv) > 5 else 1
    unitig_sample = int(sys.argv[6]) if len(sys.argv) > 6 else 100_000

    # ---- unitig hash set + decomposition invariant ----
    parts = []
    total = 0
    for h, _ in batched_hashes(unitigs_path, k):
        total += h.shape[0]
        parts.append(h)
    allh = np.concatenate(parts) if parts else np.zeros(0, np.uint64)
    del parts
    allh.sort(kind="stable")
    dup = int((allh[1:] == allh[:-1]).sum()) if allh.size > 1 else 0
    assert dup == 0, (
        f"unitig decomposition violated: {dup} repeated k-mers "
        f"(unitigEvaluator.cpp:214 'should not happen')")

    # ---- FN direction: sampled read k-mers present in unitigs ----
    sampled = 0
    checked = 0
    missing_parts = []
    for stride in (997, 1):
        sampled = checked = 0
        missing_parts = []
        for h, taken in batched_hashes(reads_path, k, stride=stride,
                                       max_records=sample_reads):
            if h.size == 0:
                continue
            pos = np.searchsorted(allh, h)
            pos = np.minimum(pos, max(0, allh.size - 1))
            miss = (allh[pos] != h) if allh.size else np.ones(h.size, bool)
            missing_parts.append(h[miss])
            checked += h.size
            sampled = taken
        if sampled >= min(sample_reads, 100):
            break
    missing = (np.unique(np.concatenate(missing_parts))
               if missing_parts else np.zeros(0, np.uint64))
    if missing.size and amin <= 1:
        raise AssertionError(
            f"{missing.size} sampled k-mers missing with abundance-min 1")

    # ---- full-input recheck pass: exact counts for (a) every missing
    # k-mer (must be < amin: legitimately filtered) and (b) a uniform
    # unitig k-mer sample (must be >= amin: the FP direction) ----
    step = max(1, allh.size // max(1, unitig_sample))
    probe_u = allh[::step]
    watch = np.unique(np.concatenate([probe_u, missing]))
    wcounts = np.zeros(watch.size, np.int64)
    if watch.size:
        for h, _ in batched_hashes(reads_path, k):
            if h.size == 0:
                continue
            pos = np.searchsorted(watch, h)
            pos = np.minimum(pos, watch.size - 1)
            hit = watch[pos] == h
            if hit.any():
                wcounts += np.bincount(pos[hit], minlength=watch.size)
    # (a) missing k-mers were abundance-filtered
    mpos = np.searchsorted(watch, missing)
    over = int((wcounts[mpos] >= amin).sum()) if missing.size else 0
    assert over == 0, (
        f"{over}/{missing.size} missing sampled k-mers have input count "
        f">= abundance-min {amin}: genuine false negatives")
    # (b) sampled unitig k-mers occur solidly in the input
    upos = np.searchsorted(watch, probe_u)
    fp = int((wcounts[upos] < amin).sum()) if probe_u.size else 0
    assert fp == 0, (
        f"{fp}/{probe_u.size} sampled unitig k-mers occur < abundance-min "
        f"{amin} times in the input: false positives")
    print(f"SAMPLED_OK unitig_kmers={total} sampled_reads={sampled} "
          f"checked_kmers={checked} filtered_fn={missing.size} "
          f"fp_probe={probe_u.size} missing=0 repeated=0")


if __name__ == "__main__":
    main()
