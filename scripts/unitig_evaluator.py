#!/usr/bin/env python
"""Unitig correctness oracle: TP/FP/FN canonical k-mer rates vs a reference
sequence set, plus the unitig-decomposition invariant (no canonical k-mer
may appear twice across unitigs) — the capability port of the reference's
scripts/unitigEvaluator.cpp (which flags repeats with "should not happen",
:214-215).

usage: unitig_evaluator.py unitigs.fa references.fa k
"""

import sys
import time

sys.path.insert(0, __import__("os").path.join(
    __import__("os").path.dirname(__file__), ".."))

from bcalm_tpu.oracle import brute  # noqa: E402


def iter_fasta(path):
    header, chunks = None, []
    with open(path) as f:
        for line in f:
            line = line.rstrip("\n")
            if line.startswith(">"):
                if header is not None:
                    yield header, "".join(chunks)
                header, chunks = line[1:], []
            elif line:
                chunks.append(line)
    if header is not None:
        yield header, "".join(chunks)


def main():
    if len(sys.argv) != 4:
        sys.exit("usage: unitig_evaluator.py unitigs.fa references.fa k")
    unitigs_path, refs_path, k = sys.argv[1], sys.argv[2], int(sys.argv[3])
    t0 = time.time()

    ref_kmers = set()
    for _, seq in iter_fasta(refs_path):
        for i in range(len(seq) - k + 1):
            sub = seq[i : i + k]
            if all(c in "ACGT" for c in sub):
                ref_kmers.add(brute.canonical_num(brute.str2num(sub), k))

    unitig_kmers = []
    for _, seq in iter_fasta(unitigs_path):
        for i in range(len(seq) - k + 1):
            unitig_kmers.append(
                brute.canonical_num(brute.str2num(seq[i : i + k]), k))

    uniq = set(unitig_kmers)
    repeated = len(unitig_kmers) - len(uniq)
    tp = len(uniq & ref_kmers)
    fp = len(uniq - ref_kmers)
    fn = len(ref_kmers - uniq)
    print(f"reference canonical k-mers: {len(ref_kmers)}")
    print(f"unitig    canonical k-mers: {len(uniq)} ({len(unitig_kmers)} total)")
    print(f"TP {tp}  FP {fp}  FN {fn}")
    if repeated:
        print(f"REPEATED k-mers across unitigs: {repeated} (should not happen)")
    print(f"elapsed {time.time()-t0:.2f}s")
    sys.exit(1 if (repeated or fp or fn) else 0)


if __name__ == "__main__":
    main()
