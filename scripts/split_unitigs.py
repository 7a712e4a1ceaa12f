#!/usr/bin/env python
"""Split unitigs at reference-extremity k-mers and renumber (capability
port of the reference's scripts/split_unitigs.py).

The set B (E) holds the first (last) k-mer of every reference sequence.
Each unitig is cut so that any k-mer of B starts a unitig and any k-mer of
E ends one (in either orientation).  Former links are discarded; unitigs
are renumbered densely.  Repeated extremity k-mers are warned about.

usage: split_unitigs.py references.fa unitigs.fa k > split.fa
"""

import sys


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


_C = {"A": "T", "C": "G", "G": "C", "T": "A"}


def revcomp(s):
    return "".join(_C.get(c, c) for c in reversed(s))


def split_unitig(seq, k, starts, ends):
    """Yield the pieces of one unitig after all required cuts."""
    prev = 0
    for i in range(len(seq) - k + 1):
        kmer = seq[i : i + k]
        if kmer in starts or revcomp(kmer) in ends:
            # this k-mer must BEGIN a piece: cut before it
            if i + k - 1 - prev >= k:
                yield seq[prev : i + k - 1]
                prev = i
        if kmer in ends or revcomp(kmer) in starts:
            # this k-mer must END a piece: cut after it
            yield seq[prev : i + k]
            prev = i + 1
    if len(seq) - prev >= k:
        yield seq[prev:]


def main():
    if len(sys.argv) != 4:
        sys.exit("usage: split_unitigs.py references.fa unitigs.fa k")
    refs, unitigs, k = sys.argv[1], sys.argv[2], int(sys.argv[3])
    starts, ends = set(), set()
    for _, ref in iter_fasta(refs):
        if len(ref) >= k:
            starts.add(ref[:k])
            ends.add(ref[-k:])

    seen = set()
    uid = 0
    for _, seq in iter_fasta(unitigs):
        for piece in split_unitig(seq, k, starts, ends):
            for key in (min(piece[:k], revcomp(piece[:k])),
                        min(piece[-k:], revcomp(piece[-k:]))):
                if key in seen:
                    print(f"warning: repeated extremity k-mer {key}",
                          file=sys.stderr)
                seen.add(key)
            print(f">{uid} LN:i:{len(piece)}")
            print(piece)
            uid += 1


if __name__ == "__main__":
    main()
