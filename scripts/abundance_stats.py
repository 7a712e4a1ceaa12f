#!/usr/bin/env python
"""Histogram of unitig mean abundances (capability port of the reference's
scripts/abundance_stats.py: reads km:f: fields from unitig headers and
prints a count per integer-rounded mean abundance).

usage: abundance_stats.py unitigs.fa
"""

import sys
from collections import Counter


def iter_headers(path):
    with open(path) as f:
        for line in f:
            if line.startswith(">"):
                yield line[1:].rstrip("\n")


def main():
    if len(sys.argv) != 2:
        sys.exit("usage: abundance_stats.py unitigs.fa")
    histo = Counter()
    n = 0
    for header in iter_headers(sys.argv[1]):
        for tok in header.split(" "):
            if tok.startswith("km:f:"):
                histo[int(round(float(tok[5:])))] += 1
                n += 1
    for ab in sorted(histo):
        print(f"{ab}\t{histo[ab]}")
    print(f"total\t{n}", file=sys.stderr)


if __name__ == "__main__":
    main()
